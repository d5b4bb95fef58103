package graft.snapshot

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hash-bucket sub-partitioning inside each logical partition:
  * physical partition value = `<logicalValue>~b<pmod(xxhash64(hashCols), n)>`.
  * This is what keeps an incremental merge from rewriting a whole label
  * at 100 TB: a batch touches only the buckets its keys hash into, and
  * every untouched bucket's files are carried forward by reference
  * (Iceberg MERGE file-pruning semantics). `n` is sized per deployment —
  * 8 here (test scale); thousands on a real corpus so a bucket stays
  * executor-memory-sized.
  */
final case class BucketSpec(hashCols: Seq[String], n: Int)

/** Iceberg-style snapshot table over partitioned Parquet.
  *
  * No Iceberg runtime jar exists in this offline environment (SURVEY.md
  * §4), so this layer supplies the three Iceberg properties the engine
  * depends on, re-implemented minimally:
  *
  *  1. **Atomic commits** — data files are written first, then a
  *     versioned JSON manifest is moved into place atomically; readers
  *     only ever see fully-committed versions (the manifest move is the
  *     commit point, like an Iceberg metadata swap).
  *  2. **Partition/bucket-level file reuse** — a commit that touches only
  *     physical partition P writes new files for P and *references* the
  *     previous version's files for every other partition. With a
  *     [[BucketSpec]] the physical unit is `(label, hash(key) % n)`, so
  *     an incremental merge into a corpus-sized label rewrites only the
  *     touched buckets, and the reference's sub-resource-scoped cleanup
  *     (cartography/graph/cleanupbuilder.py:150-169) stays sub-linear.
  *  3. **Time travel** — every historical version stays readable until
  *     expired, which powers drift detection
  *     (cartography/driftdetect/detect_deviations.py:66-112) and
  *     checkpoint/resume.
  *
  * Layout:
  * {{{
  *   root/data/v{N}/{physicalValue}/part-*.parquet
  *   root/_manifest/v{N}.json   // commit record + physical value -> data dir
  * }}}
  *
  * Bucketed tables keep the logical partition column in the data files
  * (readers get it for free in one multi-path scan); non-bucketed tables
  * keep the original layout (column re-added from the manifest value).
  */
final class SnapshotTable(val spark: SparkSession, val root: String,
                          val partitionCol: Option[String] = None,
                          val bucket: Option[BucketSpec] = None) {

  require(bucket.isEmpty || partitionCol.isDefined,
    "bucketing requires a partition column")

  private val pvCol = "_pv" // physical partition value column (write-side only)

  private def manifestDir: Path = Paths.get(root, "_manifest")
  private def manifestPath(v: Long): Path = manifestDir.resolve(s"v$v.json")

  /** Eager directory listing that CLOSES the underlying stream —
    * `Files.list` holds a file descriptor until GC otherwise, and the
    * maintenance paths visit O(buckets × versions) directories.
    */
  private def listDir(p: Path): Seq[Path] = {
    val s = Files.list(p)
    try s.iterator().asScala.toSeq finally s.close()
  }

  def versions: Seq[Long] = {
    if (!Files.isDirectory(manifestDir)) return Seq.empty
    listDir(manifestDir)
      .map(_.getFileName.toString)
      .collect { case s if s.startsWith("v") && s.endsWith(".json") =>
        s.stripPrefix("v").stripSuffix(".json").toLong }
      .sorted
  }

  def latestVersion: Option[Long] = versions.lastOption

  def exists: Boolean = latestVersion.isDefined

  // ---- physical partition values ------------------------------------------

  /** The physical partition value of each row: the logical value itself,
    * or `<logical>~b<bucket>` when bucketed.
    */
  def physicalValue: Column = {
    val c = partitionCol.getOrElse(sys.error("table has no partition column"))
    bucket match {
      case None => col(c).cast("string")
      case Some(BucketSpec(hashCols, n)) =>
        concat(col(c).cast("string"), lit("~b"),
          pmod(xxhash64(hashCols.map(col): _*), lit(n.toLong)).cast("string"))
    }
  }

  /** Distinct physical partition values present in `df` (an action).
    * Validates the instance's bucket count against the committed layout
    * first — every scoped read/commit funnels through here or
    * [[commitPhysical]].
    */
  def physicalValuesOf(df: DataFrame): Seq[String] = {
    requireBucketsMatch()
    df.select(physicalValue.as(pvCol)).distinct()
      .collect().map(_.getString(0)).toSeq.sorted
  }

  /** Physical values of logical partition `value` in version `v`. */
  private def physicalKeysOf(v: Long, logical: String): Seq[String] = {
    val keys = partitionsOf(v).keys
    bucket match {
      case None => keys.filter(_ == logical).toSeq
      case Some(_) => keys.filter(_.startsWith(logical + "~b")).toSeq
    }
  }

  // ---- manifest (de)serialization: Jackson, not hand-rolled strings —
  // partition values are data-derived (dynamic rel labels), and an
  // unescaped quote/backslash in one would silently corrupt the manifest
  // and lose partitions on the next read.
  private def writeManifest(v: Long, updateTag: Long,
                            parts: Map[String, String]): Unit = {
    Files.createDirectories(manifestDir)
    val root = SnapshotTable.mapper.createObjectNode()
    root.put("version", v)
    root.put("updateTag", updateTag)
    // record the bucket arithmetic this version was laid out with —
    // BucketSpec is caller-supplied per open, so without the record a
    // mistyped count on a later open computes bucket names that don't
    // match the files and scoped reads/commits silently miss data.
    // Unbucketed layouts record 0 (not nothing): an absent field must
    // mean ONLY "legacy manifest", or a bucketed open over an unbucketed
    // layout would pass the guard and silently miss every partition
    root.put("buckets", bucket.map(_.n).getOrElse(0)): Unit
    val p = root.putObject("partitions")
    parts.toSeq.sortBy(_._1).foreach { case (k, d) => p.put(k, d): Unit }
    val tmp = manifestDir.resolve(s".v$v.json.tmp")
    Files.writeString(tmp, SnapshotTable.mapper.writeValueAsString(root))
    Files.move(tmp, manifestPath(v), StandardCopyOption.ATOMIC_MOVE)
  }

  /** physical partition value -> data dir (relative to root) for a version. */
  def partitionsOf(v: Long): Map[String, String] = {
    val root = SnapshotTable.mapper.readTree(Files.readString(manifestPath(v)))
    val it = root.get("partitions").fields()
    val b = Map.newBuilder[String, String]
    while (it.hasNext) {
      val e = it.next()
      b += e.getKey -> e.getValue.asText()
    }
    b.result()
  }

  def updateTagOf(v: Long): Long =
    SnapshotTable.mapper.readTree(Files.readString(manifestPath(v)))
      .get("updateTag").asLong()

  /** Bucket count version `v` was committed with (0: unbucketed; None:
    * a legacy manifest that predates the record).
    */
  def recordedBuckets(v: Long): Option[Int] =
    Option(SnapshotTable.mapper.readTree(Files.readString(manifestPath(v)))
      .get("buckets")).map(_.asInt())

  /** Fail fast when this instance's bucket arithmetic disagrees with the
    * latest committed layout — guards every SCOPED path (pruned reads,
    * bucket-scoped commits), where a wrong count computes partition
    * names that don't exist and silently misses data. Full commits are
    * exempt: they rewrite every partition under the instance's own
    * arithmetic and re-record it, which is exactly how a table is
    * re-bucketed (see GraftCli `rebucket`). Full reads are layout-blind
    * (they follow manifest dirs, no arithmetic) and stay valid across a
    * re-bucket for time travel.
    */
  private def requireBucketsMatch(): Unit =
    latestVersion.flatMap(recordedBuckets).foreach { r =>
      val mine = bucket.map(_.n).getOrElse(0)
      require(mine == r,
        s"snapshot table $root was laid out with $r buckets but this " +
          s"instance uses $mine — scoped reads/commits would compute " +
          "partition names that do not exist and silently miss data; " +
          "pass the table's true bucket count (or re-bucket via a full " +
          "commit / GraftCli rebucket)")
    }

  // ---- reads -------------------------------------------------------------

  private def readDirs(parts: Seq[(String, String)]): Option[DataFrame] = {
    if (parts.isEmpty) return None
    bucket match {
      case Some(_) =>
        // logical column lives in the data: one multi-path relation
        Some(spark.read.parquet(parts.map { case (_, rel) => s"$root/$rel" }: _*))
      case None =>
        val dfs = parts.sortBy(_._1).map { case (value, rel) =>
          val df = spark.read.parquet(s"$root/$rel")
          partitionCol match {
            case Some(c) => df.withColumn(c, lit(value))
            case None => df
          }
        }
        Some(dfs.reduce(_ unionByName _))
    }
  }

  /** Read one version (time travel). */
  def readVersion(v: Long): DataFrame =
    readDirs(partitionsOf(v).toSeq)
      .getOrElse(sys.error(s"snapshot table $root version $v is empty"))

  /** Latest committed state. */
  def read(): DataFrame = readVersion(latestVersion.getOrElse(
    sys.error(s"snapshot table $root has no committed version")))

  /** Read a single LOGICAL partition (all its buckets) of the latest
    * version — a pruned scan that never touches other partitions' files.
    */
  def readPartition(value: String): Option[DataFrame] =
    latestVersion.flatMap { v =>
      val parts = partitionsOf(v)
      readDirs(physicalKeysOf(v, value).map(k => k -> parts(k)))
    }

  /** Read only the given PHYSICAL partitions of the latest version;
    * values absent from the manifest are skipped. None when nothing
    * matches (caller supplies the empty frame).
    */
  def readPhysical(values: Seq[String]): Option[DataFrame] =
    latestVersion.flatMap { v =>
      val parts = partitionsOf(v)
      readDirs(values.flatMap(k => parts.get(k).map(k -> _)))
    }

  /** Row-level changelog between two committed versions — the Iceberg
    * `create_changelog_view` / CDC-read analog: one row per key whose
    * state changed, op ∈ insert / delete / update with the full before/
    * after column structs (unchanged rows emit nothing).
    *
    * MANIFEST-PRUNED: a physical partition carried by file REFERENCE
    * between the two manifests is byte-identical by construction, so
    * only partitions whose data-dir refs differ are read AT ALL — an
    * incremental sync that touched 3 of 4,096 buckets diffs 3 buckets,
    * never the table (the same carry argument as commitPhysical). Rows
    * that merely moved partitions (a re-bucket) still diff correctly:
    * both homes are rewritten, so both are in the changed set.
    *
    * The diff itself is one full-outer join co-partitioned on `keyCols`;
    * keys must be unique per version (the nodes/edges tables' MERGE
    * invariant).
    */
  def changelog(fromV: Long, toV: Long, keyCols: Seq[String]): DataFrame = {
    val pa = partitionsOf(fromV)
    val pb = partitionsOf(toV)
    val changed = (pa.keySet ++ pb.keySet)
      .filter(k => pa.get(k) != pb.get(k)).toSeq.sorted
    def side(parts: Map[String, String]) =
      readDirs(changed.flatMap(k => parts.get(k).map(k -> _)))
    (side(pa), side(pb)) match {
      case (Some(b), Some(a)) => SnapshotTable.diff(b, a, keyCols)
      case (Some(b), None) => SnapshotTable.diff(b, b.limit(0), keyCols)
      case (None, Some(a)) => SnapshotTable.diff(a.limit(0), a, keyCols)
      case (None, None) =>
        // no bucket ref differs — the versions are byte-identical (an
        // idempotent no-change sync, or fromV == toV): a legitimate
        // EMPTY changelog, not an error
        val z = readVersion(toV).limit(0)
        SnapshotTable.diff(z, z, keyCols)
    }
  }

  // ---- commits -----------------------------------------------------------

  private def writeData(df: DataFrame, v: Long, value: String): String = {
    val rel = s"data/v$v/$value"
    val out = partitionCol match {
      case Some(c) => df.drop(c)
      case None => df
    }
    out.write.mode("overwrite").parquet(s"$root/$rel")
    rel
  }

  /** Decode Spark/Hive percent-escaped partition directory names. */
  private def unescapePart(s: String): String = {
    if (!s.contains('%')) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length) {
        sb.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar)
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Write physical partitions of `df` in ONE Spark job via partitionBy
    * — a commit touching k partitions would otherwise run k write jobs,
    * each recomputing or rescanning the plan. `values = Some(touched)`
    * restricts the write to those physical partitions (scoped commits);
    * None writes everything present (full commits — no distinct-values
    * pre-pass job). Returns physical value → data dir for the manifest;
    * values that produced no rows are absent (an empty partition and a
    * missing one read the same).
    */
  private def writeDataPartitioned(df: DataFrame, v: Long,
                                   values: Option[Seq[String]]): Map[String, String] = {
    val base = s"data/v$v"
    val (out, byCol) = bucket match {
      case Some(_) =>
        // keep the logical column in the data; partition dirs carry _pv
        (df.withColumn(pvCol, physicalValue), pvCol)
      case None =>
        val c = partitionCol.get
        (df.withColumn(c, col(c).cast("string")), c)
    }
    // Bucketed tables cluster by physical value before the write:
    // without it every task holds rows of every bucket and partitionBy
    // opens tasks×buckets writers (thousands of tiny files per commit);
    // with it each bucket's rows land in one task → ~one file per bucket.
    val clustered = bucket match {
      case Some(_) => out.repartition(col(byCol))
      case None => out
    }
    val scoped = values match {
      case Some(vs) => clustered.filter(col(byCol).isin(vs: _*))
      case None => clustered
    }
    scoped.write.mode("overwrite").partitionBy(byCol).parquet(s"$root/$base")
    val dir = Paths.get(root, "data", s"v$v")
    if (!Files.isDirectory(dir)) return Map.empty
    listDir(dir)
      .map(_.getFileName.toString)
      .filter(_.startsWith(s"$byCol="))
      .map(d => unescapePart(d.stripPrefix(s"$byCol=")) -> s"$base/$d")
      .toMap
  }

  /** Full-table commit: every physical partition present in `df` is
    * written; partitions absent from `df` are dropped. ONE write job, no
    * pre-pass: partitionBy lays out whatever values exist and the
    * manifest is built from the directories actually written.
    */
  def commit(df: DataFrame, updateTag: Long): Long = {
    val v = latestVersion.getOrElse(0L) + 1
    val parts: Map[String, String] = partitionCol match {
      case Some(_) => writeDataPartitioned(df, v, values = None)
      case None => Map("all" -> writeData(df, v, "all"))
    }
    writeManifest(v, updateTag, parts)
    v
  }

  /** Commit scoped to PHYSICAL partitions: rewrite only `touched` from
    * `df`; every other physical partition of the previous version is
    * carried forward by reference (no data movement). This is the scale
    * path — for a bucketed table, `touched` is the bucket set a merge
    * batch actually hashes into.
    */
  def commitPhysical(df: DataFrame, updateTag: Long,
                     touched: Seq[String]): Long = {
    require(partitionCol.isDefined, "commitPhysical requires a partition column")
    requireBucketsMatch()
    val v = latestVersion.getOrElse(0L) + 1
    val carried = latestVersion.map(partitionsOf).getOrElse(Map.empty) -- touched
    val fresh = writeDataPartitioned(df, v, Some(touched))
    writeManifest(v, updateTag, carried ++ fresh)
    v
  }

  /** Per-file committed row counts of a version, straight from the
    * parquet footers — NO Spark job. Powers lineage rows and benchmark
    * page counts; a count() job on tiny committed tables costs more in
    * scheduling than the data.
    */
  def fileRowCounts(v: Long): Seq[Long] = {
    val conf = spark.sessionState.newHadoopConf()
    partitionsOf(v).toSeq.sortBy(_._1).flatMap { case (_, rel) =>
      val dir = Paths.get(root, rel)
      if (!Files.isDirectory(dir)) Seq.empty
      else listDir(dir)
        .filter(p => p.getFileName.toString.endsWith(".parquet"))
        .sortBy(_.getFileName.toString)
        .map { p =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(p.toUri), conf)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try r.getRecordCount finally r.close()
        }
    }
  }

  /** Total committed rows of the latest version (footer-based, no job). */
  def rowCount(): Long = fileRowCounts(latestVersion.getOrElse(
    sys.error(s"snapshot table $root has no committed version"))).sum

  // ---- maintenance --------------------------------------------------------


  /** Iceberg `expire_snapshots` analog: retain the newest `keepLast`
    * versions, delete older manifests, then delete every data directory
    * no retained manifest references. Because commits carry untouched
    * partitions forward by file reference, a retained version may point
    * into an EXPIRED version's `data/vK` — those directories are kept;
    * only truly unreferenced ones are removed. Without this, a 100 TB
    * table under daily incremental syncs grows by every bucket ever
    * rewritten; with it, storage is bounded by `keepLast` × table size
    * while time travel over the retained window (and resume, which reads
    * only the latest version per tag) keeps working.
    *
    * Crash safety follows Iceberg's metadata-first contract: expired
    * MANIFESTS are deleted before any data — a crash mid-expiry leaves
    * only orphaned data directories (harmless: never listed, never read),
    * and the data sweep judges liveness against the RETAINED manifests,
    * so a re-run collects orphans from any earlier interrupted expiry.
    *
    * Concurrent-writer safety: a commit writes `data/v{N+1}` FIRST and
    * moves its manifest last, so an expire racing a sync would see the
    * in-flight version as an unreferenced orphan. The sweep therefore
    * NEVER touches version directories numbered above the latest
    * retained manifest — those belong to a writer that has not committed
    * yet (Iceberg's `expire_snapshots` likewise never deletes files it
    * cannot prove expired; collecting ABANDONED in-flight dirs is
    * [[removeOrphans]]' job, with an age guard this method does not
    * need). Orphans ≤ the retained
    * ceiling (from earlier interrupted expiries or superseded commits)
    * are collected as before.
    *
    * Returns (expired version ids, deleted data dirs relative to root).
    */
  def expireVersions(keepLast: Int): (Seq[Long], Seq[String]) = {
    require(keepLast >= 1, "keepLast must be >= 1")
    val vs = versions
    val expired = vs.dropRight(keepLast)
    if (expired.isEmpty) return (Nil, Nil)
    val retained = vs.takeRight(keepLast).toSet
    val maxRetained = retained.max
    val referenced: Set[String] =
      retained.toSeq.flatMap(v => partitionsOf(v).values).toSet
    expired.foreach(v => Files.deleteIfExists(manifestPath(v)): Unit)
    val dataRoot = Paths.get(root, "data")
    val deleted = scala.collection.mutable.ArrayBuffer.empty[String]
    if (Files.isDirectory(dataRoot)) {
      listDir(dataRoot).foreach { vdir =>
        val vname = vdir.getFileName.toString
        // vNum None (unrecognized dir) or > maxRetained (in-flight
        // writer) → leave the whole directory alone
        val vNum = vname.stripPrefix("v").toLongOption
        val sweepable = vNum.exists(_ <= maxRetained)
        if (sweepable) {
          listDir(vdir).foreach { child =>
            val rel = s"data/$vname/${child.getFileName}"
            if (Files.isDirectory(child) && !referenced(rel)) {
              SnapshotTable.deleteTree(child)
              deleted += rel: Unit
            }
          }
          // a version dir that no retained manifest owns and whose
          // referenced children are all gone holds only job-marker files
          // (_SUCCESS) — drop it entirely (also collects orphans left by
          // a previously interrupted expiry)
          val isLive = vNum.exists(retained.contains)
          val remaining = listDir(vdir)
          if (!isLive && remaining.forall(p => !Files.isDirectory(p))) {
            remaining.foreach(Files.deleteIfExists(_))
            Files.deleteIfExists(vdir): Unit
          }
        }
      }
    }
    (expired, deleted.toSeq.sorted)
  }

  /** Newest last-modified time anywhere under `p` — the liveness signal
    * for the orphan sweep (a writer still streaming files keeps touching
    * something under its version dir).
    */
  private def newestMtime(p: Path): Long = {
    val self = Files.getLastModifiedTime(p).toMillis
    if (!Files.isDirectory(p)) self
    else (self +: listDir(p).map(newestMtime)).max
  }

  /** Iceberg `remove_orphan_files` analog for ABANDONED IN-FLIGHT
    * commits. A writer creates `data/v{N+1}` first and moves its
    * manifest last; if it crashes in between, the data directory
    * lingers — [[expireVersions]] deliberately never touches version
    * dirs above the latest retained manifest because it cannot tell an
    * abandoned writer from a live one. This separate, AGE-GUARDED sweep
    * can: an uncommitted version dir whose newest file is older than
    * `olderThanMillis` has no live writer (a streaming write keeps
    * touching files), so it is collected. Committed versions are never
    * candidates regardless of age. Size the guard comfortably above the
    * longest plausible commit (Iceberg's default for the same knob is
    * 3 days). Returns deleted dirs relative to root.
    */
  def removeOrphans(olderThanMillis: Long,
                    now: Long = System.currentTimeMillis()): Seq[String] = {
    require(olderThanMillis > 0, "olderThanMillis must be positive")
    val dataRoot = Paths.get(root, "data")
    if (!Files.isDirectory(dataRoot)) return Nil
    val ceiling = latestVersion.getOrElse(0L)
    val deleted = scala.collection.mutable.ArrayBuffer.empty[String]
    listDir(dataRoot).foreach { vdir =>
      val vname = vdir.getFileName.toString
      val vNum = vname.stripPrefix("v").toLongOption
      // only recognizably-versioned dirs ABOVE the committed ceiling are
      // orphan candidates; everything else is expireVersions' territory
      if (vNum.exists(_ > ceiling) && newestMtime(vdir) < now - olderThanMillis) {
        SnapshotTable.deleteTree(vdir)
        deleted += s"data/$vname": Unit
      }
    }
    deleted.toSeq.sorted
  }

  /** Commit scoped to LOGICAL partitions: every bucket of a touched
    * logical value is rewritten from `df` (or dropped if `df` has no rows
    * for it); other logical values are carried forward by reference.
    */
  def commitPartitions(df: DataFrame, updateTag: Long,
                       touched: Seq[String]): Long = {
    bucket match {
      case None => commitPhysical(df, updateTag, touched)
      case Some(_) =>
        df.persist()
        try {
          // only rows of touched logical values participate (matching the
          // non-bucketed contract, where the isin filter did this)
          val fresh = physicalValuesOf(df)
            .filter(pv => touched.exists(t => pv.startsWith(t + "~b")))
          val prev = latestVersion
            .map(v => touched.flatMap(t => physicalKeysOf(v, t)))
            .getOrElse(Seq.empty)
          commitPhysical(df, updateTag, (fresh ++ prev).distinct.sorted)
        } finally df.unpersist()
    }
  }
}

object SnapshotTable {
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Key-wise row diff of two same-schema frames: op ∈ insert (key only
    * in `after`) / delete (only in `before`) / update (present in both
    * with any non-key difference, null-safely compared); unchanged keys
    * emit nothing. Non-key columns are returned as `_before`/`_after`
    * structs so callers project what they need. The join is a single
    * full-outer co-partitioned on the keys.
    */
  def diff(before: DataFrame, after: DataFrame,
           keyCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    require(keyCols.nonEmpty, "diff needs at least one key column")
    require(before.columns.sorted.sameElements(after.columns.sorted),
      s"schema mismatch: ${before.columns.mkString(",")} vs ${after.columns.mkString(",")}")
    val nonKey = before.columns.filterNot(keyCols.contains).toSeq
    require(nonKey.forall(after.columns.contains) &&
      keyCols.forall(before.columns.contains),
      s"key columns $keyCols must exist in both frames")
    // keys-only schema: presence IS the payload — a constant marker
    // struct keeps the insert/delete classification and never updates
    def payload = if (nonKey.isEmpty) struct(lit(0).as("_present"))
      else struct(nonKey.map(col): _*)
    val b = before.select(keyCols.map(col) :+ payload.as("_before"): _*)
    val a = after.select(keyCols.map(col) :+ payload.as("_after"): _*)
    b.join(a, keyCols, "full_outer")
      .withColumn("op",
        when(col("_before").isNull, lit("insert"))
          .when(col("_after").isNull, lit("delete"))
          .when(!(col("_before") <=> col("_after")), lit("update")))
      .filter(col("op").isNotNull)
      .select(keyCols.map(col) ++ Seq(col("op"), col("_before"),
        col("_after")): _*)
  }

  /** Recursive delete with the stream CLOSED per directory (`Files.list`
    * holds a file descriptor until GC) — the one filesystem-deletion
    * helper, shared by expire/orphan maintenance and the CLI's rebucket
    * index drop so there is a single idiom to keep correct.
    */
  def deleteTree(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      val kids = try s.iterator().asScala.toSeq finally s.close()
      kids.foreach(deleteTree)
    }
    Files.deleteIfExists(p): Unit
  }

  def apply(spark: SparkSession, root: String,
            partitionCol: Option[String] = None,
            bucket: Option[BucketSpec] = None): SnapshotTable =
    new SnapshotTable(spark, root, partitionCol, bucket)
}
