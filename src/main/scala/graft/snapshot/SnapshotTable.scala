package graft.snapshot

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
  *  2. **Partition-level file reuse** — a commit that touches only
  *     partition P writes new files for P and *references* the previous
  *     version's files for every other partition. This is what keeps the
  *     reference's sub-resource-scoped cleanup
  *     (cartography/graph/cleanupbuilder.py:150-169) from becoming a
  *     full-table rewrite at 100 TB: only the touched label/tenant
  *     partition is rewritten.
  *  3. **Time travel** — every historical version stays readable until
  *     expired, which powers drift detection
  *     (cartography/driftdetect/detect_deviations.py:66-112) and
  *     checkpoint/resume.
  *
  * Layout:
  * {{{
  *   root/data/v{N}/{partitionValue}/part-*.parquet
  *   root/_manifest/v{N}.json   // commit record + partition -> data dir
  * }}}
  */
final class SnapshotTable(val spark: SparkSession, val root: String,
                          val partitionCol: Option[String] = None) {

  private def manifestDir: Path = Paths.get(root, "_manifest")
  private def manifestPath(v: Long): Path = manifestDir.resolve(s"v$v.json")

  def versions: Seq[Long] = {
    if (!Files.isDirectory(manifestDir)) return Seq.empty
    Files.list(manifestDir).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.startsWith("v") && s.endsWith(".json") =>
        s.stripPrefix("v").stripSuffix(".json").toLong }
      .toSeq.sorted
  }

  def latestVersion: Option[Long] = versions.lastOption

  def exists: Boolean = latestVersion.isDefined

  // ---- manifest (de)serialization: minimal hand-rolled JSON; labels and
  // paths are controlled charsets (no escaping needed beyond quotes).
  private def writeManifest(v: Long, updateTag: Long,
                            parts: Map[String, String]): Unit = {
    Files.createDirectories(manifestDir)
    val pjson = parts.toSeq.sortBy(_._1)
      .map { case (k, p) => s""""$k":"$p"""" }.mkString("{", ",", "}")
    val json =
      s"""{"version":$v,"updateTag":$updateTag,"partitions":$pjson}"""
    val tmp = manifestDir.resolve(s".v$v.json.tmp")
    Files.writeString(tmp, json)
    Files.move(tmp, manifestPath(v), StandardCopyOption.ATOMIC_MOVE)
  }

  private val partRe = """"([^"]*)":"([^"]*)"""".r
  private val tagRe = """"updateTag":(-?\d+)""".r

  /** partition value -> data dir (relative to root) for a version. */
  def partitionsOf(v: Long): Map[String, String] = {
    val json = Files.readString(manifestPath(v))
    val body = json.substring(json.indexOf("\"partitions\":") + 13)
    partRe.findAllMatchIn(body).map(m => m.group(1) -> m.group(2)).toMap
  }

  def updateTagOf(v: Long): Long =
    tagRe.findFirstMatchIn(Files.readString(manifestPath(v)))
      .map(_.group(1).toLong).getOrElse(0L)

  // ---- reads -------------------------------------------------------------

  /** Read one version (time travel). Empty table -> empty DataFrame caller
    * must handle via [[exists]].
    */
  def readVersion(v: Long): DataFrame = {
    val parts = partitionsOf(v)
    val dfs = parts.toSeq.sortBy(_._1).map { case (value, rel) =>
      val df = spark.read.parquet(s"$root/$rel")
      partitionCol match {
        case Some(c) => df.withColumn(c, lit(value))
        case None => df
      }
    }
    dfs.reduce(_ unionByName _)
  }

  /** Latest committed state. */
  def read(): DataFrame = readVersion(latestVersion.getOrElse(
    sys.error(s"snapshot table $root has no committed version")))

  /** Read a single partition of the latest version — a pruned scan that
    * never touches other partitions' files.
    */
  def readPartition(value: String): Option[DataFrame] =
    latestVersion.flatMap { v =>
      partitionsOf(v).get(value).map { rel =>
        val df = spark.read.parquet(s"$root/$rel")
        partitionCol match {
          case Some(c) => df.withColumn(c, lit(value))
          case None => df
        }
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

  /** Write every `values` partition of `df` in ONE Spark job via
    * partitionBy — a commit touching k partitions would otherwise run k
    * write jobs, each recomputing or rescanning the plan. Returns
    * partition value → data dir for the manifest; values that produced
    * no rows are absent (an empty partition and a missing one read the
    * same).
    */
  private def writeDataPartitioned(df: DataFrame, v: Long, c: String,
                                   values: Seq[String]): Map[String, String] = {
    val base = s"data/v$v"
    df.withColumn(c, col(c).cast("string"))
      .filter(col(c).isin(values: _*))
      .write.mode("overwrite").partitionBy(c).parquet(s"$root/$base")
    val dir = Paths.get(root, "data", s"v$v")
    if (!Files.isDirectory(dir)) return Map.empty
    Files.list(dir).iterator().asScala
      .map(_.getFileName.toString)
      .filter(_.startsWith(s"$c="))
      .map(d => unescapePart(d.stripPrefix(s"$c=")) -> s"$base/$d")
      .toMap
  }

  /** Full-table commit: every partition present in `df` is rewritten;
    * partitions absent from `df` are dropped.
    */
  def commit(df: DataFrame, updateTag: Long): Long = {
    val v = latestVersion.getOrElse(0L) + 1
    val parts: Map[String, String] = partitionCol match {
      case Some(c) =>
        // One partitionBy job writes every partition; a distinct-values
        // pre-pass + one write per value would run the upstream plan
        // k+1 times.
        df.persist()
        try {
          val values = df.select(col(c).cast("string")).distinct()
            .collect().map(_.getString(0)).sorted
          writeDataPartitioned(df, v, c, values)
        } finally df.unpersist()
      case None =>
        Map("all" -> writeData(df, v, "all"))
    }
    writeManifest(v, updateTag, parts)
    v
  }

  /** Partition-scoped commit: rewrite only `touched` partitions from `df`;
    * every other partition of the previous version is carried forward by
    * reference (no data movement). This is the scale path.
    */
  def commitPartitions(df: DataFrame, updateTag: Long,
                       touched: Seq[String]): Long = {
    val c = partitionCol.getOrElse(
      sys.error("commitPartitions requires a partition column"))
    val v = latestVersion.getOrElse(0L) + 1
    val carried = latestVersion.map(partitionsOf).getOrElse(Map.empty) -- touched
    val fresh = writeDataPartitioned(df, v, c, touched)
    writeManifest(v, updateTag, carried ++ fresh)
    v
  }
}

object SnapshotTable {
  def apply(spark: SparkSession, root: String,
            partitionCol: Option[String] = None): SnapshotTable =
    new SnapshotTable(spark, root, partitionCol)
}
