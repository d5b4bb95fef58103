package graft.merge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.model._
import graft.snapshot.SnapshotTable

/** Canonical graph-table schemas (FIXTURES.md §3). */
object GraphTables {
  val nodeSchema: StructType = StructType(Seq(
    StructField("label", StringType),
    StructField("id", StringType),
    StructField("props", MapType(StringType, StringType)),
    StructField("extra_labels", ArrayType(StringType)),
    StructField("sub_resource_id", StringType),
    StructField("firstseen", LongType),
    StructField("lastupdated", LongType)))

  val edgeSchema: StructType = StructType(Seq(
    StructField("src_label", StringType),
    StructField("src_id", StringType),
    StructField("rel_label", StringType),
    StructField("dst_label", StringType),
    StructField("dst_id", StringType),
    StructField("props", MapType(StringType, StringType)),
    StructField("firstseen", LongType),
    StructField("lastupdated", LongType)))

  /** Bucket counts are deployment-sized: 8 at test scale; thousands at
    * 100 TB so one bucket stays executor-memory-sized. Node buckets hash
    * the id; edge buckets hash (src_id, dst_id) — both are merge-key
    * columns, so a batch row maps to a deterministic bucket and an
    * incremental merge reads/rewrites only the buckets it hashes into.
    */
  val DefaultBuckets = 8

  def nodes(spark: SparkSession, root: String,
            buckets: Int = DefaultBuckets): SnapshotTable =
    SnapshotTable(spark, s"$root/nodes", Some("label"),
      Some(graft.snapshot.BucketSpec(Seq("id"), buckets)))
  def edges(spark: SparkSession, root: String,
            buckets: Int = DefaultBuckets): SnapshotTable =
    SnapshotTable(spark, s"$root/edges", Some("rel_label"),
      Some(graft.snapshot.BucketSpec(Seq("src_id", "dst_id"), buckets)))

  def emptyNodes(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], nodeSchema)
  def emptyEdges(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], edgeSchema)
}

final case class LoadStats(nodesUpserted: Long, edgesUpserted: Long)

/** The upsert ("MERGE") operator — Spark-native equivalent of the
  * reference's generated ingestion query
  * (cartography/graph/querybuilder.py:361-413 compiled via
  * build_ingestion_query; entrypoint load(), client/core/tx.py:237-257).
  *
  * Semantics preserved exactly:
  *  - node MERGE keyed on id: insert-or-update; `firstseen` set only on
  *    create (querybuilder.py:384-393), `lastupdated` stamped with the
  *    run's update_tag on every touched row (sync.py:190-192);
  *  - per-row vs per-run property values (RowRef/KwargRef);
  *  - extra labels (querybuilder.py:57-61);
  *  - sub-resource attach skips silently when the container is absent
  *    (querybuilder.py:165-209) — an inner join that yields no rows;
  *  - other-rels matched Exact / IgnoreCase / FuzzyContains / OneToMany
  *    (querybuilder.py:122-141), each rel independent so missing data for
  *    one never kills the others (CALL{} UNION, querybuilder.py:271-303)
  *    — here: independent joins unioned byName;
  *  - rel MERGE keyed (src, label, dst) with firstseen preservation
  *    (querybuilder.py:187-198).
  *
  * Scale design: the nodes table is partitioned by label and the edges
  * table by rel_label, each hash-sub-bucketed on its merge key
  * (BucketSpec) — a load reads and rewrites ONLY the buckets its batch
  * hashes into (SnapshotTable.commitPhysical; file-level reuse of
  * everything else), so an incremental sync into a corpus-sized label
  * stays proportional to the batch, not the table. Target-node lookups
  * join against only the target label's partition, broadcast when
  * small. There is no driver-side batching — the reference's 10k-dict
  * write transactions (tx.py:209) are replaced by Spark's
  * shuffle-partitioned distributed write.
  */
object GraphMerge {

  private def resolve(ref: PropertyRef, kwargs: Map[String, String]): Column =
    ref match {
      case RowRef(f) => col(f).cast("string")
      case KwargRef(n) => lit(kwargs.getOrElse(n,
        sys.error(s"missing kwarg '$n'"))).cast("string")
    }

  /** Deterministic key-wise dedup: among a key's duplicate rows, the one
    * with the greatest canonical JSON rendering of its non-key columns
    * wins. `dropDuplicates` keeps an ARBITRARY row — which row survives
    * then depends on partitioning and task order, so a batch carrying
    * two prop variants for one id would commit different values run to
    * run (the reference's UNWIND batches have a defined order; a
    * DataFrame does not, so the winner must be a pure function of the
    * row values). Costs the same single shuffle.
    */
  private def dedupByKeys(df: DataFrame, keys: Seq[String]): DataFrame = {
    val others = df.columns.filterNot(keys.contains).toSeq
    if (others.isEmpty) df.dropDuplicates(keys)
    else {
      val w = Window.partitionBy(keys.map(col): _*)
        .orderBy(to_json(struct(others.map(col): _*)).desc)
      df.withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1).drop("_rn")
    }
  }

  /** Project a batch into canonical node rows for `schema`.
    * `dedup=false` skips the MERGE id-collapse shuffle for batches the
    * caller knows are id-unique (one-row-per-key committed tables).
    */
  def toNodeRows(batch: DataFrame, schema: NodeSchema,
                 kwargs: Map[String, String], updateTag: Long,
                 dedup: Boolean = true): DataFrame = {
    val propCols: Seq[Column] = schema.properties.toSeq.sortBy(_._1).flatMap {
      case (name, ref) => Seq(lit(name), resolve(ref, kwargs))
    }
    // empty map() is map<void,void> — cast so map_keys/map_concat in the
    // upsert's prop-merge resolve against the stored map<string,string>
    val propsMap =
      if (propCols.isEmpty) map().cast("map<string,string>")
      else map(propCols: _*)
    val projected = batch
      .select(
        lit(schema.label).as("label"),
        resolve(schema.idRef, kwargs).as("id"),
        propsMap.as("props"),
        (if (schema.extraLabels.isEmpty) array().cast("array<string>")
         else array(schema.extraLabels.map(lit): _*)).as("extra_labels"),
        schema.subResource
          .map(sr => resolve(sr.ref, kwargs))
          .getOrElse(lit(null).cast("string")).as("sub_resource_id"),
        lit(updateTag).as("firstseen"),
        lit(updateTag).as("lastupdated"))
      .filter(col("id").isNotNull)
    // MERGE collapses duplicate ids within a batch, deterministically
    // (greatest-JSON winner; see dedupByKeys).
    if (dedup) dedupByKeys(projected, Seq("id")) else projected
  }

  /** Key-wise upsert of `fresh` rows into the existing table state,
    * preserving firstseen. Both sides must share the canonical schema;
    * `keys` identifies a row.
    */
  def upsert(existing: DataFrame, fresh: DataFrame, keys: Seq[String],
             updateTag: Long): DataFrame = {
    val oldDf = existing.select(existing.columns.map(c => col(c).as(s"old_$c")).toSeq: _*)
    val joinCond = keys.map(k => col(s"old_$k") <=> col(k)).reduce(_ && _)
    val nonKeyCols = fresh.columns.filterNot(keys.contains)
    val merged = fresh.join(oldDf, joinCond, "full_outer")
    val isFresh = col(keys.head).isNotNull
    val outCols = keys.map(k => coalesce(col(k), col(s"old_$k")).as(k)) ++
      nonKeyCols.map {
        case "firstseen" =>
          coalesce(col("old_firstseen"), lit(updateTag)).as("firstseen")
        case "lastupdated" =>
          when(isFresh, lit(updateTag)).otherwise(col("old_lastupdated")).as("lastupdated")
        case "props" =>
          // MERGE ... SET sets only the batch's DECLARED properties
          // (querybuilder.py:384-393): on a matched row, fresh keys win
          // but keys set by OTHER schemas/modules on the same node
          // survive — replacing the whole map would silently delete a
          // sibling module's enrichment on every re-sync.
          when(isFresh && col("old_props").isNotNull,
            map_concat(
              map_filter(col("old_props"),
                (k, _) => !array_contains(map_keys(col("props")), k)),
              col("props")))
            .otherwise(when(isFresh, col("props")).otherwise(col("old_props")))
            .as("props")
        case c => when(isFresh, col(c)).otherwise(col(s"old_$c")).as(c)
      }
    merged.select(outCols: _*)
  }

  /** Upsert a precomputed edge batch (canonical edge schema) with the
    * same firstseen-preserving MERGE semantics as schema-driven rels —
    * the analog of the reference's 68 handwritten UNWIND+MERGE loads
    * (SURVEY.md §2.3 "handwritten loads"). Used for dynamic rel labels
    * (e.g. one per extracted predicate) where a static RelSchema can't
    * express the label.
    */
  def upsertEdgeBatch(spark: SparkSession, batch: DataFrame, updateTag: Long,
                      edges: SnapshotTable, collectStats: Boolean = true,
                      dedupBatch: Boolean = true,
                      edgeIndex: Option[EdgeEndpointIndex] = None): Long = {
    val keys = Seq("src_label", "src_id", "rel_label", "dst_label", "dst_id")
    // dedupBatch=false skips a corpus-sized shuffle when the caller's
    // batch is already key-unique (e.g. an aggregation output)
    // Edge batches are typically AGGREGATION outputs (unlike node
    // batches): even the emptiness check runs their full shuffle map
    // side, so the cache pays for itself on every path — measured: an
    // uncached first commit re-ran the mention/triple aggregation maps
    // and cost more than the cache round-trip it saved.
    val fresh = (if (dedupBatch) dedupByKeys(batch, keys) else batch).persist()
    try {
      // first commit: the batch IS the table — no upsert join, and no
      // touched-partition pre-pass (commit() lays out whatever exists)
      if (!edges.exists) {
        if (fresh.isEmpty) return 0L
        val n = if (collectStats) fresh.count() else -1L
        // index FIRST: a crash between the two commits must leave the
        // index over-approximating (harmless extra reads), never under-
        // approximating (missed DETACHes) — its documented contract.
        // Coverage is only CONFIRMED after the commit exists.
        edgeIndex.foreach(_.update(fresh, updateTag))
        edges.commit(fresh, updateTag)
        edgeIndex.foreach(_.confirmCoverage())
        return n
      }
      // bucket-precise: only the physical partitions the batch hashes
      // into are read and rewritten; every other bucket's files are
      // carried forward by reference in the new manifest
      val touched = edges.physicalValuesOf(fresh)
      if (touched.isEmpty) return 0L
      val merged = edges.readPhysical(touched) match {
        case Some(existing) => upsert(existing, fresh, keys, updateTag)
        case None => fresh
      }
      val n = if (collectStats) fresh.count() else -1L
      edgeIndex.foreach(_.update(fresh, updateTag)) // before the edge commit (see above)
      edges.commitPhysical(merged, updateTag, touched)
      edgeIndex.foreach(_.confirmCoverage())
      n
    } finally fresh.unpersist()
  }

  /** Upsert a precomputed batch of canonical node rows spanning one or
    * more labels in a single merge + single commit — the fused fast path
    * for pipelines loading several schemas per sync (each separate
    * load() pays its own join + write round; a 100 TB sync with k node
    * types does k× the jobs for no extra information).
    */
  def upsertNodeBatch(spark: SparkSession, batch: DataFrame, updateTag: Long,
                      nodes: SnapshotTable, dedupBatch: Boolean = true): Long = {
    // dedupBatch=false skips a corpus-sized shuffle when the caller's
    // batch is already (label, id)-unique (e.g. projections of committed
    // one-row-per-key tables) — same contract as upsertEdgeBatch
    val fresh0 = if (dedupBatch) dedupByKeys(batch, Seq("label", "id"))
                 else batch
    if (!nodes.exists && !dedupBatch) {
      // first commit of a NARROW (already key-unique) batch: isEmpty
      // touches one input partition and the commit is the only full
      // pass, so a cache would just add a batch-sized memory round-trip.
      // (With dedupBatch the batch is a shuffle output and even isEmpty
      // runs its full map side — the cached path below is cheaper, same
      // reasoning as upsertEdgeBatch.)
      if (fresh0.isEmpty) return 0L
      nodes.commit(fresh0, updateTag)
      return -1L
    }
    val fresh = fresh0.persist()
    try {
      if (!nodes.exists) { // first commit: the batch IS the table
        if (fresh.isEmpty) return 0L
        nodes.commit(fresh, updateTag)
        return -1L
      }
      val touched = nodes.physicalValuesOf(fresh)
      if (touched.isEmpty) return 0L
      val merged = nodes.readPhysical(touched) match {
        case Some(existing) => upsert(existing, fresh, Seq("label", "id"), updateTag)
        case None => fresh
      }
      nodes.commitPhysical(merged, updateTag, touched)
      -1L
    } finally fresh.unpersist()
  }

  /** Restrict a schema's declared relationships to a selected subset —
    * the filter_selected_relationships semantics
    * (cartography/graph/querybuilder.py:319-358):
    *  - None selects everything (no filtering);
    *  - Some(set) must name only rels declared on the schema (sub-resource
    *    rel label or an otherRels label) — anything else is an error;
    *  - the sub-resource rel is attached ONLY if explicitly selected;
    *  - Some(empty) selects no relationships at all.
    */
  def filterSelectedRels(schema: NodeSchema, selected: Option[Set[String]])
      : (Option[SubResourceRel], Seq[RelSchema]) = selected match {
    case None => (schema.subResource, schema.otherRels)
    case Some(sel) =>
      val declared = schema.relLabels.toSet
      val unknown = sel -- declared
      require(unknown.isEmpty,
        s"selected_relationships ${unknown.mkString(", ")} are not defined on " +
          s"node schema ${schema.label}. Declared relationships: " +
          s"${declared.mkString(", ")}.")
      (schema.subResource.filter(sr => sel(sr.relLabel)),
        schema.otherRels.filter(r => sel(r.relLabel)))
  }

  /** Full load: nodes + relationship attachments, committed to the
    * snapshot tables. `selectedRels` loads only a subset of the schema's
    * declared relationships (see [[filterSelectedRels]]). Returns stats
    * for lineage.
    */
  def load(spark: SparkSession, batch: DataFrame, schema: NodeSchema,
           kwargs: Map[String, String], updateTag: Long,
           nodes: SnapshotTable, edges: SnapshotTable,
           collectStats: Boolean = true,
           selectedRels: Option[Set[String]] = None,
           edgeIndex: Option[EdgeEndpointIndex] = None): LoadStats = {
    val (selSubRes, selOtherRels) = filterSelectedRels(schema, selectedRels)
    if (batch.isEmpty) return LoadStats(0, 0) // no-op on empty input (tx.py:253)

    val fresh = toNodeRows(batch, schema, kwargs, updateTag).persist()
    val nUpserted = if (collectStats) fresh.count() else -1L
    if (!nodes.exists) {
      nodes.commit(fresh, updateTag) // first commit: the batch IS the table
    } else {
      // bucket-precise merge: read + rewrite only the buckets the batch
      // hashes into; untouched buckets carry forward by file reference
      val touched = nodes.physicalValuesOf(fresh)
      val mergedPart = nodes.readPhysical(touched) match {
        case Some(existing) => upsert(existing, fresh, Seq("label", "id"), updateTag)
        case None => fresh
      }
      nodes.commitPhysical(mergedPart, updateTag, touched)
    }
    fresh.unpersist()

    // ---- relationships ----------------------------------------------------
    // Target lookups read the *post-commit* node state so self-references
    // and sub-resource containers loaded earlier in the same run resolve.
    // readPartition prunes to the target label's buckets only — read()
    // would list and scan every label of a 100 TB table once per rel.
    def labelState(label: String): DataFrame =
      nodes.readPartition(label).getOrElse(GraphTables.emptyNodes(spark))

    val batchWithId = batch.withColumn("_src_id",
      resolve(schema.idRef, kwargs))

    def edgeRowsFor(rel: RelSchema, targets: DataFrame): DataFrame = {
      val tgt = targets
        .select(col("id").as("_tgt_id"), col("props").as("_tgt_props"))
      def tgtKey(m: TargetMatcher): Column =
        if (m.targetKey == "id") col("_tgt_id")
        else element_at(col("_tgt_props"), m.targetKey)
      val exploded = rel.matchers.zipWithIndex.foldLeft(batchWithId) {
        case (df, (TargetMatcher(_, RowRef(f), MatchMode.OneToMany), i)) =>
          df.withColumn(s"_o2m_$i", explode(col(f)))
        case (df, _) => df
      }
      val conds: Seq[Column] = rel.matchers.zipWithIndex.map { case (m, i) =>
        val refCol = m match {
          case TargetMatcher(_, RowRef(_), MatchMode.OneToMany) =>
            col(s"_o2m_$i").cast("string")
          case _ => resolve(m.ref, kwargs)
        }
        m.mode match {
          case MatchMode.Exact | MatchMode.OneToMany => tgtKey(m) === refCol
          case MatchMode.IgnoreCase => lower(tgtKey(m)) === lower(refCol)
          case MatchMode.FuzzyContains => lower(tgtKey(m)).contains(lower(refCol))
        }
      }
      val joined = exploded.join(tgt, conds.reduce(_ && _))
      val propCols: Seq[Column] = rel.properties.toSeq.sortBy(_._1).flatMap {
        case (name, ref) => Seq(lit(name), resolve(ref, kwargs))
      }
      val propsMap = if (propCols.isEmpty)
        map().cast("map<string,string>") else map(propCols: _*)
      val (srcLabel, srcId, dstLabel, dstId) = rel.direction match {
        case LinkDirection.Outward =>
          (lit(schema.label), col("_src_id"), lit(rel.targetLabel), col("_tgt_id"))
        case LinkDirection.Inward =>
          (lit(rel.targetLabel), col("_tgt_id"), lit(schema.label), col("_src_id"))
      }
      dedupByKeys(joined.select(
        srcLabel.as("src_label"), srcId.cast("string").as("src_id"),
        lit(rel.relLabel).as("rel_label"),
        dstLabel.as("dst_label"), dstId.cast("string").as("dst_id"),
        propsMap.as("props"),
        lit(updateTag).as("firstseen"), lit(updateTag).as("lastupdated")),
        Seq("src_label", "src_id", "rel_label", "dst_label", "dst_id"))
    }

    val subEdges: Seq[DataFrame] = selSubRes.toSeq.map { sr =>
      val container = labelState(sr.targetLabel)
        .filter(col("id") === lit(kwargs.getOrElse(sr.ref.name,
          sys.error(s"missing kwarg '${sr.ref.name}'"))))
      // The container is a single node — broadcast the lookup.
      edgeRowsFor(
        RelSchema(sr.relLabel, sr.targetLabel, sr.direction,
          Seq(TargetMatcher(sr.targetKey, sr.ref, MatchMode.Exact))),
        broadcast(container))
    }
    val otherEdges: Seq[DataFrame] = selOtherRels.map { rel =>
      edgeRowsFor(rel, labelState(rel.targetLabel))
    }
    val allEdges = (subEdges ++ otherEdges).reduceOption(_ unionByName _)

    val eUpserted = allEdges match {
      case None => 0L
      case Some(e0) =>
        val e = e0.persist()
        try {
          if (e.isEmpty) 0L // every matcher missed (silent skip)
          else if (!edges.exists) {
            val n = if (collectStats) e.count() else -1L
            // index first — crash safety must err toward over-approximation
            edgeIndex.foreach(_.update(e, updateTag))
            edges.commit(e, updateTag) // first commit: the batch IS the table
            edgeIndex.foreach(_.confirmCoverage())
            n
          } else {
            val touchedE = edges.physicalValuesOf(e)
            val mergedE = edges.readPhysical(touchedE) match {
              case Some(existing) => upsert(existing, e,
                Seq("src_label", "src_id", "rel_label", "dst_label", "dst_id"), updateTag)
              case None => e
            }
            val n = if (collectStats) e.count() else -1L
            edgeIndex.foreach(_.update(e, updateTag)) // before the edge commit
            edges.commitPhysical(mergedE, updateTag, touchedE)
            edgeIndex.foreach(_.confirmCoverage())
            n
          }
        } finally e.unpersist()
    }
    LoadStats(nUpserted, eUpserted)
  }
}
