package graft.kg

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.link.{Blocking, ConnectedComponents}
import graft.merge.{GraphMerge, GraphTables}
import graft.model.{NodeSchema, RowRef}
import graft.snapshot.SnapshotTable

/** End-to-end KG-construction pipeline (the north star):
  *
  *   pages → extract (HTML→text, byte-identical) → mentions (Aho–Corasick
  *   over broadcast dictionary) → links → duplicate-entity candidates
  *   (exact ∪ MinHash-LSH ∪ rare-token blocking, Jaccard-verified) →
  *   large-star/small-star CC canonicalization → triples → GraphMerge
  *   into nodes/edges snapshot tables.
  *
  * Stage protocol (the Sync.run analog, cartography/sync.py:66-124, with
  * the checkpoint/resume semantics the reference lacks): every stage
  * commits its output to a SnapshotTable stamped with the run's
  * update_tag; on re-run with the same tag a committed stage is read
  * back instead of recomputed — kill/restart resumes at the first
  * incomplete stage. Each stage also appends per-partition lineage rows
  * (ModuleSyncMetadata + statsd counters analog, cartography/util.py:
  * 133-165, graph/statement.py:99-112).
  *
  * Scale notes: extract/mentions/links/triples are narrow (zero
  * shuffle); the dictionary is broadcast; entity-space work (CC) is
  * orders of magnitude smaller than the corpus; the merge shuffles once
  * per graph partition. Mention links against a Zipf-headed entity space
  * aggregate per (url, entity) BEFORE any wider join, which is the
  * map-side-combine-style defusal of head-entity skew.
  */
final class KgPipeline(spark: SparkSession, workRoot: String) {
  import spark.implicits._

  private def stageTable(name: String): SnapshotTable =
    SnapshotTable(spark, s"$workRoot/stage_$name", None)

  val nodes: SnapshotTable = GraphTables.nodes(spark, s"$workRoot/graph")
  val edges: SnapshotTable = GraphTables.edges(spark, s"$workRoot/graph")

  /** True if `name` already committed for this updateTag (resume). */
  def stageDone(name: String, updateTag: Long): Boolean = {
    val t = stageTable(name)
    t.latestVersion.exists(v => t.updateTagOf(v) == updateTag)
  }

  private def lineage(stage: String, updateTag: Long, df: DataFrame,
                      rowsIn: Long = -1L): DataFrame = {
    val parts = df.groupBy(spark_partition_id().as("partition_id"))
      .agg(count(lit(1)).as("rows_out"))
      .select(lit(stage).as("stage"), col("partition_id"),
        lit(updateTag).as("update_tag"), lit(rowsIn).as("rows_in"),
        col("rows_out"))
    parts.write.mode("append").parquet(s"$workRoot/lineage")
    df
  }

  def lineageRows(): DataFrame = spark.read.parquet(s"$workRoot/lineage")

  /** Run (or resume) one stage: compute, commit, lineage. */
  private def stage(name: String, updateTag: Long)(compute: => DataFrame): DataFrame = {
    val t = stageTable(name)
    if (stageDone(name, updateTag)) t.read()
    else {
      val out = compute
      t.commit(out, updateTag)
      val committed = t.read()
      lineage(name, updateTag, committed)
      committed
    }
  }

  final case class Result(pages: DataFrame, texts: DataFrame,
                          links: DataFrame, canonical: DataFrame,
                          triples: DataFrame)

  def run(pagesIn: Dataset[Page], dict: Seq[AliasRow], updateTag: Long,
          mergeGraph: Boolean = true): Result = {
    val pagesDf = stage("pages", updateTag)(pagesIn.toDF())

    val textsDf = stage("extract", updateTag) {
      Extract.pageText(pagesDf.as[Page]).toDF()
    }

    // mention/link detection on English pages only (lang filter is part
    // of the pipeline contract, FIXTURES.md §1)
    val en = textsDf.filter(col("lang") === "en").as[PageText]

    val linksDf = stage("links", updateTag) {
      val ments = Extract.mentions(spark, en, dict.map(_.alias))
      Extract.links(spark, ments, dict).toDF()
    }

    val canonicalDf = stage("canonical", updateTag) {
      val dictDs = dict.toDS()
      val dupEdges = Blocking.duplicateEntityEdges(spark, dictDs)
        .toDF("u", "v")
      val allEntities = dict.map(_.entity_id).distinct.toDF("id")
      ConnectedComponents.run(spark, dupEdges, allEntities)
    }

    val triplesDf = stage("triples", updateTag) {
      val raw = Extract.triples(spark, en, dict, Corpus.predicates)
      // canonicalize subject and object (entity space is small relative
      // to the corpus -> broadcast both joins; no corpus-wide shuffle)
      val canonS = broadcast(canonicalDf
        .select(col("id").as("subj"), col("canonical_id").as("csubj")))
      val canonO = broadcast(canonicalDf
        .select(col("id").as("obj"), col("canonical_id").as("cobj")))
      raw.toDF().join(canonS, Seq("subj")).join(canonO, Seq("obj"))
        .select(col("url"), col("csubj").as("subj"), col("pred"),
          col("cobj").as("obj"))
        .dropDuplicates()
    }

    if (mergeGraph && !stageDone("merge", updateTag)) {
      mergeStage(pagesDf, linksDf, canonicalDf, triplesDf, updateTag)
      stageTable("merge").commit(Seq((updateTag, "done")).toDF("tag", "state"), updateTag)
    }

    Result(pagesDf, textsDf, linksDf, canonicalDf, triplesDf)
  }

  /** Stage 3: materialize Entity/Page nodes, MENTIONS edges and triple
    * edges through the upsert engine (firstseen/lastupdated semantics).
    */
  private def mergeStage(pagesDf: DataFrame, linksDf: DataFrame,
                         canonicalDf: DataFrame, triplesDf: DataFrame,
                         updateTag: Long): Unit = {
    // Page nodes
    val pageBatch = pagesDf.select(col("url").as("id"), col("lang"))
    GraphMerge.load(spark, pageBatch,
      NodeSchema("Page", RowRef("id"), properties = Map("lang" -> RowRef("lang"))),
      Map.empty, updateTag, nodes, edges)

    // Entity nodes: canonical ids only
    val entityBatch = canonicalDf.select(col("canonical_id").as("id")).distinct()
    GraphMerge.load(spark, entityBatch,
      NodeSchema("Entity", RowRef("id")),
      Map.empty, updateTag, nodes, edges)

    // MENTIONS edges with per-pair mention counts: aggregate BEFORE the
    // edge upsert (partial aggregation defuses the Zipf head entity)
    val canonB = broadcast(canonicalDf
      .select(col("id").as("entity_id"), col("canonical_id")))
    val mentionEdges = linksDf.join(canonB, Seq("entity_id"))
      .dropDuplicates("url", "start", "end", "canonical_id")
      .groupBy(col("url"), col("canonical_id"))
      .agg(count(lit(1)).as("n_mentions"))
      .select(lit("Page").as("src_label"), col("url").as("src_id"),
        lit("MENTIONS").as("rel_label"),
        lit("Entity").as("dst_label"), col("canonical_id").as("dst_id"),
        map(lit("n_mentions"), col("n_mentions").cast("string")).as("props"),
        lit(updateTag).as("firstseen"), lit(updateTag).as("lastupdated"))

    val tripleEdges = triplesDf
      .groupBy(col("subj"), col("pred"), col("obj"))
      .agg(countDistinct(col("url")).as("n_sources"))
      .select(lit("Entity").as("src_label"), col("subj").as("src_id"),
        col("pred").as("rel_label"),
        lit("Entity").as("dst_label"), col("obj").as("dst_id"),
        map(lit("n_sources"), col("n_sources").cast("string")).as("props"),
        lit(updateTag).as("firstseen"), lit(updateTag).as("lastupdated"))

    GraphMerge.upsertEdgeBatch(spark,
      mentionEdges.unionByName(tripleEdges), updateTag, edges)
  }
}
