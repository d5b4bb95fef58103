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

  // Lineage rows are buffered per stage and flushed as ONE append right
  // after that stage's commit. Flushing any later (e.g. once at the end
  // of the run) opens a crash window where a stage is committed but its
  // lineage is not — resume then sees stageDone and never re-emits the
  // rows, leaving the lineage table permanently incomplete. Plans are
  // lazy: each buffered part scans its stage's committed table only at
  // flush time.
  private val lineageBuf = scala.collection.mutable.ListBuffer.empty[DataFrame]

  private def lineage(stage: String, updateTag: Long, df: DataFrame,
                      rowsIn: Long = -1L): DataFrame = {
    lineageBuf += df.groupBy(spark_partition_id().as("partition_id"))
      .agg(count(lit(1)).as("rows_out"))
      .select(lit(stage).as("stage"), col("partition_id"),
        lit(updateTag).as("update_tag"), lit(rowsIn).as("rows_in"),
        col("rows_out"))
    df
  }

  private def flushLineage(): Unit = if (lineageBuf.nonEmpty) {
    lineageBuf.reduce(_ unionByName _)
      .write.mode("append").parquet(s"$workRoot/lineage")
    lineageBuf.clear()
  }

  def lineageRows(): DataFrame = spark.read.parquet(s"$workRoot/lineage")

  /** Run (or resume) one stage: compute, commit, lineage. Wall time per
    * stage goes to stderr (the statsd-timer analog,
    * cartography/util.py:176-196).
    */
  private def stage(name: String, updateTag: Long,
                    extraLineage: DataFrame => Unit = _ => ())
                   (compute: => DataFrame): DataFrame = {
    val t = stageTable(name)
    if (stageDone(name, updateTag)) t.read()
    else {
      val t0 = System.nanoTime()
      val out = compute
      t.commit(out, updateTag)
      val committed = t.read()
      lineage(name, updateTag, committed)
      extraLineage(committed) // rides in the same flush — one write job per stage
      flushLineage()
      System.err.println(f"[kg-timing] stage=$name sec=${(System.nanoTime() - t0) / 1e9}%.2f")
      committed
    }
  }

  final case class Result(pages: DataFrame, texts: DataFrame,
                          links: DataFrame, canonical: DataFrame,
                          triples: DataFrame)

  /** Driver-resident dictionary entrypoint (tests, small syncs). */
  def run(pagesIn: Dataset[Page], dict: Seq[AliasRow], updateTag: Long,
          mergeGraph: Boolean = true): Result =
    runWith(pagesIn, dict, None, updateTag, mergeGraph)

  /** Table-native dictionary entrypoint — the 100 TB shape: the alias
    * dictionary arrives as a (parquet/Iceberg-backed) Dataset, not a
    * driver Seq. Only the bounded Aho–Corasick broadcast is
    * driver-materialized (size-checked against
    * [[KgPipeline.MaxBroadcastAliases]] — the automaton must fit in one
    * executor heap regardless of where the rows come from); blocking +
    * CC candidate generation stays on the Dataset above the local bound.
    */
  def run(pagesIn: Dataset[Page], dict: Dataset[AliasRow], updateTag: Long,
          mergeGraph: Boolean): Result = {
    val n = dict.count()
    require(n <= KgPipeline.MaxBroadcastAliases,
      s"alias dictionary has $n rows; the AC broadcast is capped at " +
        s"${KgPipeline.MaxBroadcastAliases} — shard the dictionary across runs")
    runWith(pagesIn, dict.collect().toSeq, Some(dict), updateTag, mergeGraph)
  }

  private def runWith(pagesIn: Dataset[Page], dict: Seq[AliasRow],
                      dictDs: Option[Dataset[AliasRow]], updateTag: Long,
                      mergeGraph: Boolean): Result = {
    // The pages table is the pipeline's INPUT — in production an
    // immutable Iceberg table that already exists; it is never committed
    // as a stage (a pipeline reads its input, it does not rewrite it).
    // Resumability starts at the first derived stage: `pagesIn` must be
    // deterministic or table-backed, and each stage below commits.
    val pagesDf = pagesIn.toDF()

    // Input-cardinality lineage row ("pages") is derived from the
    // committed extract output (1 row per page) rather than by
    // re-scanning the raw input, and flushes with the extract row.
    val textsDf = stage("extract", updateTag,
      committed => lineage("pages", updateTag, committed)) {
      Extract.pageText(pagesDf.as[Page]).toDF()
    }

    // mention/link detection on English pages only (lang filter is part
    // of the pipeline contract, FIXTURES.md §1)
    val en = textsDf.filter(col("lang") === "en").as[PageText]

    // Fused single-pass extraction: one AC scan emits links AND raw
    // triples (Extract.facts) — committed as one table, consumed as two
    // filtered views. Lineage keeps the per-kind row counts.
    def linksView(facts: DataFrame): DataFrame =
      facts.filter(col("kind") === 0)
        .select(col("url"), col("start"), col("end"), col("a").as("entity_id"))
    val factsDf = stage("facts", updateTag,
      committed => lineage("links", updateTag, linksView(committed))) {
      Extract.facts(spark, en, dict, Corpus.predicates).toDF()
    }
    val linksDf = linksView(factsDf)

    val canonicalDf = stage("canonical", updateTag) {
      // Blocking + CC live in entity space (≪ corpus size). Below the
      // local bound the candidate generation runs on the driver (same
      // semantics, pinned by tests); above it the distributed
      // Dataset/LSH path takes over — on the table-backed Dataset when
      // one was provided, so the dictionary never round-trips the driver.
      val dupEdges =
        if (dict.sizeIs <= KgPipeline.LocalBlockingBound)
          Blocking.duplicateEntityEdgesLocal(dict).map(p => (p.a, p.b))
            .toDF("u", "v")
        else
          Blocking.duplicateEntityEdges(spark, dictDs.getOrElse(dict.toDS()))
            .toDF("u", "v")
      val allEntities = dictDs match {
        case Some(ds) => ds.select(col("entity_id").as("id")).distinct()
        case None => dict.map(_.entity_id).distinct.toDF("id")
      }
      ConnectedComponents.run(spark, dupEdges, allEntities)
    }

    val triplesDf = stage("triples", updateTag) {
      val raw = factsDf.filter(col("kind") === 1)
        .select(col("url"), col("a").as("subj"), col("pred"), col("obj"))
      // canonicalize subject and object (entity space is small relative
      // to the corpus -> broadcast both joins; no corpus-wide shuffle)
      val canonS = broadcast(canonicalDf
        .select(col("id").as("subj"), col("canonical_id").as("csubj")))
      val canonO = broadcast(canonicalDf
        .select(col("id").as("obj"), col("canonical_id").as("cobj")))
      raw.join(canonS, Seq("subj")).join(canonO, Seq("obj"))
        .select(col("url"), col("csubj").as("subj"), col("pred"),
          col("cobj").as("obj"))
        .dropDuplicates()
    }

    if (mergeGraph && !stageDone("merge", updateTag)) {
      val t0 = System.nanoTime()
      mergeStage(textsDf, linksDf, canonicalDf, triplesDf, updateTag)
      stageTable("merge").commit(Seq((updateTag, "done")).toDF("tag", "state"), updateTag)
      System.err.println(f"[kg-timing] stage=merge sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }

    flushLineage()
    Result(pagesDf, textsDf, linksDf, canonicalDf, triplesDf)
  }

  /** Stage 3: materialize Entity/Page nodes, MENTIONS edges and triple
    * edges through the upsert engine (firstseen/lastupdated semantics).
    */
  private def subTimed[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val a = f
    System.err.println(f"[kg-timing] substage=$name sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    a
  }

  /** `textsDf` (the committed extract output — one row per page with
    * url + lang) supplies the Page-node batch: projecting the raw input
    * would re-render/re-read every page's html for two columns.
    */
  private def mergeStage(textsDf: DataFrame, linksDf: DataFrame,
                         canonicalDf: DataFrame, triplesDf: DataFrame,
                         updateTag: Long): Unit = subTimed("merge.total") {
    // Page + Entity nodes in ONE fused upsert + commit (two separate
    // load() rounds would double the join/write jobs for no reason —
    // neither schema declares relationships; those go through the edge
    // batch below).
    val pageRows = GraphMerge.toNodeRows(
      textsDf.select(col("url").as("id"), col("lang")),
      NodeSchema("Page", RowRef("id"), properties = Map("lang" -> RowRef("lang"))),
      Map.empty, updateTag)
    val entityRows = GraphMerge.toNodeRows(
      canonicalDf.select(col("canonical_id").as("id")).distinct(),
      NodeSchema("Entity", RowRef("id")),
      Map.empty, updateTag)
    subTimed("merge.nodes")(GraphMerge.upsertNodeBatch(spark,
      pageRows.unionByName(entityRows), updateTag, nodes))

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

    subTimed("merge.edges")(GraphMerge.upsertEdgeBatch(spark,
      mentionEdges.unionByName(tripleEdges), updateTag, edges,
      collectStats = false))
  }
}

object KgPipeline {
  /** Upper bound on driver-materialized dictionary rows: the AC automaton
    * and alias→entity map are broadcast to every executor, so they must
    * fit in one heap no matter how the rows arrive. ~5M aliases ≈ low
    * hundreds of MB of automaton — the practical ceiling for a broadcast;
    * beyond it, shard the dictionary across runs (or automaton shards).
    */
  val MaxBroadcastAliases: Long = 5000000L

  /** Below this many dictionary rows, blocking + CC candidate generation
    * runs on the driver (identical semantics, pinned by KgSpec) — small
    * syncs skip ~10 tiny Spark jobs.
    */
  val LocalBlockingBound: Int = 200000
}
