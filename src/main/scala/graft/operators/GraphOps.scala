package graft.operators

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Graft
import graft.merge.{Cleanup, GraphMerge, GraphTables}
import graft.model._
import graft.snapshot.SnapshotTable

/** Driver-checkable exercises of the graph engine: each query runs real
  * GraphMerge/Cleanup loads against throwaway snapshot tables and
  * returns the resulting graph state; the DuckDB oracle recomputes the
  * *expected* state arithmetically from the same input tables — any
  * deviation in merge/cleanup/drift semantics shows up as a hash
  * mismatch.
  *
  * Domain mapping: Nation = the sub-resource container (AWSAccount
  * analog), Customer = the asset being synced.
  */
object GraphOps {

  private val nationSchema = NodeSchema("Nation", RowRef("nid"),
    properties = Map("name" -> RowRef("n_name")))

  private val customerSchema = NodeSchema("Customer", RowRef("cid"),
    properties = Map("name" -> RowRef("c_name"), "segment" -> RowRef("c_mktsegment")),
    subResource = Some(SubResourceRel(targetLabel = "Nation",
      ref = KwargRef("nation_id"))))

  private def tempRoot(): String =
    Files.createTempDirectory("graftq").toString

  private def customersOf(spark: SparkSession, sfDir: String, nationKey: Int): DataFrame =
    Graft.table(spark, sfDir, "customer")
      .filter(col("c_nationkey") === nationKey)
      .select(col("c_custkey").cast("string").as("cid"),
        col("c_name"), col("c_mktsegment"))

  private def loadNation(spark: SparkSession, sfDir: String, nationKey: Int,
                         nodes: SnapshotTable, edges: SnapshotTable): Unit = {
    val nat = Graft.table(spark, sfDir, "nation")
      .filter(col("n_nationkey") === nationKey)
      .select(col("n_nationkey").cast("string").as("nid"), col("n_name"))
    GraphMerge.load(spark, nat, nationSchema, Map.empty, 100L, nodes, edges)
  }

  /** Upsert semantics end-to-end: T1 loads the even-keyed half of nation
    * 1's customers, T2 loads all of them; firstseen must be preserved for
    * the half seen at T1.
    */
  def q13GraphUpsert(spark: SparkSession, sfDir: String): DataFrame = {
    val root = tempRoot()
    val nodes = GraphTables.nodes(spark, root)
    val edges = GraphTables.edges(spark, root)
    loadNation(spark, sfDir, 1, nodes, edges)
    val all = customersOf(spark, sfDir, 1)
    val kw = Map("nation_id" -> "1")
    GraphMerge.load(spark, all.filter(col("cid").cast("long") % 2 === 0),
      customerSchema, kw, 100L, nodes, edges)
    GraphMerge.load(spark, all, customerSchema, kw, 200L, nodes, edges)
    nodes.read().filter(col("label") === "Customer")
      .select(col("id"), col("firstseen"), col("lastupdated"),
        element_at(col("props"), "segment").as("segment"))
      .orderBy(col("id"))
  }

  /** Cleanup semantics end-to-end: T1 loads all of nation 1's customers,
    * T2 re-syncs only the even half and runs cleanup; the odd half must
    * vanish (nodes AND their RESOURCE edges) while the even half keeps
    * firstseen = 100.
    */
  def q14GraphCleanup(spark: SparkSession, sfDir: String): DataFrame = {
    val root = tempRoot()
    val nodes = GraphTables.nodes(spark, root)
    val edges = GraphTables.edges(spark, root)
    loadNation(spark, sfDir, 1, nodes, edges)
    val all = customersOf(spark, sfDir, 1)
    val kw = Map("nation_id" -> "1")
    GraphMerge.load(spark, all, customerSchema, kw, 100L, nodes, edges)
    GraphMerge.load(spark, all.filter(col("cid").cast("long") % 2 === 0),
      customerSchema, kw, 200L, nodes, edges)
    Cleanup.run(spark, customerSchema, kw, 200L, nodes, edges)
    val nodeSide = nodes.read().filter(col("label") === "Customer")
      .select(col("id"), col("firstseen"), col("lastupdated"))
    val edgeSide = edges.read().filter(col("rel_label") === "RESOURCE")
      .groupBy(col("dst_id").as("id")).agg(count(lit(1)).as("n_res_edges"))
    nodeSide.join(edgeSide, Seq("id"), "left")
      .select(col("id"), col("firstseen"), col("lastupdated"),
        coalesce(col("n_res_edges"), lit(0L)).as("n_res_edges"))
      .orderBy(col("id"))
  }

  /** Incremental windowed sync — the CVE-feed shape (windowed fetch +
    * last-modified incremental, cartography/intel/cve/feed.py:98-173)
    * over `warc_ts`: sync T1 covers the first 60% of the time range,
    * sync T2 the last 60% (20% overlap). Rows seen in both windows must
    * keep firstseen = 100 with lastupdated advanced to 200; the
    * freshness tags are exactly the reference's update_tag semantics.
    */
  def q24IncrementalSync(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.kg.Corpus
    val root = tempRoot()
    val nodes = GraphTables.nodes(spark, root)
    val edges = GraphTables.edges(spark, root)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long").as("i"))
    val n = docs.count()
    val aEnd = Corpus.tsOf(n * 6 / 10)   // exclusive upper bound of window A
    val bStart = Corpus.tsOf(n * 4 / 10) // inclusive lower bound of window B
    val pages = docs.select(
      concat(lit("https://host"), col("i") % 50, lit(".example/p/"), col("i")).as("pid"),
      (lit(Corpus.tsOf(0).getTime / 1000).cast("long") + col("i") * 60).cast("timestamp").as("warc_ts"))
    val schema = NodeSchema("Page", RowRef("pid"))
    // warc_ts range predicates prune at the scan (PushedFilters)
    GraphMerge.load(spark, pages.filter(col("warc_ts") < lit(aEnd)),
      schema, Map.empty, 100L, nodes, edges, collectStats = false)
    GraphMerge.load(spark, pages.filter(col("warc_ts") >= lit(bStart)),
      schema, Map.empty, 200L, nodes, edges, collectStats = false)
    nodes.read().filter(col("label") === "Page")
      .select(col("id"), col("firstseen"), col("lastupdated"))
      .orderBy(col("id"))
  }

  /** Drift detection (driftdetect/detect_deviations.py:66-112): diff two
    * snapshot versions in both directions via anti-joins.
    */
  def q15Drift(spark: SparkSession, sfDir: String): DataFrame = {
    val root = tempRoot()
    // bucketed on purpose: drift/time-travel must work on the bucketed layout
    val t = SnapshotTable(spark, s"$root/snap", Some("label"),
      Some(graft.snapshot.BucketSpec(Seq("id"), 4)))
    val all = customersOf(spark, sfDir, 1)
      .select(lit("Customer").as("label"), col("cid").as("id"))
    t.commit(all.filter(col("id").cast("long") % 2 === 0), 100L)
    t.commit(all.filter(col("id").cast("long") % 3 === 0), 200L)
    val v1 = t.readVersion(1L)
    val v2 = t.readVersion(2L)
    val added = v2.join(v1, Seq("label", "id"), "left_anti")
      .withColumn("direction", lit("added"))
    val removed = v1.join(v2, Seq("label", "id"), "left_anti")
      .withColumn("direction", lit("removed"))
    added.unionByName(removed).select(col("id"), col("direction"))
      .orderBy(col("direction"), col("id"))
  }
}
