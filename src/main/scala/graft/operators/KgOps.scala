package graft.operators

import java.nio.file.Files
import scala.jdk.CollectionConverters._
import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.kg.{Corpus, KgPipeline}

/** Driver-checkable KG-pipeline queries. The pipeline runs once per
  * scale dir (memoized) over pages synthesized deterministically from
  * documents.parquet; every planted fact is pure doc_id arithmetic, so
  * the DuckDB oracles recompute expected mentions / triples / canonical
  * ids / graph edges WITHOUT running any pipeline code — extraction,
  * linking, LSH blocking, CC and merge are all on the hook.
  */
object KgOps {

  private val cache = TrieMap.empty[String, (KgPipeline, KgPipeline#Result)]

  /** Memoized pipeline run for a scale dir (shared with Analysis.q21). */
  def pipelineHandle(spark: SparkSession, sfDir: String): (KgPipeline, KgPipeline#Result) =
    pipelineFor(spark, sfDir)

  private def pipelineFor(spark: SparkSession, sfDir: String): (KgPipeline, KgPipeline#Result) =
    cache.getOrElseUpdate(sfDir, {
      val work = graft.core.Graft.scratchDir("kgops")
      val pipe = new KgPipeline(spark, work)
      val res = pipe.run(Corpus.pages(spark, sfDir), Corpus.aliasRows, 100L,
        mergeGraph = true)
      (pipe, res)
    })

  /** Byte-identical extraction invariant, as counts the oracle can state:
    * every page's extracted text equals its ground truth.
    */
  def qkg1Invariant(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val (_, res) = pipelineFor(spark, sfDir)
    val pages = res.pages.select(col("url"), col("text").as("gt"))
    val texts = res.texts.select(col("url"), col("text"))
    pages.join(texts, "url")
      .agg(count(lit(1)).as("n_pages"),
        count(when(col("text") === col("gt"), 1)).as("n_exact"))
  }

  /** Canonical mention counts per (url, entity). */
  def qkg2Mentions(spark: SparkSession, sfDir: String): DataFrame = {
    val (_, res) = pipelineFor(spark, sfDir)
    val canon = broadcast(res.canonical
      .select(col("id").as("entity_id"), col("canonical_id")))
    res.links.join(canon, Seq("entity_id"))
      .dropDuplicates("url", "start", "end", "canonical_id")
      .groupBy(col("url"), col("canonical_id").as("entity_id"))
      .agg(count(lit(1)).as("n_mentions"))
      .orderBy(col("url"), col("entity_id"))
  }

  /** Canonicalized (url, subj, pred, obj) triples. */
  def qkg3Triples(spark: SparkSession, sfDir: String): DataFrame = {
    val (_, res) = pipelineFor(spark, sfDir)
    res.triples.select("url", "subj", "pred", "obj")
      .orderBy("url", "subj", "pred", "obj")
  }

  /** Entity canonicalization map (LSH/blocking + CC output). */
  def qkg4Canonical(spark: SparkSession, sfDir: String): DataFrame = {
    val (_, res) = pipelineFor(spark, sfDir)
    res.canonical.select(col("id").as("entity_id"), col("canonical_id"))
      .orderBy("entity_id")
  }

  /** Mention degree: top-30 canonical entities by total mentions — shows
    * the Zipf head (entity e0000) on top.
    */
  def qkg5Degree(spark: SparkSession, sfDir: String): DataFrame = {
    val (_, res) = pipelineFor(spark, sfDir)
    val canon = broadcast(res.canonical
      .select(col("id").as("entity_id"), col("canonical_id")))
    res.links.join(canon, Seq("entity_id"))
      .dropDuplicates("url", "start", "end", "canonical_id")
      .groupBy(col("canonical_id").as("entity_id"))
      .agg(count(lit(1)).as("n_mentions"))
      .orderBy(col("n_mentions").desc, col("entity_id"))
      .limit(30)
  }

  /** Materialized triple edges from the graph tables (post-GraphMerge),
    * with per-edge source counts and freshness tags.
    */
  def qkg6GraphEdges(spark: SparkSession, sfDir: String): DataFrame = {
    val (pipe, _) = pipelineFor(spark, sfDir)
    val preds = Corpus.predicates.map(_._1)
    pipe.edges.read()
      .filter(col("rel_label").isin(preds: _*))
      .select(col("src_id"), col("rel_label"), col("dst_id"),
        element_at(col("props"), "n_sources").cast("bigint").as("n_sources"),
        col("firstseen"), col("lastupdated"))
      .orderBy("src_id", "rel_label", "dst_id")
  }

  /** Per-page cap on distinct entities entering the co-mention
    * self-join: a page still contributes O(k²) pairs for its k distinct
    * entities, and k is UNBOUNDED in the wild — one directory-listing /
    * spam page with 10⁴ entity mentions would put 10⁸ pairs on a single
    * url key (the same blowup class as an uncapped LSH band bucket,
    * fenced in `Blocking.MaxBucket`). Pages above the cap are EXCLUDED
    * from co-mention analytics entirely (a page that mentions everything
    * co-mentions nothing meaningful — the standard boilerplate rule);
    * exclusion is deterministic, mirrored in the DuckDB oracles, and far
    * above any real page at test scale (≤ 6 distinct entities/page).
    */
  val MaxComentionEntitiesPerPage: Int = 256

  /** Drop every page whose DISTINCT-entity count exceeds `cap` from a
    * (url, canonical_id) page-entity table (counting distinct entities,
    * not rows, so a non-deduplicated mention table gets the same
    * verdict per page). One aggregation + one semi-join-shaped inner
    * join; no row of an under-cap page is touched.
    */
  def capComentionPages(pageEnt: DataFrame, cap: Int): DataFrame = {
    val small = pageEnt.groupBy("url")
      .agg(countDistinct(col("canonical_id")).as("k"))
      .filter(col("k") <= cap)
      .select("url")
    pageEnt.join(small, Seq("url"))
  }

  /** Distinct (url, canonical entity) rows of pages under the co-mention
    * cap — the shared input of qkg7 (pair counts) and qkg9 (triangles).
    */
  private def comentionPageEntities(res: KgPipeline#Result): DataFrame = {
    val canon = broadcast(res.canonical
      .select(col("id").as("entity_id"), col("canonical_id")))
    val pageEnt = res.links.join(canon, Seq("entity_id"))
      .select(col("url"), col("canonical_id")).distinct()
    capComentionPages(pageEnt, MaxComentionEntitiesPerPage)
  }

  /** Co-mention pairs: top-30 canonical entity pairs by number of pages
    * mentioning both. The distinct (page, entity) projection happens
    * BEFORE the per-page self-join — the aggregate-then-join shape that
    * keeps the Zipf head entity from exploding the join (each page
    * contributes O(k²) pairs for its k distinct entities, never
    * mention-count²) — and pages above
    * [[MaxComentionEntitiesPerPage]] are excluded (see its scaladoc).
    */
  def qkg7Comention(spark: SparkSession, sfDir: String): DataFrame = {
    val (_, res) = pipelineFor(spark, sfDir)
    val pageEnt = comentionPageEntities(res)
    val a = pageEnt.select(col("url"), col("canonical_id").as("entity_a"))
    val b = pageEnt.select(col("url"), col("canonical_id").as("entity_b"))
    a.join(b, Seq("url"))
      .filter(col("entity_a") < col("entity_b"))
      .groupBy(col("entity_a"), col("entity_b"))
      .agg(count(lit(1)).as("n_pages"))
      .orderBy(col("n_pages").desc, col("entity_a"), col("entity_b"))
      .limit(30)
  }

  /** Mention degree via the SALTED join path: same answer as qkg5, but
    * the entity-canonicalization join runs as a salted repartition join
    * (Skew.saltedJoin, salt = hash(url)) instead of a broadcast — the
    * shape used when the dictionary outgrows the broadcast threshold and
    * the Zipf head entity (e0000, on ~30% of pages) would otherwise pin
    * one reducer. Oracle identical to qkg5's.
    */
  def qkg8SaltedDegree(spark: SparkSession, sfDir: String): DataFrame = {
    val (_, res) = pipelineFor(spark, sfDir)
    val canon = res.canonical
      .select(col("id").as("entity_id"), col("canonical_id"))
    val linked = Skew.saltedJoin(
      res.links.toDF(), canon, "entity_id", hash(col("url")), salts = 16)
    linked.dropDuplicates("url", "start", "end", "canonical_id")
      .groupBy(col("canonical_id").as("entity_id"))
      .agg(count(lit(1)).as("n_mentions"))
      .orderBy(col("n_mentions").desc, col("entity_id"))
      .limit(30)
  }

  /** Per-entity triangle counts of the co-mention graph (degree-oriented
    * distributed enumeration, [[graft.graph.Analytics.triangleCounts]]):
    * edges are canonical entity pairs co-mentioned on at least one page
    * (qkg7's pair set), the classic clustering-structure metric over a
    * KG. Top 30 by count.
    */
  /** Co-mention entity pairs (u < v, one row per page sharing them) —
    * the shared edge generator of qkg9/qkg17/qkg18.
    */
  private def comentionPairs(res: KgPipeline#Result): DataFrame = {
    val pageEnt = comentionPageEntities(res)
    pageEnt.select(col("url"), col("canonical_id").as("u"))
      .join(pageEnt.select(col("url"), col("canonical_id").as("v")), Seq("url"))
      .filter(col("u") < col("v"))
      .select("u", "v")
  }

  def qkg9Triangles(spark: SparkSession, sfDir: String): DataFrame = {
    val (_, res) = pipelineFor(spark, sfDir)
    graft.graph.Analytics.triangleCounts(comentionPairs(res))
      .orderBy(col("n_triangles").desc, col("id"))
      .limit(30)
      .select(col("id").as("entity_id"), col("n_triangles"))
  }

  /** Fixed-iteration PageRank over the canonical triple-edge graph
    * ([[graft.graph.Analytics.pageRank]], 3 iterations, damping 0.85):
    * entity importance over the KG the pipeline just built. The
    * deterministic sorted-fold summation makes every one of the 800
    * double-valued ranks value-hash-comparable against the DuckDB
    * oracle (which unrolls the same three iterations in SQL with the
    * same left-to-right fold) — bit-identical floating point, not
    * approximate-match.
    */
  def qkg10PageRank(spark: SparkSession, sfDir: String): DataFrame = {
    val (_, res) = pipelineFor(spark, sfDir)
    val edges = res.triples.select(col("subj"), col("obj")).distinct()
    val nodes = res.canonical.select(col("canonical_id")).distinct()
    graft.graph.Analytics.pageRank(edges, nodes, iterations = 3, damping = 0.85)
      .select(col("id").as("entity_id"), col("rank"))
      .orderBy("entity_id")
  }

  /** Same PageRank as qkg10 but through the TWO-LEVEL salted fold
    * ([[graft.graph.Analytics.pageRankSalted]], 8 salt buckets on the
    * entity id's numeric suffix) — the operator shape that survives a
    * 10^8-in-degree Zipf head, value-hash-checked end to end: the DuckDB
    * oracle replays the identical two-level fold tree (per-bucket
    * contributor-ordered fold, then bucket-ordered fold of the
    * partials), so all 800 double ranks must again match BIT-for-bit.
    * The salt is an engine-portable pure function of the contributor id,
    * never a random salt — reproducibility is the contract.
    */
  def qkg11PageRankSalted(spark: SparkSession, sfDir: String): DataFrame = {
    val (_, res) = pipelineFor(spark, sfDir)
    val edges = res.triples.select(col("subj"), col("obj")).distinct()
    val nodes = res.canonical.select(col("canonical_id")).distinct()
    graft.graph.Analytics.pageRankSalted(edges, nodes, iterations = 3,
      damping = 0.85, u => pmod(substring(u, 2, 10).cast("int"), lit(8)))
      .select(col("id").as("entity_id"), col("rank"))
      .orderBy("entity_id")
  }

  /** Weakly-connected components of the canonical triple graph — the
    * third whole-graph analytics family member (communities of entities
    * joined by ANY predicate edge). Routes through
    * [[graft.link.ConnectedComponents.run]]'s size-dispatched entry —
    * driver union-find below the edge bound (which this fixture-scale
    * graph takes), the distributed large-star/small-star loop above it;
    * the two paths are pinned equal by KgSpec. Value-checked against a
    * recursive-CTE label-propagation oracle. Component label = min
    * entity id (fixed-width ids make string min == numeric min in both
    * engines).
    */
  def qkg12Components(spark: SparkSession, sfDir: String): DataFrame = {
    val (_, res) = pipelineFor(spark, sfDir)
    val edges = res.triples.select(col("subj").as("u"), col("obj").as("v"))
      .distinct()
    val nodes = res.canonical.select(col("canonical_id").as("id")).distinct()
    graft.link.ConnectedComponents.run(spark, edges, nodes)
      .select(col("id").as("entity_id"), col("canonical_id").as("component"))
      .orderBy("entity_id")
  }

  /** Personalized PageRank seeded on every 50th canonical entity (16
    * seeds of 800): the "entities related to THESE" primitive. Same
    * bit-reproducible contributor-ordered fold as qkg10/qkg11; the
    * oracle replays it with the seed-restricted teleport, so every rank
    * (including the exact 0.0 of seed-unreachable nodes) hash-matches.
    */
  def qkg13Ppr(spark: SparkSession, sfDir: String): DataFrame = {
    val (_, res) = pipelineFor(spark, sfDir)
    val edges = res.triples.select(col("subj"), col("obj")).distinct()
    val nodes = res.canonical.select(col("canonical_id")).distinct()
    val seeds = nodes.filter(
      pmod(substring(col("canonical_id"), 2, 10).cast("int"), lit(50)) === 0)
    graft.graph.Analytics.personalizedPageRank(edges, nodes, seeds,
      iterations = 3, damping = 0.85)
      .select(col("id").as("entity_id"), col("rank"))
      .orderBy("entity_id")
  }

  /** DuckDB oracle for qkg13: the qkg10 unrolled shape with rank_0 and
    * the per-iteration base restricted to the 16 seeds; fold tree
    * identical, so all 800 doubles are bit-identical (zero-rank
    * contributors add exact 0.0 on both sides).
    */
  def pprOracle: String = {
    val base = "CASE WHEN sd.id IS NOT NULL THEN " +
      "(CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE))/16 ELSE CAST(0 AS DOUBLE) END"
    val iters = (1 to 3).map { k =>
      s"""s$k AS (SELECT e.dst AS id,
         |    list_reduce(list_transform(list_sort(
         |      list({'u': e.src, 'c': r.rank/od.outdeg})), x -> x.c),
         |      (a, b) -> a + b) AS s
         |  FROM e JOIN r${k - 1} r ON r.id = e.src JOIN od ON od.src = e.src
         |  GROUP BY 1),
         |r$k AS (SELECT n.id, $base
         |    + CAST(0.85 AS DOUBLE) * COALESCE(s$k.s, CAST(0 AS DOUBLE)) AS rank
         |  FROM nodes n LEFT JOIN seeds sd ON sd.id = n.id
         |  LEFT JOIN s$k ON s$k.id = n.id)""".stripMargin
    }.mkString(",\n")
    s"""$tripleCte,
       |e AS (SELECT DISTINCT 'e' || lpad(CAST(cs AS VARCHAR), 4, '0') AS src,
       |        'e' || lpad(CAST(co AS VARCHAR), 4, '0') AS dst FROM cz),
       |nodes AS (SELECT 'e' || lpad(CAST(k AS VARCHAR), 4, '0') AS id
       |          FROM range(800) t(k)),
       |seeds AS (SELECT id FROM nodes WHERE CAST(substr(id, 2) AS INT) % 50 = 0),
       |od AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY 1),
       |r0 AS (SELECT n.id,
       |    CASE WHEN sd.id IS NOT NULL THEN CAST(1 AS DOUBLE)/16
       |         ELSE CAST(0 AS DOUBLE) END AS rank
       |  FROM nodes n LEFT JOIN seeds sd ON sd.id = n.id),
       |$iters
       |SELECT id AS entity_id, rank FROM r3 ORDER BY entity_id""".stripMargin
  }

  /** DuckDB oracle for qkg11: the qkg10 unrolled 3-iteration PageRank
    * with each iteration's summation replaced by the same two-level
    * salted fold the Spark operator uses (salt = numeric id suffix % 8;
    * level 1 folds {'u','c'} structs sorted by contributor inside each
    * (dst, salt) group, level 2 folds {'b','p'} partials sorted by salt).
    * list_reduce's first-element init equals the operator's 0.0 init
    * because 0.0 + x == x for every finite positive x.
    */
  def saltedPageRankOracle: String = {
    val iters = (1 to 3).map { k =>
      s"""s${k}a AS (SELECT e.dst AS id, CAST(substr(e.src, 2) AS INT) % 8 AS b,
         |    list_reduce(list_transform(list_sort(
         |      list({'u': e.src, 'c': r.rank/od.outdeg})), x -> x.c),
         |      (a, c2) -> a + c2) AS p
         |  FROM e JOIN r${k - 1} r ON r.id = e.src JOIN od ON od.src = e.src
         |  GROUP BY 1, 2),
         |s$k AS (SELECT id, list_reduce(list_transform(list_sort(
         |      list({'b': b, 'p': p})), x -> x.p), (a, c2) -> a + c2) AS s
         |  FROM s${k}a GROUP BY 1),
         |r$k AS (SELECT n.id,
         |    (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE))/800
         |      + CAST(0.85 AS DOUBLE) * COALESCE(s$k.s, CAST(0 AS DOUBLE)) AS rank
         |  FROM nodes n LEFT JOIN s$k ON s$k.id = n.id)""".stripMargin
    }.mkString(",\n")
    s"""$tripleCte,
       |e AS (SELECT DISTINCT 'e' || lpad(CAST(cs AS VARCHAR), 4, '0') AS src,
       |        'e' || lpad(CAST(co AS VARCHAR), 4, '0') AS dst FROM cz),
       |nodes AS (SELECT 'e' || lpad(CAST(k AS VARCHAR), 4, '0') AS id
       |          FROM range(800) t(k)),
       |od AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY 1),
       |r0 AS (SELECT id, CAST(1 AS DOUBLE)/800 AS rank FROM nodes),
       |$iters
       |SELECT id AS entity_id, rank FROM r3 ORDER BY entity_id""".stripMargin
  }

  /** HITS hubs-and-authorities over the canonical triple graph — the
    * web-graph quality-signal pair (see [[graft.graph.Analytics.hits]]):
    * subjects that point at well-cited objects score as hubs, entities
    * cited by good hubs score as authorities. 2 iterations,
    * max-normalized per half-step; every hub/auth double is
    * BIT-identical to the DuckDB oracle's replay (the max is order-free,
    * the sums are contributor-sorted folds).
    */
  def qkg14Hits(spark: SparkSession, sfDir: String): DataFrame = {
    val (_, res) = pipelineFor(spark, sfDir)
    val edges = res.triples.select(col("subj"), col("obj")).distinct()
    val nodes = res.canonical.select(col("canonical_id")).distinct()
    graft.graph.Analytics.hits(edges, nodes, iterations = 2)
      .select(col("id").as("entity_id"), col("hub"), col("auth"))
      .orderBy("entity_id")
  }

  /** DuckDB oracle for qkg14: 2 unrolled HITS iterations — each
    * half-step is the qkg10 fold (contributor-sorted list_reduce, same
    * 0.0-init equivalence) followed by a division by the half-step's
    * MAX (order-free in both engines), so hub AND auth are bit-identical
    * for all 800 entities.
    */
  def hitsOracle: String = {
    val iters = (1 to 2).map { k =>
      s"""a${k}s AS (SELECT e.dst AS id,
         |    list_reduce(list_transform(list_sort(
         |      list({'u': e.src, 'c': h.hub})), x -> x.c),
         |      (a, c2) -> a + c2) AS s
         |  FROM e JOIN h${k - 1} h ON h.id = e.src GROUP BY 1),
         |a${k}r AS (SELECT n.id, COALESCE(a${k}s.s, CAST(0 AS DOUBLE)) AS s
         |  FROM nodes n LEFT JOIN a${k}s ON a${k}s.id = n.id),
         |a$k AS (SELECT id, s / (SELECT MAX(s) FROM a${k}r) AS auth FROM a${k}r),
         |h${k}s AS (SELECT e.src AS id,
         |    list_reduce(list_transform(list_sort(
         |      list({'u': e.dst, 'c': t.auth})), x -> x.c),
         |      (a, c2) -> a + c2) AS s
         |  FROM e JOIN a$k t ON t.id = e.dst GROUP BY 1),
         |h${k}r AS (SELECT n.id, COALESCE(h${k}s.s, CAST(0 AS DOUBLE)) AS s
         |  FROM nodes n LEFT JOIN h${k}s ON h${k}s.id = n.id),
         |h$k AS (SELECT id, s / (SELECT MAX(s) FROM h${k}r) AS hub FROM h${k}r)""".stripMargin
    }.mkString(",\n")
    s"""$tripleCte,
       |e AS (SELECT DISTINCT 'e' || lpad(CAST(cs AS VARCHAR), 4, '0') AS src,
       |        'e' || lpad(CAST(co AS VARCHAR), 4, '0') AS dst FROM cz),
       |nodes AS (SELECT 'e' || lpad(CAST(k AS VARCHAR), 4, '0') AS id
       |          FROM range(800) t(k)),
       |h0 AS (SELECT id, CAST(1 AS DOUBLE) AS hub FROM nodes),
       |$iters
       |SELECT h2.id AS entity_id, h2.hub, a2.auth
       |FROM h2 JOIN a2 ON a2.id = h2.id ORDER BY entity_id""".stripMargin
  }

  /** Minimum-hop BFS distances from the qkg13 seed set (every 50th
    * canonical entity) over the triple graph, capped at 4 hops — the
    * exact-hop "within k hops of THESE" companion to PPR's soft
    * relatedness. Integer distances, so the value oracle (a recursive
    * CTE replaying level-bounded expansion with MIN(dist)) is exact by
    * construction. Unreachable entities are absent on both sides.
    */
  def qkg15Bfs(spark: SparkSession, sfDir: String): DataFrame = {
    val (_, res) = pipelineFor(spark, sfDir)
    val edges = res.triples.select(col("subj"), col("obj")).distinct()
    val nodes = res.canonical.select(col("canonical_id")).distinct()
    val seeds = nodes.filter(
      pmod(substring(col("canonical_id"), 2, 10).cast("int"), lit(50)) === 0)
    graft.graph.Analytics.bfsDistances(edges, nodes, seeds, maxHops = 4)
      .select(col("id").as("entity_id"), col("dist"))
      .orderBy("entity_id")
  }

  /** DuckDB oracle for qkg15: recursive CTE from the same seeds, hop
    * bound in the recursion guard, BFS distance = MIN over discovered
    * (id, dist) pairs — integer-exact on both engines.
    */
  def bfsOracle: String =
    s"""${tripleCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
       |e AS (SELECT DISTINCT 'e' || lpad(CAST(cs AS VARCHAR), 4, '0') AS src,
       |        'e' || lpad(CAST(co AS VARCHAR), 4, '0') AS dst FROM cz),
       |seeds AS (SELECT 'e' || lpad(CAST(k AS VARCHAR), 4, '0') AS id
       |          FROM range(800) t(k) WHERE k % 50 = 0),
       |d(id, dist) AS (
       |  SELECT id, 0 FROM seeds
       |  UNION
       |  SELECT e.dst, d.dist + 1 FROM d JOIN e ON e.src = d.id
       |  WHERE d.dist < 4)
       |SELECT id AS entity_id, MIN(dist) AS dist FROM d
       |GROUP BY id ORDER BY entity_id""".stripMargin

  /** Entity relatedness by shared neighbors over the triple graph
    * ([[graft.graph.Analytics.neighborJaccard]], hub cap 8): unordered
    * entity pairs scored by integer-scaled Jaccard of their undirected
    * neighbor sets. The cap is part of the proven semantics — the
    * oracle excludes super-hub shared neighbors exactly the same way.
    */
  def qkg16Related(spark: SparkSession, sfDir: String): DataFrame = {
    val (_, res) = pipelineFor(spark, sfDir)
    val edges = res.triples.select(col("subj"), col("obj")).distinct()
    graft.graph.Analytics.neighborJaccard(edges, maxHubDegree = 8)
      .orderBy("entity_a", "entity_b")
  }

  /** DuckDB oracle for qkg16: the same adjacency/degree/wedge algebra
    * in SQL — counts are integers and the score uses integer div, so
    * every row value-hashes.
    */
  def relatedOracle: String =
    s"""$tripleCte,
       |eg AS (SELECT DISTINCT 'e' || lpad(CAST(cs AS VARCHAR), 4, '0') AS u,
       |        'e' || lpad(CAST(co AS VARCHAR), 4, '0') AS v FROM cz),
       |und AS (SELECT DISTINCT LEAST(u, v) AS a, GREATEST(u, v) AS b
       |        FROM eg WHERE u <> v),
       |adj AS (SELECT a AS x, b AS nbr FROM und
       |        UNION ALL SELECT b AS x, a AS nbr FROM und),
       |deg AS (SELECT x, COUNT(*) AS d FROM adj GROUP BY 1),
       |cnt AS (SELECT x AS nbr FROM deg WHERE d <= 8),
       |w AS (SELECT l.x AS a, r.x AS b, COUNT(*) AS common_cnt
       |      FROM adj l JOIN adj r ON l.nbr = r.nbr AND l.x < r.x
       |      JOIN cnt c ON c.nbr = l.nbr
       |      GROUP BY 1, 2)
       |SELECT w.a AS entity_a, w.b AS entity_b, w.common_cnt,
       |  da.d + db.d - w.common_cnt AS union_cnt,
       |  w.common_cnt * CAST(1000000 AS BIGINT)
       |    // (da.d + db.d - w.common_cnt) AS score
       |FROM w JOIN deg da ON da.x = w.a JOIN deg db ON db.x = w.b
       |ORDER BY entity_a, entity_b""".stripMargin

  /** Adamic–Adar link prediction over the canonical triple graph
    * ([[graft.graph.Analytics.adamicAdar]], same edge set and hub cap
    * as qkg16): common-neighbor evidence weighted 1/ln(deg) — the
    * rarity-damped companion to qkg16's Jaccard, with bit-identical
    * doubles (exact integer degrees, ExactMath polynomial ln, sorted
    * per-pair fold).
    */
  def qkg23AdamicAdar(spark: SparkSession, sfDir: String): DataFrame = {
    val (_, res) = pipelineFor(spark, sfDir)
    val edges = res.triples.select(col("subj"), col("obj")).distinct()
    graft.graph.Analytics.adamicAdar(edges, maxHubDegree = 8)
      .orderBy("entity_a", "entity_b")
  }

  /** Square (4-cycle) counts per diagonal pair over the triple graph
    * ([[graft.graph.Analytics.squareCounts]], same edges and hub cap as
    * qkg16) — the two-mode-structure motif signal next to qkg9's
    * triangles.
    */
  def qkg26Squares(spark: SparkSession, sfDir: String): DataFrame = {
    val (_, res) = pipelineFor(spark, sfDir)
    val edges = res.triples.select(col("subj"), col("obj")).distinct()
    graft.graph.Analytics.squareCounts(edges, maxHubDegree = 8)
      .orderBy("entity_a", "entity_b")
  }

  /** Truncated Katz influence (β = 0.5, ≤ 3 hops) over the DIRECTED
    * triple graph ([[graft.graph.Analytics.katzBounded]]) — integer
    * path counts, dyadic damping, bit-exact doubles.
    */
  def qkg27Katz(spark: SparkSession, sfDir: String): DataFrame = {
    val (_, res) = pipelineFor(spark, sfDir)
    val edges = res.triples.select(col("subj"), col("obj")).distinct()
    val nodes = res.canonical.select(col("canonical_id")).distinct()
    graft.graph.Analytics.katzBounded(edges, nodes)
      .select(col("id").as("entity_id"), col("c1"), col("c2"), col("c3"),
        col("katz"))
      .orderBy("entity_id")
  }

  /** DuckDB oracle for qkg27: two unrolled path-count join-aggregates
    * + the same dyadic three-term sum.
    */
  def katzOracle: String =
    s"""$tripleCte,
       |eg AS (SELECT DISTINCT 'e' || lpad(CAST(cs AS VARCHAR), 4, '0') AS src,
       |        'e' || lpad(CAST(co AS VARCHAR), 4, '0') AS dst FROM cz),
       |nodes AS (SELECT 'e' || lpad(CAST(k AS VARCHAR), 4, '0') AS id
       |          FROM range(800) t(k)),
       |c1 AS (SELECT src, COUNT(*) AS c1 FROM eg GROUP BY 1),
       |c2 AS (SELECT e.src, CAST(SUM(c1.c1) AS BIGINT) AS c2
       |       FROM eg e JOIN c1 ON c1.src = e.dst GROUP BY 1),
       |c3 AS (SELECT e.src, CAST(SUM(c2.c2) AS BIGINT) AS c3
       |       FROM eg e JOIN c2 ON c2.src = e.dst GROUP BY 1)
       |SELECT n.id AS entity_id,
       |  COALESCE(c1.c1, CAST(0 AS BIGINT)) AS c1,
       |  COALESCE(c2.c2, CAST(0 AS BIGINT)) AS c2,
       |  COALESCE(c3.c3, CAST(0 AS BIGINT)) AS c3,
       |  CAST(0.5 AS DOUBLE) * COALESCE(c1.c1, CAST(0 AS BIGINT))
       |   + CAST(0.25 AS DOUBLE) * COALESCE(c2.c2, CAST(0 AS BIGINT))
       |   + CAST(0.125 AS DOUBLE) * COALESCE(c3.c3, CAST(0 AS BIGINT))
       |   AS katz
       |FROM nodes n
       |LEFT JOIN c1 ON c1.src = n.id
       |LEFT JOIN c2 ON c2.src = n.id
       |LEFT JOIN c3 ON c3.src = n.id
       |ORDER BY entity_id""".stripMargin

  /** DuckDB oracle for qkg26: the qkg16 wedge algebra, filtered to
    * pairs with ≥ 2 capped common neighbors, C(c, 2) via integer div.
    */
  def squaresOracle: String =
    s"""$tripleCte,
       |eg AS (SELECT DISTINCT 'e' || lpad(CAST(cs AS VARCHAR), 4, '0') AS u,
       |        'e' || lpad(CAST(co AS VARCHAR), 4, '0') AS v FROM cz),
       |und AS (SELECT DISTINCT LEAST(u, v) AS a, GREATEST(u, v) AS b
       |        FROM eg WHERE u <> v),
       |adj AS (SELECT a AS x, b AS nbr FROM und
       |        UNION ALL SELECT b AS x, a AS nbr FROM und),
       |deg AS (SELECT x, COUNT(*) AS d FROM adj GROUP BY 1),
       |cnt AS (SELECT x AS nbr FROM deg WHERE d <= 8),
       |w AS (SELECT l.x AS a, r.x AS b, COUNT(*) AS common_cnt
       |      FROM adj l JOIN adj r ON l.nbr = r.nbr AND l.x < r.x
       |      JOIN cnt c ON c.nbr = l.nbr
       |      GROUP BY 1, 2)
       |SELECT a AS entity_a, b AS entity_b, common_cnt,
       |  common_cnt * (common_cnt - 1) // 2 AS n_squares
       |FROM w WHERE common_cnt >= 2
       |ORDER BY entity_a, entity_b""".stripMargin

  /** DuckDB oracle for qkg23: the qkg16 adjacency/degree/wedge algebra
    * plus the staged ExactMath ln over each capped neighbor's degree and
    * the sorted per-pair fold — every double bit-matches.
    */
  def adamicAdarOracle: String = {
    import graft.functions.ExactMath
    s"""$tripleCte,
       |eg AS (SELECT DISTINCT 'e' || lpad(CAST(cs AS VARCHAR), 4, '0') AS u,
       |        'e' || lpad(CAST(co AS VARCHAR), 4, '0') AS v FROM cz),
       |und AS (SELECT DISTINCT LEAST(u, v) AS a, GREATEST(u, v) AS b
       |        FROM eg WHERE u <> v),
       |adj AS (SELECT a AS x, b AS nbr FROM und
       |        UNION ALL SELECT b AS x, a AS nbr FROM und),
       |deg AS (SELECT x, COUNT(*) AS d FROM adj GROUP BY 1),
       |cp AS (SELECT x, d FROM deg WHERE d BETWEEN 2 AND 8),
       |ca AS (SELECT *, ${ExactMath.blSql("d")} AS bl FROM cp),
       |cb AS (SELECT *, ${ExactMath.mSql("d", "bl")} AS mm FROM ca),
       |cc2 AS (SELECT *, ${ExactMath.zSql("mm")} AS z FROM cb),
       |cd AS (SELECT *, z * z AS z2 FROM cc2),
       |ce AS (SELECT x AS nbr,
       |        CAST(1.0 AS DOUBLE) / ${ExactMath.lnFromPartsSql()} AS invln
       |       FROM cd),
       |w AS (SELECT l.x AS ea, r.x AS eb, l.nbr, ce.invln
       |      FROM adj l JOIN adj r ON l.nbr = r.nbr AND l.x < r.x
       |      JOIN ce ON ce.nbr = l.nbr)
       |SELECT ea AS entity_a, eb AS entity_b, COUNT(*) AS common_cnt,
       |  list_reduce(list_transform(list_sort(
       |    list({'n': nbr, 'v': invln})), x -> x.v),
       |    (a, b) -> a + b) AS aa_score
       |FROM w GROUP BY 1, 2 ORDER BY entity_a, entity_b""".stripMargin
  }

  /** Deterministic synchronous label propagation over the co-mention
    * graph ([[graft.graph.Analytics.labelPropagation]], 3 iterations):
    * community labels from majority neighbor votes with the smallest
    * label winning ties — the community-detection member of the
    * analytics family (qkg12's components give reachability; this
    * splits them along dense cores). Integer counts + string mins only,
    * so the DuckDB oracle (which replays the 3 synchronous rounds with
    * the identical tie order) matches every row exactly.
    */
  def qkg17LabelProp(spark: SparkSession, sfDir: String): DataFrame = {
    val (_, res) = pipelineFor(spark, sfDir)
    val nodes = res.canonical.select(col("canonical_id")).distinct()
    graft.graph.Analytics.labelPropagation(comentionPairs(res), nodes,
        iterations = 3)
      .select(col("id").as("entity_id"), col("label"))
      .orderBy("entity_id")
  }

  /** DuckDB oracle CTE chain shared by qkg17/qkg18: the capped
    * co-mention edge set as fixed-width entity-id strings, plus the
    * 800-entity node table.
    */
  private def comentionGraphCte: String =
    s"""$mentionCte,
       |pe0 AS (SELECT DISTINCT i, ck FROM c),
       |ok AS (SELECT i FROM pe0 GROUP BY i
       |       HAVING COUNT(*) <= $MaxComentionEntitiesPerPage),
       |pe AS (SELECT pe0.i, pe0.ck FROM pe0 JOIN ok USING (i)),
       |eg AS (SELECT DISTINCT 'e' || lpad(CAST(a.ck AS VARCHAR), 4, '0') AS u,
       |         'e' || lpad(CAST(b.ck AS VARCHAR), 4, '0') AS v
       |       FROM pe a JOIN pe b ON a.i = b.i AND a.ck < b.ck),
       |nodes AS (SELECT 'e' || lpad(CAST(k AS VARCHAR), 4, '0') AS id
       |          FROM range(800) t(k))""".stripMargin

  /** DuckDB oracle for qkg17: 3 unrolled synchronous LPA rounds — votes
    * are integer counts, the winner is ROW_NUMBER over (cnt DESC, label
    * ASC) (the operator's exact tie order), voteless nodes keep their
    * label via COALESCE.
    */
  def labelPropOracle: String =
    s"""$lpaCte
       |SELECT id AS entity_id, label FROM l3 ORDER BY entity_id""".stripMargin

  /** The qkg17 LPA replay as a reusable CTE chain (through `l3`, with
    * `eg`/`nodes` in scope) — shared with the qkg25 contraction.
    */
  private def lpaCte: String = {
    val iters = (1 to 3).map { j =>
      s"""v$j AS (SELECT adj.id, l.label, COUNT(*) AS cnt
         |  FROM adj JOIN l${j - 1} l ON l.id = adj.nbr GROUP BY 1, 2),
         |w$j AS (SELECT id, label, ROW_NUMBER() OVER (
         |    PARTITION BY id ORDER BY cnt DESC, label) AS rn FROM v$j),
         |l$j AS (SELECT n.id, COALESCE(w.label, l.label) AS label
         |  FROM nodes n JOIN l${j - 1} l ON l.id = n.id
         |  LEFT JOIN (SELECT id, label FROM w$j WHERE rn = 1) w
         |    ON w.id = n.id)""".stripMargin
    }.mkString(",\n")
    s"""$comentionGraphCte,
       |adj AS (SELECT u AS id, v AS nbr FROM eg
       |        UNION ALL SELECT v, u FROM eg),
       |l0 AS (SELECT id, id AS label FROM nodes),
       |$iters""".stripMargin
  }

  /** Community supergraph — the co-mention graph CONTRACTED by its
    * qkg17 LPA labels: one row per (community, community) pair with the
    * inter-community edge count (the diagonal holds internal density) —
    * the graph-summarization step that lets a planner reason about a
    * 10⁹-node graph through its ~10⁴ communities. One labels join per
    * endpoint + a count keyed on the label pair (map-side combinable).
    */
  def qkg25CommunityGraph(spark: SparkSession, sfDir: String): DataFrame = {
    val (_, res) = pipelineFor(spark, sfDir)
    val nodes = res.canonical.select(col("canonical_id")).distinct()
    // one pair generation for both consumers (LPA + the contraction)
    val pairs = comentionPairs(res)
    val labels = graft.graph.Analytics
      .labelPropagation(pairs, nodes, iterations = 3)
      .select(col("id"), col("label"))
    val eg = pairs.distinct()
    eg.join(labels.select(col("id").as("u"), col("label").as("la")), "u")
      .join(labels.select(col("id").as("v"), col("label").as("lb")), "v")
      .select(least(col("la"), col("lb")).as("comm_a"),
        greatest(col("la"), col("lb")).as("comm_b"))
      .groupBy("comm_a", "comm_b").agg(count(lit(1)).as("n_edges"))
      .orderBy("comm_a", "comm_b")
  }

  /** DuckDB oracle for qkg25: the qkg17 LPA chain + the same two label
    * joins and least/greatest pair contraction.
    */
  def communityGraphOracle: String =
    s"""$lpaCte
       |SELECT LEAST(la.label, lb.label) AS comm_a,
       |  GREATEST(la.label, lb.label) AS comm_b, COUNT(*) AS n_edges
       |FROM eg JOIN l3 la ON la.id = eg.u JOIN l3 lb ON lb.id = eg.v
       |GROUP BY 1, 2 ORDER BY comm_a, comm_b""".stripMargin

  /** 3-core of the co-mention graph
    * ([[graft.graph.Analytics.kCore]], k = 3): the dense backbone of
    * the entity graph — iterative peeling to the unique fixpoint,
    * returning each surviving entity with its degree inside the core.
    * Integer-exact; the oracle unrolls more peel rounds than any
    * fixture needs (peeling is idempotent at the fixpoint, measured
    * depth ≤ 7 at sf0.1 vs 12 unrolled).
    */
  def qkg18KCore(spark: SparkSession, sfDir: String): DataFrame = {
    val (_, res) = pipelineFor(spark, sfDir)
    graft.graph.Analytics.kCore(comentionPairs(res), k = 3)
      .select(col("id").as("entity_id"), col("core_deg"))
      .orderBy("entity_id")
  }

  /** DuckDB oracle for qkg18: 12 unrolled peel rounds (degree filter ≥ 3
    * + edge restriction), then final in-core degrees. Every round's edge
    * set is MATERIALIZED: each e_j is referenced twice by round j+1
    * (degrees + filter), so DuckDB's default CTE inlining would expand
    * the chain into 2¹² copies of the whole mention pipeline (measured:
    * fd exhaustion at sf0.01); materialization keeps it linear.
    */
  def kCoreOracle: String = {
    val rounds = (1 to 12).map { j =>
      s"""d$j AS (SELECT id, COUNT(*) AS deg FROM (
         |    SELECT u AS id FROM e${j - 1} UNION ALL SELECT v FROM e${j - 1}) t
         |  GROUP BY 1),
         |k$j AS (SELECT id FROM d$j WHERE deg >= 3),
         |e$j AS MATERIALIZED (SELECT e.u, e.v FROM e${j - 1} e
         |  JOIN k$j ka ON ka.id = e.u JOIN k$j kb ON kb.id = e.v)""".stripMargin
    }.mkString(",\n")
    s"""$comentionGraphCte,
       |e0 AS MATERIALIZED (SELECT u, v FROM eg),
       |$rounds
       |SELECT id AS entity_id, COUNT(*) AS core_deg FROM (
       |  SELECT u AS id FROM e12 UNION ALL SELECT v FROM e12) t
       |GROUP BY 1 ORDER BY entity_id""".stripMargin
  }

  /** Cheapest-within-4-hops weighted distances from the qkg15 seed set
    * over the triple graph ([[graft.graph.Analytics.weightedSssp]]) —
    * the weighted companion to qkg15's hop counts. Edge weights are
    * deterministic integer arithmetic on the endpoint entity keys
    * (1 + (ks + ko) mod 7), so the whole computation is integer-exact
    * and the DuckDB oracle (a hop-bounded recursive path enumeration
    * with MIN(dist)) matches every row by construction.
    */
  def qkg19Sssp(spark: SparkSession, sfDir: String): DataFrame = {
    val (_, res) = pipelineFor(spark, sfDir)
    def ikey(c: Column): Column = substring(c, 2, 10).cast("long")
    val edges = res.triples.select(col("subj"), col("obj")).distinct()
      .select(col("subj").as("src"), col("obj").as("dst"),
        (pmod(ikey(col("subj")) + ikey(col("obj")), lit(7L)) + lit(1L)).as("w"))
    val nodes = res.canonical.select(col("canonical_id")).distinct()
    val seeds = nodes.filter(
      pmod(substring(col("canonical_id"), 2, 10).cast("int"), lit(50)) === 0)
    graft.graph.Analytics.weightedSssp(edges, nodes, seeds, maxEdges = 4)
      .select(col("id").as("entity_id"), col("dist"))
      .orderBy("entity_id")
  }

  /** DuckDB oracle for qkg19: enumerate every ≤ 4-edge path from the
    * seeds with the same arithmetic weights, MIN(dist) per node —
    * bounded-hop Bellman–Ford's defining identity, integer-exact.
    */
  def ssspOracle: String =
    s"""${tripleCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
       |e AS (SELECT DISTINCT 'e' || lpad(CAST(cs AS VARCHAR), 4, '0') AS src,
       |        'e' || lpad(CAST(co AS VARCHAR), 4, '0') AS dst,
       |        CAST((cs + co) % 7 + 1 AS BIGINT) AS w FROM cz),
       |seeds AS (SELECT 'e' || lpad(CAST(k AS VARCHAR), 4, '0') AS id
       |          FROM range(800) t(k) WHERE k % 50 = 0),
       |d(id, dist, hops) AS (
       |  SELECT id, CAST(0 AS BIGINT), 0 FROM seeds
       |  UNION
       |  SELECT e.dst, d.dist + e.w, d.hops + 1 FROM d JOIN e ON e.src = d.id
       |  WHERE d.hops < 4)
       |SELECT id AS entity_id, MIN(dist) AS dist FROM d
       |GROUP BY id ORDER BY entity_id""".stripMargin

  /** Deterministic DeepWalk corpus over the undirected triple graph
    * ([[graft.graph.Analytics.randomWalks]]): 4-step walks from every
    * 25th canonical entity, neighbor choice by the integer LCG over
    * (entity key, step) mod degree. The walk field is pure arithmetic
    * over the sorted adjacency, so the DuckDB oracle replays every hop
    * value-for-value.
    */
  def qkg20Walks(spark: SparkSession, sfDir: String): DataFrame = {
    val (_, res) = pipelineFor(spark, sfDir)
    val edges = res.triples.select(col("subj"), col("obj")).distinct()
    val nodes = res.canonical.select(col("canonical_id")).distinct()
      .select(col("canonical_id").as("id"),
        substring(col("canonical_id"), 2, 10).cast("long").as("key"))
    val seeds = nodes.filter(col("key") % 25 === 0).select("id")
    graft.graph.Analytics.randomWalks(edges, nodes, seeds, steps = 4)
      .select(col("walk_id"), col("step"), col("id").as("entity_id"))
      .orderBy("walk_id", "step")
  }

  /** DuckDB oracle for qkg20: ranked sorted adjacency + the same LCG
    * pick per unrolled step.
    */
  def walksOracle: String = {
    val steps = (1 to 4).map { t =>
      s"""s$t AS (SELECT s.walk_id, CAST($t AS BIGINT) AS step, rk.nbr AS id
         |  FROM s${t - 1} s JOIN rk ON rk.x = s.id
         |   AND rk.r = ((CAST(substr(s.id, 2) AS BIGINT) * 1103515245
         |                + $t * 12345) % 2147483648) % rk.deg)""".stripMargin
    }.mkString(",\n")
    s"""$tripleCte,
       |eg AS (SELECT DISTINCT 'e' || lpad(CAST(cs AS VARCHAR), 4, '0') AS u,
       |        'e' || lpad(CAST(co AS VARCHAR), 4, '0') AS v FROM cz),
       |und AS (SELECT DISTINCT LEAST(u, v) AS a, GREATEST(u, v) AS b
       |        FROM eg WHERE u <> v),
       |adj AS (SELECT a AS x, b AS nbr FROM und
       |        UNION ALL SELECT b AS x, a AS nbr FROM und),
       |rk AS (SELECT x, nbr,
       |        ROW_NUMBER() OVER (PARTITION BY x ORDER BY nbr) - 1 AS r,
       |        COUNT(*) OVER (PARTITION BY x) AS deg FROM adj),
       |seeds AS (SELECT 'e' || lpad(CAST(k AS VARCHAR), 4, '0') AS id
       |          FROM range(800) t(k) WHERE k % 25 = 0),
       |s0 AS (SELECT id AS walk_id, CAST(0 AS BIGINT) AS step, id FROM seeds),
       |$steps
       |SELECT walk_id, step, id AS entity_id FROM (
       |  SELECT * FROM s0 UNION ALL SELECT * FROM s1 UNION ALL
       |  SELECT * FROM s2 UNION ALL SELECT * FROM s3 UNION ALL
       |  SELECT * FROM s4)
       |ORDER BY walk_id, step""".stripMargin
  }

  /** Per-predicate power-of-two out-degree histogram over the canonical
    * triple graph ([[graft.graph.Analytics.degreeHistogram]]) — the
    * profiling row a planner reads before choosing broadcast vs salt.
    * Integer log-buckets, so every row value-hashes.
    */
  def qkg21DegreeHist(spark: SparkSession, sfDir: String): DataFrame = {
    val (_, res) = pipelineFor(spark, sfDir)
    val e = res.triples.select(col("pred"), col("subj"), col("obj")).distinct()
    graft.graph.Analytics.degreeHistogram(e.select(col("pred"), col("subj")))
      .select(col("label").as("pred"), col("bucket"),
        col("n_nodes"), col("n_edges"))
      .orderBy("pred", "bucket")
  }

  /** DuckDB oracle for qkg21: same distinct-triple degrees, log-bucket
    * via binary-digit count.
    */
  def degreeHistOracle: String =
    s"""$tripleCte,
       |e AS (SELECT DISTINCT p, cs, co FROM cz),
       |d AS (SELECT p, cs, COUNT(*) AS deg FROM e GROUP BY 1, 2)
       |SELECT $predCase AS pred,
       |  CAST(length(printf('%b', deg)) - 1 AS BIGINT) AS bucket,
       |  COUNT(*) AS n_nodes, CAST(SUM(deg) AS BIGINT) AS n_edges
       |FROM d GROUP BY 1, 2 ORDER BY pred, bucket""".stripMargin

  /** HyperBall neighborhood function over the triple graph
    * ([[graft.graph.Analytics.hyperBall]], 4 hops): every entity's
    * out-ball as engine-exact HLL register state (occupied-register
    * count + order-free register fingerprint). The oracle recomputes
    * every node's EXACT ≤4-hop reach set relationally and re-derives
    * the registers from it — proving the propagation converged to the
    * same sketch a from-scratch build over the true ball produces.
    */
  def qkg22HyperBall(spark: SparkSession, sfDir: String): DataFrame = {
    val (_, res) = pipelineFor(spark, sfDir)
    val edges = res.triples.select(col("subj"), col("obj")).distinct()
    val nodes = res.canonical.select(col("canonical_id")).distinct()
    graft.graph.Analytics.hyperBall(edges, nodes, maxHops = 4)
      .select(col("id").as("entity_id"), col("n_regs"), col("reg_fp"))
      .orderBy("entity_id")
  }

  /** DuckDB oracle for qkg22: exact ≤4-hop reach sets by recursive CTE,
    * then the qsk1 register arithmetic per (source, reached) pair,
    * per-bucket MAX, and the same order-free fingerprint.
    */
  def hyperBallOracle: String =
    s"""${tripleCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
       |e AS (SELECT DISTINCT 'e' || lpad(CAST(cs AS VARCHAR), 4, '0') AS src,
       |        'e' || lpad(CAST(co AS VARCHAR), 4, '0') AS dst FROM cz),
       |nodes AS (SELECT 'e' || lpad(CAST(k AS VARCHAR), 4, '0') AS id
       |          FROM range(800) t(k)),
       |reach(s, id, hops) AS (
       |  SELECT id, id, 0 FROM nodes
       |  UNION
       |  SELECT r.s, e.dst, r.hops + 1 FROM reach r JOIN e ON e.src = r.id
       |  WHERE r.hops < 4),
       |ball AS (SELECT DISTINCT s, id FROM reach),
       |h AS (SELECT s, md5(id) AS h FROM ball),
       |br AS (SELECT s,
       |        CAST(concat('0x', substring(h, 1, 2)) AS BIGINT) AS bucket,
       |        ltrim(substring(h, 3, 15), '0') AS tl FROM h),
       |rk AS (SELECT s, bucket,
       |        60 - length(tl) * 4 +
       |        (CASE substring(tl, 1, 1)
       |          WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
       |          WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1
       |          WHEN '7' THEN 1 ELSE 0 END) + 1 AS rank FROM br),
       |reg AS (SELECT s, bucket, MAX(rank) AS r FROM rk GROUP BY 1, 2)
       |SELECT s AS entity_id, COUNT(*) AS n_regs,
       |  CAST(SUM(CAST(1::BIGINT << CAST(61 - r AS INT) AS HUGEINT)
       |        * (bucket * 2654435761 % 1048576 + 1))
       |    % 4611686018427387904 AS BIGINT) AS reg_fp
       |FROM reg GROUP BY s ORDER BY entity_id""".stripMargin

  /** Approximate harmonic centrality over the triple graph via
    * HyperBall ([[graft.graph.Analytics.harmonicCentrality]], 4 hops) —
    * the paper's headline application: hop-delta ball sizes from the
    * raw HLL estimator, every float step engine-reproducible (exact
    * powers of two, bucket-ordered and hop-ordered folds).
    */
  def qkg24Harmonic(spark: SparkSession, sfDir: String): DataFrame = {
    val (_, res) = pipelineFor(spark, sfDir)
    val edges = res.triples.select(col("subj"), col("obj")).distinct()
    val nodes = res.canonical.select(col("canonical_id")).distinct()
    graft.graph.Analytics.harmonicCentrality(edges, nodes, maxHops = 4)
      .select(col("id").as("entity_id"), col("harmonic"), col("ball_est"))
      .orderBy("entity_id")
  }

  /** DuckDB oracle for qkg24: exact per-hop balls (min-hop recursive
    * CTE), qsk1 register arithmetic per hop, the raw estimator with the
    * identical literal association, LAG hop deltas, and both folds
    * (register sum in bucket order, harmonic sum in hop order) replayed
    * with the same 0.0-seeded association.
    */
  def harmonicOracle: String =
    s"""${tripleCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
       |e AS (SELECT DISTINCT 'e' || lpad(CAST(cs AS VARCHAR), 4, '0') AS src,
       |        'e' || lpad(CAST(co AS VARCHAR), 4, '0') AS dst FROM cz),
       |nodes AS (SELECT 'e' || lpad(CAST(k AS VARCHAR), 4, '0') AS id
       |          FROM range(800) t(k)),
       |reach(s, id, hops) AS (
       |  SELECT id, id, 0 FROM nodes
       |  UNION
       |  SELECT r.s, e.dst, r.hops + 1 FROM reach r JOIN e ON e.src = r.id
       |  WHERE r.hops < 4),
       |bd AS (SELECT s, id, MIN(hops) AS d FROM reach GROUP BY 1, 2),
       |hp AS (SELECT unnest(generate_series(0, 4)) AS t),
       |pr AS (SELECT hp.t, bd.s, md5(bd.id) AS h
       |       FROM bd CROSS JOIN hp WHERE bd.d <= hp.t),
       |br AS (SELECT t, s,
       |        CAST(concat('0x', substring(h, 1, 2)) AS BIGINT) AS bucket,
       |        ltrim(substring(h, 3, 15), '0') AS tl FROM pr),
       |rk AS (SELECT t, s, bucket,
       |        60 - length(tl) * 4 +
       |        (CASE substring(tl, 1, 1)
       |          WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
       |          WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1
       |          WHEN '7' THEN 1 ELSE 0 END) + 1 AS rank FROM br),
       |reg AS (SELECT t, s, bucket, MAX(rank) AS r FROM rk GROUP BY 1, 2, 3),
       |est AS (SELECT t, s,
       |        (CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE)
       |           + CAST(1.079 AS DOUBLE) / CAST(256.0 AS DOUBLE)))
       |         * CAST(65536.0 AS DOUBLE)
       |         / ((CAST(256.0 AS DOUBLE) - CAST(COUNT(*) AS DOUBLE))
       |            + list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |                list_transform(list_sort(list({'b': bucket, 'r': r})),
       |                  x -> power(CAST(2.0 AS DOUBLE),
       |                    -CAST(x.r AS DOUBLE)))),
       |                (a, b) -> a + b)) AS est
       |        FROM reg GROUP BY t, s),
       |ct AS (SELECT s, t, est,
       |        CASE WHEN t = 0 THEN CAST(0.0 AS DOUBLE)
       |             ELSE (est - LAG(est) OVER (PARTITION BY s ORDER BY t))
       |                  / CAST(t AS DOUBLE) END AS contrib
       |       FROM est)
       |SELECT s AS entity_id,
       |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |    list_transform(list_sort(list({'t': t, 'c': contrib})),
       |      x -> x.c)),
       |    (a, b) -> a + b) AS harmonic,
       |  MAX(CASE WHEN t = 4 THEN est END) AS ball_est
       |FROM ct GROUP BY s ORDER BY entity_id""".stripMargin

  /** Streaming incremental sync, end-to-end: the corpus is written out
    * as several parquet files, streamed back with AvailableNow +
    * maxFilesPerTrigger=1 (so the run takes MULTIPLE micro-batches), and
    * each batch is incrementally merged into a fresh graph via
    * StreamingSync.kgSink (foreachBatch → bucket-precise upserts). The
    * final canonical triple-edge set must equal the batch pipeline's —
    * the oracle recomputes it from doc_id arithmetic, so extraction,
    * linking, canonicalization AND the cross-batch merge are all on the
    * hook. Per-batch tags/props are excluded (they depend on which file
    * lands in which micro-batch).
    */
  def q29StreamingSync(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val tmp = graft.core.Graft.scratchDir("kgstream")
    Corpus.pages(spark, sfDir).toDF()
      .repartition(3).write.mode("overwrite").parquet(s"$tmp/pages")
    val pages = spark.readStream
      .schema("url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$tmp/pages")
      .as[graft.kg.Page]
    val q = graft.streaming.StreamingSync
      .kgSink(pages, Corpus.aliasRows, s"$tmp/graph", s"$tmp/cp")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val preds = Corpus.predicates.map(_._1)
    graft.merge.GraphTables.edges(spark, s"$tmp/graph").read()
      .filter(col("rel_label").isin(preds: _*))
      .select(col("src_id"), col("rel_label"), col("dst_id"))
      .orderBy("src_id", "rel_label", "dst_id")
  }

  /** q32: watermarked windowed counters with a full value oracle — the
    * streaming semantics the reference's batch statsd gauges can't
    * express, driven through controlled micro-batches so every
    * watermark-sensitive behavior is deterministic:
    *
    *  - append mode emits a (window, lang) count exactly once, after the
    *    watermark (max event time of PRIOR batches − 10 min) passes the
    *    window end;
    *  - a late row (event time below the current watermark) is DROPPED —
    *    the already-emitted window's count must not change (the oracle
    *    count for window 0 is 30/30, not 31/30);
    *  - windows the final watermark never passes are never emitted.
    *
    * Output is minutes-since-base so no timestamp rendering can differ
    * between engines; `base` is hour-aligned because Spark's tumbling
    * windows align to the epoch.
    *
    * Micro-batches are controlled through the PUBLIC file-source API
    * (the q29 pattern): each batch is one parquet file appended to the
    * watched directory between `processAllAvailable()` calls, so each
    * append is exactly one micro-batch and every watermark transition is
    * deterministic. (A previous version used
    * `execution.streaming.runtime.MemoryStream` — a private Spark
    * package, version-fragile in library code.)
    */
  def q32StreamWindows(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val baseSec = 1600000000L - (1600000000L % 3600L) // hour-aligned
    def page(i: Long): graft.kg.Page = graft.kg.Page(
      s"p$i", new java.sql.Timestamp((baseSec + i * 60L) * 1000L),
      Array.emptyByteArray, "", if (i % 2 == 0) "en" else "de")
    val srcDir = graft.core.Graft.scratchDir("q32src")
    val cp = graft.core.Graft.scratchDir("q32cp")
    // one file per append → one micro-batch per processAllAvailable()
    def addData(is: Seq[Long]): Unit =
      spark.createDataset(is.map(page)).toDF()
        .coalesce(1).write.mode("append").parquet(srcDir)
    // B1 is the initial file set: windows 0-3 fill; watermark still
    // -inf -> nothing emitted
    addData(0L until 240L)
    val in = spark.readStream
      .schema("url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING")
      .parquet(srcDir)
    val q = graft.streaming.StreamingSync
      .windowedPageCounts(in, "10 minutes", "1 hour")
      .writeStream.format("memory").queryName("q32win")
      .option("checkpointLocation", cp)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // B2: wm = 239-10 -> late i=45 DROPPED, windows 0-2 emitted;
      // window 4 fills; i=900 advances the future watermark
      addData(Seq(45L) ++ (240L until 300L) :+ 900L); q.processAllAvailable()
      // B3: wm = 890 -> windows 3,4 emitted
      addData(Seq(1000L)); q.processAllAvailable()
      // B4: wm = 990 -> window [900,960) emitted (count 1)
      addData(Seq(1100L)); q.processAllAvailable()
      // B5: wm = 1090 -> window [960,1020) emitted. After B5 a trailing
      // NO-DATA micro-batch (noDataMicroBatches, on by default) applies
      // the final wm = 1190, emitting [1080,1140); [1200,1260) never is.
      addData(Seq(1200L)); q.processAllAvailable()
    } finally {
      q.stop()
      // checkpoint state (offsets/commits/state store) is per-run litter
      rmTree(cp); rmTree(srcDir)
    }
    spark.table("q32win")
      .select(((unix_timestamp(col("window_start")) - baseSec) / 60L)
        .cast("bigint").as("window_min"),
        col("lang"), col("n_pages"))
      .orderBy("window_min", "lang")
  }

  /** Streaming gap-sessionization (StreamingSync.sessionCounts) under a
    * controlled file-source micro-batch harness, public API only. Events
    * are planted from doc_id arithmetic: bursts of 100 events 30 s apart
    * with an extra hour between bursts, 5 interleaved users — so per-user
    * intra-burst spacing (150 s) is far below the 30 min gap and
    * inter-burst spacing (3,750 s) far above it, giving exactly one
    * session per (user, burst) with start = first event, end = last
    * event + gap. A far-future sentinel event advances the watermark past
    * every real session's end (its own session is never emitted), so the
    * append-mode output is the complete planted session set, recomputed
    * closed-form by the oracle.
    */
  def q35StreamSessions(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val baseSec = 1600000000L
    val ev = spark.read.parquet(s"$sfDir/documents.parquet")
      .select((col("doc_id") % 5).cast("long").as("user_id"),
        (lit(baseSec) + col("doc_id") * 30L +
          floor(col("doc_id") / 100).cast("long") * 3600L)
          .cast("timestamp").as("ts"))
    val srcDir = graft.core.Graft.scratchDir("q35src")
    val cp = graft.core.Graft.scratchDir("q35cp")
    ev.coalesce(1).write.mode("append").parquet(srcDir)
    val in = spark.readStream.schema("user_id BIGINT, ts TIMESTAMP")
      .parquet(srcDir)
    val q = graft.streaming.StreamingSync
      .sessionCounts(in, "30 minutes", "10 minutes")
      .writeStream.format("memory").queryName("q35sess")
      .option("checkpointLocation", cp).outputMode("append").start()
    try {
      q.processAllAvailable()
      // sentinel micro-batch: watermark -> sentinel - 10 min, past every
      // planted session end; the trailing no-data batch applies it
      Seq((999L, new java.sql.Timestamp((baseSec + 100000000L) * 1000L)))
        .toDF("user_id", "ts").coalesce(1).write.mode("append").parquet(srcDir)
      q.processAllAvailable()
    } finally {
      q.stop()
      rmTree(cp); rmTree(srcDir)
    }
    spark.table("q35sess").select(col("user_id"),
      (unix_timestamp(col("session_start")) - baseSec).as("start_off"),
      (unix_timestamp(col("session_end")) - baseSec).as("end_off"),
      col("n_events"))
      .orderBy("user_id", "start_off")
  }

  /** Stream-static enrichment under the q32/q35 file-source harness:
    * the events stream broadcast-joined per micro-batch against the
    * customer dimension (user_id = c_custkey; unmatched users dropped —
    * inner-join semantics the oracle replays), then watermarked daily
    * counts per market segment. Two real micro-batches split at the
    * median event id prove cross-batch window accumulation; the
    * far-future sentinel (key -1, absent from the dimension — it is
    * dropped by the join yet still advances the source watermark)
    * flushes every real window.
    */
  def q36StreamEnrich(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_id").cast("long").as("event_id"),
        col("user_id").cast("long").as("user_id"), col("ts"))
    val dim = spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_custkey").cast("long").as("user_id"),
        col("c_mktsegment").as("segment"))
    val mid = ev.agg(max(col("event_id"))).head().getLong(0) / 2
    val srcDir = graft.core.Graft.scratchDir("q36src")
    val cp = graft.core.Graft.scratchDir("q36cp")
    def dump(d: org.apache.spark.sql.DataFrame): Unit =
      d.select(col("user_id"), col("ts"))
        .coalesce(1).write.mode("append").parquet(srcDir)
    dump(ev.filter(col("event_id") <= mid))
    val in = spark.readStream.schema("user_id BIGINT, ts TIMESTAMP")
      .parquet(srcDir)
    val q = graft.streaming.StreamingSync
      .enrichedWindowCounts(in, dim, "user_id", "segment",
        // 45 days > the whole event-table span: the oracle counts EVERY
        // event, so no second-batch row may ever be late — the split is
        // by event id, which nothing guarantees tracks event time
        "45 days", "1 day")
      .writeStream.format("memory").queryName("q36enrich")
      .option("checkpointLocation", cp).outputMode("append").start()
    try {
      q.processAllAvailable()
      dump(ev.filter(col("event_id") > mid))
      q.processAllAvailable()
      import spark.implicits._
      Seq((-1L, new java.sql.Timestamp(4102444800000L))) // 2100-01-01
        .toDF("user_id", "ts").coalesce(1).write.mode("append")
        .parquet(srcDir)
      q.processAllAvailable()
    } finally {
      q.stop()
      rmTree(cp); rmTree(srcDir)
    }
    spark.table("q36enrich")
      .select((unix_timestamp(col("window_start")) / 86400).cast("bigint")
        .as("day"), col("segment"), col("n_events"))
      .orderBy("day", "segment")
  }

  /** Bounded-state streaming dedup under the controlled micro-batch
    * harness: plants a timeline that exercises all three behaviors —
    * in-window duplicate DROPPED (key 0 at +5 min, state alive),
    * watermark advance EVICTS state (the +30 min event moves the
    * watermark past key 0's +10 min expiry), and a post-eviction
    * duplicate RE-EMITS (key 0 again at +25 min). Output = the exact
    * survivor set, closed-form in the oracle.
    */
  def q37StreamDedupTtl(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val baseSec = 1600000000L
    def ts(off: Long) = new java.sql.Timestamp((baseSec + off) * 1000L)
    val srcDir = graft.core.Graft.scratchDir("q37src")
    val cp = graft.core.Graft.scratchDir("q37cp")
    def add(rows: Seq[(Long, java.sql.Timestamp)]): Unit =
      rows.toDF("k", "ts").coalesce(1).write.mode("append").parquet(srcDir)
    add(Seq((0L, ts(0)), (1L, ts(60)), (2L, ts(120))))
    val in = spark.readStream.schema("k BIGINT, ts TIMESTAMP").parquet(srcDir)
    val q = graft.streaming.StreamingSync
      .dedupWithinWatermark(in, "k", "10 minutes")
      .writeStream.format("memory").queryName("q37dedup")
      .option("checkpointLocation", cp).outputMode("append").start()
    try {
      q.processAllAvailable()
      // wm still at 120-600: key 0's dup at +300 is DROPPED (state
      // alive); +1800 will advance the watermark to 1200 AFTER this
      // batch, evicting key 0's state (expiry 0+600)
      add(Seq((0L, ts(300)), (999L, ts(1800))))
      q.processAllAvailable()
      // wm = 1200: key 0 at +1500 finds no state -> RE-EMITTED
      add(Seq((0L, ts(1500))))
      q.processAllAvailable()
    } finally {
      q.stop()
      rmTree(cp); rmTree(srcDir)
    }
    spark.table("q37dedup")
      .select(col("k"), (unix_timestamp(col("ts")) - baseSec).as("off"))
      .orderBy("off", "k")
  }

  /** Stream-stream interval join under the controlled micro-batch
    * harness: view and purchase events arrive as two INDEPENDENT streams
    * (each split in half by event id, so matches routinely straddle
    * micro-batches and sides), joined on user within a 1-day event-time
    * horizon ([[graft.streaming.StreamingSync.streamIntervalJoin]]). The
    * 45-day watermark exceeds the table's whole span, so no pair is ever
    * late and the complete output equals the batch join the oracle
    * states.
    */
  def q38StreamJoin(spark: SparkSession, sfDir: String): DataFrame =
    streamJoinHarness(spark, sfDir, "q38join", "inner", sentinels = false)
      .select(col("view_id"), col("purchase_id"), col("user_id"),
        (unix_micros(col("pts")) - unix_micros(col("vts"))).as("gap_us"))
      .orderBy("view_id", "purchase_id")

  /** Shared q38/q41 scaffolding: views and purchases as two independent
    * file-source streams (each split in half by event id so matches
    * straddle batches AND sides), joined on user within a 1-day
    * event-time horizon; `sentinels` appends far-future rows to BOTH
    * streams after the real data (left-outer needs the global watermark
    * to close every real window before unmatched rows can emit).
    */
  private def streamJoinHarness(spark: SparkSession, sfDir: String,
                                queryName: String, joinType: String,
                                sentinels: Boolean): DataFrame = {
    import spark.implicits._
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_id").cast("long").as("event_id"),
        col("user_id").cast("long").as("user_id"), col("ts"),
        col("event_type"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"),
        col("ts").as("vts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user_id"), col("ts").as("pts"))
    val mid = ev.agg(max(col("event_id"))).head().getLong(0) / 2
    val vDir = graft.core.Graft.scratchDir(s"${queryName}v")
    val pDir = graft.core.Graft.scratchDir(s"${queryName}p")
    val cp = graft.core.Graft.scratchDir(s"${queryName}cp")
    def dump(d: DataFrame, dir: String): Unit =
      d.coalesce(1).write.mode("append").parquet(dir)
    dump(views.filter(col("view_id") <= mid), vDir)
    dump(purchases.filter(col("purchase_id") <= mid), pDir)
    val vIn = spark.readStream
      .schema("view_id BIGINT, user_id BIGINT, vts TIMESTAMP").parquet(vDir)
    val pIn = spark.readStream
      .schema("purchase_id BIGINT, p_user_id BIGINT, pts TIMESTAMP")
      .parquet(pDir)
    val q = graft.streaming.StreamingSync
      .streamIntervalJoin(vIn, pIn, "user_id", "p_user_id", "vts", "pts",
        "45 days", "1 day", joinType)
      .writeStream.format("memory").queryName(queryName)
      .option("checkpointLocation", cp).outputMode("append").start()
    try {
      q.processAllAvailable()
      dump(views.filter(col("view_id") > mid), vDir)
      dump(purchases.filter(col("purchase_id") > mid), pDir)
      q.processAllAvailable()
      if (sentinels) {
        val far = new java.sql.Timestamp(4102444800000L) // 2100-01-01
        Seq((-1L, -1L, far)).toDF("view_id", "user_id", "vts")
          .coalesce(1).write.mode("append").parquet(vDir)
        Seq((-2L, -1L, far)).toDF("purchase_id", "p_user_id", "pts")
          .coalesce(1).write.mode("append").parquet(pDir)
        q.processAllAvailable()
      }
    } finally {
      q.stop()
      rmTree(cp); rmTree(vDir); rmTree(pDir)
    }
    spark.table(queryName)
  }

  /** LEFT-OUTER stream-stream interval join: q38's shape with the
    * unmatched side kept — a view with no purchase in its 1-day horizon
    * emits with null purchase columns, and ONLY once the global
    * watermark (min of both streams) has closed its match window; the
    * far-future sentinel on BOTH streams is what pushes every real
    * window closed, making the complete output the deterministic batch
    * left join. Sentinels themselves are filtered from the result
    * (their own windows never close).
    */
  def q41StreamLeftJoin(spark: SparkSession, sfDir: String): DataFrame =
    streamJoinHarness(spark, sfDir, "q41join", "left_outer",
        sentinels = true)
      .filter(col("user_id") >= 0)
      .select(col("view_id"), col("user_id"), col("purchase_id"),
        (unix_micros(col("pts")) - unix_micros(col("vts"))).as("gap_us"))
      .orderBy("view_id", "purchase_id")

  /** Recursively delete a harness temp dir (checkpoint/source litter
    * from the controlled micro-batch queries).
    */
  private def rmTree(dir: String): Unit = {
    def rm(p: java.nio.file.Path): Unit = {
      if (Files.isDirectory(p)) {
        val s = Files.list(p)
        try s.iterator().asScala.foreach(rm) finally s.close()
      }
      Files.deleteIfExists(p): Unit
    }
    rm(java.nio.file.Paths.get(dir))
  }

  /** Oracle SQL fragments shared by the KG queries. */
  val predCase: String =
    "CASE p WHEN 0 THEN 'works_for' WHEN 1 THEN 'located_in' WHEN 2 THEN 'part_of' WHEN 3 THEN 'founded' ELSE 'acquired' END"

  val mentionCte: String =
    """WITH en AS (SELECT doc_id AS i FROM documents WHERE lang = 'en'),
      |m AS (
      |  SELECT i, i % 1000 AS k FROM en
      |  UNION ALL SELECT i, (7*i+3) % 1000 FROM en
      |  UNION ALL SELECT i, 0 FROM en WHERE i % 100 < 30
      |  UNION ALL SELECT i, i % 100 FROM en WHERE i % 10 = 7
      |  UNION ALL SELECT i, 100 + (i % 100) FROM en WHERE i % 10 = 3
      |  UNION ALL SELECT i, 100 + (i % 100) FROM en WHERE i % 10 = 9),
      |c AS (SELECT i, CASE WHEN k >= 800 THEN k - 800 ELSE k END AS ck FROM m)""".stripMargin

  val tripleCte: String =
    """WITH en AS (SELECT doc_id AS i FROM documents WHERE lang = 'en'),
      |t AS (SELECT i, i % 1000 AS s, (7*i+3) % 1000 AS o, i % 5 AS p FROM en),
      |cz AS (SELECT i, p,
      |  CASE WHEN s >= 800 THEN s - 800 ELSE s END AS cs,
      |  CASE WHEN o >= 800 THEN o - 800 ELSE o END AS co FROM t)""".stripMargin
}
