package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed analytics over the materialized KG — the algorithms a
  * graph warehouse runs AFTER sync (the reference ships its analysis as
  * post-sync jobs, `cartography/intel/analysis.py:12-42` + the JSON
  * jobs under `cartography/data/jobs/analysis/`); these are the two
  * classic whole-graph members of that family that its per-query
  * Cypher jobs cannot express.
  *
  * Both operators are declarative DataFrame plans (joins + aggregations
  * Catalyst can reorder/push), no RDDs, no driver-side iteration over
  * data — the only driver values are scalar counts.
  */
object Analytics {

  /** Per-node triangle counts of an undirected graph.
    *
    * Input: (u, v) pairs in ANY form — directed duplicates, self-loops
    * and repeated rows are normalized away first.
    *
    * Algorithm (the MapReduce-classic degree orientation, Suri &
    * Vassilvitskii "Counting Triangles and the Curse of the Last
    * Reducer", WWW'11): orient every undirected edge from its
    * lower-(degree, id) endpoint to the higher one. The orientation is
    * acyclic and every triangle has EXACTLY one node with two outgoing
    * oriented edges inside it, so enumerating (x < y) out-neighbor pairs
    * per source and closing them against the undirected edge set counts
    * each triangle once — and the out-degree of every node is bounded by
    * O(sqrt(m)), so a Zipf head entity (degree 10^6 in a 10^12-page KG)
    * generates at most ~sqrt(m) wedges instead of degree² ≈ 10^12. The
    * wedge self-join and the closing join both shuffle on edge keys;
    * nothing is ever collected to the driver.
    */
  /** Returns the per-node counts EAGERLY (computed and cached before
    * returning): the normalized edge set is referenced three times
    * (degrees, orientation, wedge closing) and the oriented set twice
    * (the wedge self-join), so both are cached for the one computation
    * and released before the method returns — a lazy plan would re-scan
    * the input once per reference.
    */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val cols = edges.columns
    require(cols.length == 2, s"expected 2 edge columns, got ${cols.mkString(",")}")
    val (cu, cv) = (col(cols(0)), col(cols(1)))
    // canonical undirected edge set: a < b, no self-loops, no duplicates
    val und = edges
      .select(least(cu, cv).as("a"), greatest(cu, cv).as("b"))
      .filter(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
      .distinct().persist()
    var oriented: DataFrame = null
    try {
      val deg = und.select(explode(array(col("a"), col("b"))).as("id"))
        .groupBy("id").agg(count(lit(1)).as("deg"))
      val withDeg = und
        .join(deg.select(col("id").as("a"), col("deg").as("da")), "a")
        .join(deg.select(col("id").as("b"), col("deg").as("db")), "b")
      val aFirst = col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b"))
      oriented = withDeg.select(
        when(aFirst, col("a")).otherwise(col("b")).as("src"),
        when(aFirst, col("b")).otherwise(col("a")).as("dst")).persist()
      // wedges: unordered out-neighbor pairs per source ...
      val wedges = oriented.select(col("src"), col("dst").as("x"))
        .join(oriented.select(col("src"), col("dst").as("y")), "src")
        .filter(col("x") < col("y"))
      // ... closed against the undirected edge set (x < y matches a < b)
      val tri = wedges.join(und,
        col("x") === col("a") && col("y") === col("b"))
        .select(col("src"), col("x"), col("y"))
      // localCheckpoint (eager), not persist(): the result materializes
      // while the inputs are cached, the lineage is cut, and the blocks
      // are freed by the ContextCleaner when the plan is GC'd — a
      // persist() here pinned one CacheManager entry per invocation for
      // the session lifetime unless every caller remembered to unpersist.
      // Trade-off: the blocks are unreplicated and the lineage is gone,
      // so an executor lost AFTER return makes the handle unrecoverable
      // (re-run the operator) instead of silently recomputing — on a
      // long-lived cluster, write the result to a table promptly
      tri.select(explode(array(col("src"), col("x"), col("y"))).as("id"))
        .groupBy("id").agg(count(lit(1)).as("n_triangles"))
        .localCheckpoint(true)
    } finally {
      und.unpersist()
      if (oriented != null) oriented.unpersist(): Unit
    }
  }

  /** Fixed-iteration PageRank over a directed graph, with REPRODUCIBLE
    * floating point: per node and iteration the incoming contributions
    * are folded left-to-right in contributor-id order
    * (`aggregate(sort_array(collect_list(struct(src, c))), 0.0, +)`), so
    * the result is bit-identical across partitionings, core counts and
    * engines — the property that lets the driver value-hash it against a
    * DuckDB oracle, and that makes a 1000-executor rerun byte-stable.
    * A plain `sum()` of doubles is partition-order-dependent and would
    * produce a different last bit on every shuffle layout.
    *
    * Definition (iteration i, damping d, n = |nodes|):
    *   rank_0(v)   = 1/n
    *   rank_i(v)   = (1-d)/n + d * Σ_{u→v} rank_{i-1}(u) / outdeg(u)
    * Dangling nodes (no out-edges) leak their mass — the common
    * fixed-iteration simplification; self-loops are kept as ordinary
    * edges. Exactly `iterations` rounds, no convergence test (a
    * convergence test on doubles would reintroduce order dependence).
    *
    * Scale shape: `edges` is distinct (src, dst); each iteration is one
    * broadcast-or-shuffle join of edges against the (node-space-sized,
    * corpus-independent) rank table plus one aggregation by dst — the
    * rank table never leaves the cluster. The per-dst sorted fold bounds
    * state by in-degree; for a Zipf head with 10^6 in-neighbors the
    * collect_list is ~16 MB on one reducer — acceptable; beyond that use
    * [[pageRankSalted]], whose two-level deterministic fold keeps the
    * same bit-reproducibility with per-reducer state bounded by
    * in-degree / saltBuckets.
    */
  /** Returns the rank table EAGERLY (computed and cached before
    * returning): the edge, node and out-degree tables are each
    * referenced once PER ITERATION, so they are cached for the one
    * computation and released before the method returns — a lazy plan
    * would re-scan the inputs `iterations` times (the static qkg10 plan
    * showed 20 parquet scans before this). The returned DataFrame is
    * node-space-sized, held as an eager localCheckpoint whose blocks the
    * ContextCleaner frees once the plan is unreachable — repeated
    * invocations in a long session accumulate nothing.
    */
  def pageRank(edges: DataFrame, nodes: DataFrame, iterations: Int,
               damping: Double): DataFrame =
    pageRankCore(edges, nodes, iterations, damping,
                 uniformBase(damping)) { contribs =>
      contribs.groupBy("id")
        .agg(sortedFold(collect_list(struct(col("u"), col("c")))).as("s"))
    }

  /** [[pageRank]] with a TWO-LEVEL deterministic fold — the adversarial-
    * scale variant for graphs whose Zipf head has extreme in-degree.
    *
    * The single-level sorted fold holds one node's entire incoming
    * contribution list on one reducer (~16 MB at 10^6 in-degree — fine;
    * GBs at 10^8 — not). Here contributors are first split by a
    * DETERMINISTIC salt of the source id (`saltOf`, an engine-portable
    * pure function — NOT a random salt): level 1 folds each (dst, salt)
    * bucket's contributions in contributor order, level 2 folds the
    * per-bucket partials in salt order. Both levels are sorted folds, so
    * the result is still BIT-identical across partitionings, core counts
    * and engines (qkg11 value-hashes all ranks against a DuckDB oracle
    * that replays the same two-level tree) — it differs from
    * [[pageRank]]'s single fold only by the fixed, reproducible grouping
    * of the additions. Per-reducer state drops from in-degree to
    * max(in-degree / buckets, buckets): with 2^10 salt buckets a
    * 10^8-in-degree head costs ~10^5 entries per level-1 reducer.
    * Size `saltOf`'s bucket count to ~sqrt(max expected in-degree).
    */
  def pageRankSalted(edges: DataFrame, nodes: DataFrame, iterations: Int,
                     damping: Double, saltOf: Column => Column): DataFrame =
    pageRankCore(edges, nodes, iterations, damping,
                 uniformBase(damping)) { contribs =>
      val partial = contribs
        .groupBy(col("id"), saltOf(col("u")).as("b"))
        .agg(sortedFold(collect_list(struct(col("u"), col("c")))).as("p"))
      partial.groupBy("id")
        .agg(aggregate(sort_array(collect_list(struct(col("b"), col("p")))),
          lit(0.0), (acc, x) => acc + x.getField("p")).as("s"))
    }

  /** Personalized PageRank: random walks TELEPORT back to the seed set
    * instead of the whole graph, so ranks measure relevance *to the
    * seeds* (the "related entities" primitive a KG serves for
    * recommendation/expansion queries):
    *
    *   rank_0(v) = 1/|S| if v ∈ S else 0
    *   rank_i(v) = (1-d)·[v ∈ S]/|S| + d · Σ_{u→v} rank_{i-1}(u)/outdeg(u)
    *
    * Same deterministic contributor-ordered fold as [[pageRank]]
    * (bit-identical across partitionings/engines — qkg13 value-hashes
    * every rank against a DuckDB oracle replaying the fold); dangling
    * nodes leak mass as in the fixed-iteration simplification. Seeds not
    * present in `nodes` are ignored. Scale shape identical to
    * [[pageRank]]: the rank table is node-space-sized, one join + one
    * aggregation per iteration.
    */
  def personalizedPageRank(edges: DataFrame, nodes: DataFrame,
                           seeds: DataFrame, iterations: Int,
                           damping: Double): DataFrame =
    pageRankCore(edges, nodes, iterations, damping, mkBase = { ids =>
      val seedFlag = seeds.toDF("id").distinct()
        .join(ids, Seq("id"), "left_semi").withColumn("_seed", lit(true))
      val s = seedFlag.count()
      require(s > 0, "personalizedPageRank needs at least one seed in the node set")
      ids.join(seedFlag, Seq("id"), "left")
        .select(col("id"),
          when(col("_seed").isNotNull, lit(1.0 / s))
            .otherwise(lit(0.0)).as("rank0"),
          when(col("_seed").isNotNull, lit((1.0 - damping) / s))
            .otherwise(lit(0.0)).as("base0"))
    }) { contribs =>
      contribs.groupBy("id")
        .agg(sortedFold(collect_list(struct(col("u"), col("c")))).as("s"))
    }

  /** HITS hubs-and-authorities — the fourth whole-graph analytics family
    * member (PageRank ranks global importance; HITS separates "points at
    * good things" from "is pointed at by good things", the classic
    * web-graph quality signal pair):
    *
    *   hub_0(v)  = 1
    *   auth_i(v) = ( Σ_{u→v} hub_{i-1}(u) )  / max_w auth-sum_i(w)
    *   hub_i(v)  = ( Σ_{v→w} auth_i(w) )     / max_w hub-sum_i(w)
    *
    * Normalization is by the MAX (a legitimate HITS stabilization,
    * e.g. NetworkX's per-iteration scaling) rather than the L1/L2 norm
    * deliberately: max over doubles is ORDER-FREE, so the only
    * order-sensitive arithmetic is the per-node contribution sum, which
    * uses the same contributor-sorted fold as [[pageRank]] — the whole
    * result is bit-identical across partitionings, core counts and
    * engines (qkg14 value-hashes every hub/auth double against a DuckDB
    * oracle replaying the iterations). An L1 norm would need a global
    * SUM, whose deterministic version costs a fold tree over all nodes
    * per iteration; the max costs one scalar aggregation.
    *
    * Scale shape: per iteration, two edge⋈rank joins + two per-node
    * sorted folds (reducer state bounded by in-/out-degree — the
    * [[pageRankSalted]] two-level trick applies identically if a Zipf
    * head demands it) + two scalar max aggregations. Each half-step is
    * materialized via eager localCheckpoint BEFORE its max is read —
    * the max action would otherwise recompute the whole iteration chain,
    * and the checkpoint also cuts the 2T-deep lineage. Requires at least
    * one edge between nodes (both maxes are then provably positive).
    * Returns (id, hub, auth), eagerly computed; inputs are cached for
    * the loop and released before returning, like [[pageRank]].
    */
  def hits(edges: DataFrame, nodes: DataFrame, iterations: Int): DataFrame = {
    require(iterations >= 1, "hits needs at least one iteration")
    val e = edges.toDF("src", "dst").distinct().persist()
    val ids = nodes.toDF("id").persist()
    try {
      // one half-step: fold rank (on `from`) into each `to` node, then
      // divide by the global max — contributions keyed by the far end
      def halfStep(rank: DataFrame, rc: String, from: String, to: String,
                   outCol: String): DataFrame = {
        val contribs = e
          .join(rank.select(col("id").as(from), col(rc)), from)
          .select(col(to).as("id"), col(from).as("u"), col(rc).as("c"))
        val summed = contribs.groupBy("id")
          .agg(sortedFold(collect_list(struct(col("u"), col("c")))).as("s"))
        val raw = ids.join(summed, Seq("id"), "left")
          .select(col("id"), coalesce(col("s"), lit(0.0)).as("s"))
          .localCheckpoint(true)
        val mxRow = raw.agg(max(col("s"))).head
        // max over zero rows is null — surface "empty node set" as the
        // precondition it is, not a NullPointerException at getDouble
        require(!mxRow.isNullAt(0), "hits needs a non-empty node set")
        val mx = mxRow.getDouble(0)
        require(mx > 0.0, "hits needs at least one edge between the nodes")
        raw.select(col("id"), (col("s") / mx).as(outCol))
      }
      var hub = ids.select(col("id"), lit(1.0).as("hub"))
      var auth: DataFrame = null
      var i = 0
      while (i < iterations) {
        auth = halfStep(hub, "hub", from = "src", to = "dst", outCol = "auth")
        hub = halfStep(auth, "auth", from = "dst", to = "src", outCol = "hub")
        i += 1
      }
      hub.join(auth, Seq("id"))
        .select(col("id"), col("hub"), col("auth"))
        .localCheckpoint(true)
    } finally {
      e.unpersist(); ids.unpersist(): Unit
    }
  }

  /** Minimum-hop BFS distances from a seed set over DIRECTED edges —
    * the exact-hop companion to [[personalizedPageRank]] ("which
    * entities are WITHIN k hops of these", where PPR answers "which are
    * most related"). Integer-exact, so bit-reproducibility is free: a
    * node's distance is the index of the first frontier that reaches
    * it, and level-synchronous expansion makes that the minimum hop
    * count by construction — no floating point, no fold ordering.
    *
    * Scale shape: per level, one frontier⋈edges shuffle (proportional
    * to the frontier's out-edges, never the graph) plus an anti-join
    * against the visited set; state is (id, dist) pairs, never edges.
    * `maxHops` bounds the loop; the loop also exits early on an empty
    * frontier. Each level's frontier and the growing visited set are
    * persisted (every later level re-references them) and released
    * before returning, like [[pageRankCore]].
    *
    * Returns (id, dist) for REACHED nodes only — unreachable entities
    * are absent, not sentinel-valued (the caller left-joins if it wants
    * a dense vector). Seeds outside the node set are ignored.
    */
  def bfsDistances(edges: DataFrame, nodes: DataFrame, seeds: DataFrame,
                   maxHops: Int): DataFrame = {
    require(maxHops >= 0, "maxHops must be >= 0")
    val e = edges.toDF("src", "dst").distinct().persist()
    val ids = nodes.toDF("id").persist()
    val retained = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    try {
      var visited = ids.join(seeds.toDF("id").distinct(), Seq("id"), "left_semi")
        .select(col("id"), lit(0).as("dist")).persist()
      retained += visited
      var frontier = visited
      var hop = 0
      var done = frontier.isEmpty
      while (hop < maxHops && !done) {
        hop += 1
        val next = frontier
          .join(e, frontier("id") === e("src"))
          .select(col("dst").as("id"), lit(hop).as("dist"))
          .distinct()
          .join(visited, Seq("id"), "left_anti")
          .join(ids, Seq("id"), "left_semi")
          .persist()
        retained += next
        if (next.isEmpty) done = true
        else {
          visited = visited.unionByName(next).persist()
          retained += visited
          frontier = next
        }
      }
      visited.localCheckpoint(true)
    } finally {
      e.unpersist(); ids.unpersist()
      retained.foreach(_.unpersist(): Unit)
    }
  }

  /** Entity relatedness by shared neighbors — integer-exact Jaccard
    * over UNDIRECTED neighbor sets, the classic link-prediction /
    * "entities like this one" primitive:
    *
    *   score(a,b) = |N(a)∩N(b)| · 10⁶ div |N(a)∪N(b)|
    *
    * for unordered pairs (a < b) sharing ≥ 1 counted neighbor. Integer
    * scaling instead of a double ratio for the same reason as
    * [[graft.text.TextStats.distinctiveTerms]]: div is bit-reproducible
    * across engines, so the driver can value-hash every score.
    *
    * `maxHubDegree` is SEMANTICS, not hidden truncation: a neighbor
    * whose degree exceeds it does not count toward the intersection (a
    * super-node connects everything to everything and carries no
    * relatedness signal — the stop-word of link prediction; discarding
    * super-hubs is standard there). It is also what makes the wedge
    * join survive a Zipf head: the fan-out through any shared neighbor
    * is capped at maxHubDegree², where an uncapped 10⁶-degree hub would
    * emit 10¹² wedges onto one key. Union sizes use FULL degrees, so
    * the score only ever under-states hub-mediated similarity.
    *
    * Scale shape: adjacency + degree aggregation (one shuffle), wedge
    * self-join keyed on the shared neighbor (bounded per key by the
    * cap), count-aggregate keyed on the pair. Nothing collects to the
    * driver.
    */
  def neighborJaccard(edges: DataFrame, maxHubDegree: Int): DataFrame = {
    require(maxHubDegree >= 1, "maxHubDegree must be >= 1")
    val cols = edges.columns
    require(cols.length == 2, s"expected 2 edge columns, got ${cols.mkString(",")}")
    val (cu, cv) = (col(cols(0)), col(cols(1)))
    val und = edges
      .select(least(cu, cv).as("a"), greatest(cu, cv).as("b"))
      .filter(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
      .distinct().persist()
    try {
      val adj = und.select(col("a").as("x"), col("b").as("nbr"))
        .unionByName(und.select(col("b").as("x"), col("a").as("nbr")))
      val deg = adj.groupBy("x").agg(count(lit(1)).as("d")).persist()
      try {
        val counted = adj.join(
          deg.filter(col("d") <= maxHubDegree).select(col("x").as("nbr")),
          Seq("nbr"), "left_semi")
        val wedges = counted.select(col("x").as("ea"), col("nbr"))
          .join(counted.select(col("x").as("eb"), col("nbr")), "nbr")
          .filter(col("ea") < col("eb"))
        val common = wedges.groupBy("ea", "eb")
          .agg(count(lit(1)).as("common_cnt"))
        common
          .join(deg.select(col("x").as("ea"), col("d").as("da")), "ea")
          .join(deg.select(col("x").as("eb"), col("d").as("db")), "eb")
          .select(col("ea").as("entity_a"), col("eb").as("entity_b"),
            col("common_cnt"),
            (col("da") + col("db") - col("common_cnt")).as("union_cnt"),
            expr("common_cnt * CAST(1000000 AS BIGINT) div " +
              "(da + db - common_cnt)").as("score"))
          .localCheckpoint(true)
      } finally deg.unpersist(): Unit
    } finally und.unpersist(): Unit
  }

  /** Hop-bounded Katz influence — Σ_{l=1..3} β^l · (# directed paths of
    * length l from v): the truncated Katz centrality (the bound is the
    * semantics — no spectral-radius convergence precondition, and path
    * counts stay integer-exact). With a DYADIC β (0.5 by default) every
    * β^l·count product is exact IEEE and the three-term sum adds in
    * fixed l order, so the score is bit-reproducible cross-engine.
    * Path counts compose by two join-aggregates (c_{l+1}(v) = Σ over
    * out-edges of c_l(u)) — map-side combinable, a Zipf-head's
    * contributions pre-reduce; counts must stay under 2⁶³ (documented:
    * at web scale use more hops only with the salted-fold discipline).
    */
  def katzBounded(edges: DataFrame, nodes: DataFrame,
                  beta: Double = 0.5): DataFrame = {
    val e = edges.toDF("src", "dst").distinct()
    val c1 = e.groupBy("src").agg(count(lit(1)).as("c1"))
    val c2 = e.join(c1.withColumnRenamed("src", "dst"), "dst")
      .groupBy("src").agg(sum("c1").as("c2"))
    val c3 = e.join(c2.withColumnRenamed("src", "dst"), "dst")
      .groupBy("src").agg(sum("c2").as("c3"))
    nodes.toDF("id")
      .join(c1.withColumnRenamed("src", "id"), Seq("id"), "left")
      .join(c2.withColumnRenamed("src", "id"), Seq("id"), "left")
      .join(c3.withColumnRenamed("src", "id"), Seq("id"), "left")
      .select(col("id"),
        coalesce(col("c1"), lit(0L)).as("c1"),
        coalesce(col("c2"), lit(0L)).as("c2"),
        coalesce(col("c3"), lit(0L)).as("c3"))
      .withColumn("katz",
        lit(beta) * col("c1") + lit(beta * beta) * col("c2") +
          lit(beta * beta * beta) * col("c3"))
  }

  /** Square (4-cycle) counts per diagonal pair — the motif one step up
    * from triangles: a pair (a, b) sharing c common neighbors closes
    * C(c, 2) squares through them (each square is counted once per
    * diagonal; halve the global sum for distinct squares). Squares are
    * the bipartite-core signal — high square density with few
    * triangles marks two-mode structure (pages⇄entities, spam farms).
    * Same capped wedge machinery as [[neighborJaccard]] (a shared
    * neighbor above `maxHubDegree` mediates nothing), integer-exact.
    */
  def squareCounts(edges: DataFrame, maxHubDegree: Int): DataFrame =
    neighborJaccard(edges, maxHubDegree)
      .filter(col("common_cnt") >= 2)
      .select(col("entity_a"), col("entity_b"), col("common_cnt"),
        expr("common_cnt * (common_cnt - 1) div 2").as("n_squares"))

  /** Adamic–Adar link prediction ("Friends and neighbors on the Web",
    * Adamic & Adar 2003) over the same undirected neighbor sets as
    * [[neighborJaccard]]: score(a,b) = Σ_z 1/ln(deg z) over common
    * neighbors z — rarer shared neighbors count more, the damping that
    * makes AA beat raw common-neighbor counts on Zipf graphs. Same
    * PROVEN hub-degree cap as neighborJaccard: a super-hub neighbor
    * (deg > `maxHubDegree`) contributes to no pair, which is both the
    * stop-word semantics AA's 1/ln only soft-approximates and the bound
    * that keeps the wedge join's per-key fan-out at cap².
    *
    * Bit-reproducible doubles: deg is an exact integer, the log is the
    * engine-portable [[graft.functions.ExactMath.lnOfInt]], each
    * contribution is one IEEE division, and the per-pair sum folds in
    * sorted neighbor order (the qkg10 discipline). A shared neighbor of
    * a distinct pair has deg ≥ 2, so ln ≥ ln 2 > 0 — no division
    * hazard.
    *
    * Scale shape: one adjacency/degree shuffle, wedge self-join keyed on
    * the (capped) shared neighbor, then a per-pair sorted fold whose
    * state is the pair's common-neighbor list — bounded by the smaller
    * endpoint degree (the price of bit-stability; the salted two-level
    * pre-fold of [[pageRankSalted]] is the documented escape if a pair
    * of mega-hubs ever dominates).
    */
  def adamicAdar(edges: DataFrame, maxHubDegree: Int): DataFrame = {
    require(maxHubDegree >= 1, "maxHubDegree must be >= 1")
    val cols = edges.columns
    require(cols.length == 2, s"expected 2 edge columns, got ${cols.mkString(",")}")
    val (cu, cv) = (col(cols(0)), col(cols(1)))
    val und = edges
      .select(least(cu, cv).as("a"), greatest(cu, cv).as("b"))
      .filter(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
      .distinct().persist()
    try {
      val adj = und.select(col("a").as("x"), col("b").as("nbr"))
        .unionByName(und.select(col("b").as("x"), col("a").as("nbr")))
      val deg = adj.groupBy("x").agg(count(lit(1)).as("d"))
      // d >= 2: a degree-1 node can never mediate a wedge, and its
      // ln(1) = 0 would otherwise be a division hazard under ANSI mode
      val capped = deg.filter(col("d") >= 2 && col("d") <= maxHubDegree)
        .select(col("x").as("nbr"),
          (lit(1.0) / graft.functions.ExactMath.lnOfInt(col("d")))
            .as("invln"))
      val byNbr = adj.join(capped, "nbr")
      val wedges = byNbr.select(col("x").as("ea"), col("nbr"), col("invln"))
        .join(byNbr.select(col("x").as("eb"), col("nbr")), "nbr")
        .filter(col("ea") < col("eb"))
      wedges.groupBy("ea", "eb")
        .agg(count(lit(1)).as("common_cnt"),
          aggregate(array_sort(collect_list(struct(col("nbr"),
              col("invln")))), lit(0.0),
            (acc, x) => acc + x.getField("invln")).as("aa_score"))
        .select(col("ea").as("entity_a"), col("eb").as("entity_b"),
          col("common_cnt"), col("aa_score"))
        .localCheckpoint(true)
    } finally und.unpersist(): Unit
  }

  /** Synchronous label propagation (Raghavan et al. 2007, "Near linear
    * time algorithm to detect community structures") made DETERMINISTIC:
    * labels start as the node's own id; each iteration every node with
    * ≥ 1 neighbor adopts the label most frequent among its neighbors,
    * ties broken by the SMALLEST label (the published algorithm breaks
    * ties randomly — the fixed tie order plus synchronous updates is
    * what makes the result engine-reproducible and value-hashable);
    * isolated nodes keep their label. Exactly `iterations` rounds, no
    * convergence test (synchronous LPA can 2-cycle on bipartite
    * structures, so a fixed budget is also the standard termination).
    * Integer counts and string mins only — no floating point anywhere.
    *
    * Communities differ from [[graft.link.ConnectedComponents]]: CC
    * gives reachability classes; LPA splits a component along its dense
    * cores (a chain of two cliques is one component, two LPA labels).
    *
    * Scale shape: per iteration one adjacency⋈labels join (shuffles the
    * EDGE table on the neighbor key) + a (node, label) count + a
    * per-node argmax window. The window partitions by node id —
    * per-reducer state is one node's DISTINCT incoming label set, which
    * is bounded by its degree; a Zipf-head hub is one heavy partition of
    * label-count rows (already pre-reduced by the count aggregation, so
    * it holds distinct labels, not raw neighbors).
    */
  def labelPropagation(edges: DataFrame, nodes: DataFrame,
                       iterations: Int): DataFrame = {
    require(iterations >= 0, "iterations must be >= 0")
    val cols = edges.columns
    require(cols.length == 2, s"expected 2 edge columns, got ${cols.mkString(",")}")
    val (cu, cv) = (col(cols(0)), col(cols(1)))
    val und = edges
      .select(least(cu, cv).as("a"), greatest(cu, cv).as("b"))
      .filter(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
      .distinct()
    val adj = und.select(col("a").as("id"), col("b").as("nbr"))
      .unionByName(und.select(col("b").as("id"), col("a").as("nbr")))
      .persist()
    val ids = nodes.toDF("id").persist()
    try {
      // each round is CHECKPOINTED eagerly (node-space-sized, tiny):
      // the label table is referenced TWICE per round (votes + the
      // keep-own-label fallback), so an unbroken lineage doubles the
      // logical plan per iteration — by iteration i the analyzer holds
      // 2^i copies of the upstream plan (measured OOM in kCore's 3×
      // analog at sf0.1 before the same fix). The blocks are freed by
      // the ContextCleaner when each superseded plan is GC'd.
      var labels = ids.select(col("id"), col("id").as("label"))
        .localCheckpoint(true)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("id").orderBy(col("cnt").desc, col("label").asc)
      var i = 0
      while (i < iterations) {
        val votes = adj
          .join(labels.select(col("id").as("nbr"), col("label")), "nbr")
          .groupBy("id", "label").agg(count(lit(1)).as("cnt"))
        val winner = votes.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("id"), col("label").as("new_label"))
        labels = labels.join(winner, Seq("id"), "left")
          .select(col("id"),
            coalesce(col("new_label"), col("label")).as("label"))
          .localCheckpoint(true)
        i += 1
      }
      labels
    } finally {
      adj.unpersist(); ids.unpersist(): Unit
    }
  }

  /** k-core of an undirected graph (Seidman 1983): the maximal subgraph
    * in which every node has degree ≥ k, computed by iterative peeling —
    * drop nodes under degree k, recompute degrees, repeat to fixpoint.
    * Returns (id, core_deg) for the surviving nodes, where core_deg is
    * the node's degree WITHIN the core (≥ k by construction); nodes
    * outside the core are absent. Integer-exact, and the fixpoint is
    * unique regardless of peel order, so the result is engine-
    * reproducible by construction (the oracle unrolls more peel rounds
    * than the fixture needs — peeling is idempotent at the fixpoint, so
    * over-unrolling is harmless).
    *
    * Scale shape: each round is one degree aggregation over the current
    * edge set + two semi-joins filtering edges to surviving endpoints —
    * all shuffles keyed on node/edge ids, nothing driver-side except
    * the per-round edge COUNT driving the convergence test. Round count
    * is the graph's degeneracy-peel depth (tens at web scale — each
    * round strictly shrinks the edge set or terminates). Each round's
    * edge set is persisted for its two consumers (degrees + next round)
    * and released when the round ends.
    */
  def kCore(edges: DataFrame, k: Int, maxRounds: Int = 64): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val cols = edges.columns
    require(cols.length == 2, s"expected 2 edge columns, got ${cols.mkString(",")}")
    val (cu, cv) = (col(cols(0)), col(cols(1)))
    // every round's edge set is CHECKPOINTED eagerly, not persist()ed:
    // each round references the previous edge set THREE times (degree
    // aggregation + both semi-join sides), so an unbroken lineage grows
    // the logical plan 3^rounds — at 7 peel rounds over a KG-pipeline
    // input the plan STRING alone OOMed an 8 GiB driver (persist caches
    // data but never truncates the logical plan). The checkpoint cuts
    // lineage per round; blocks are freed by the ContextCleaner when
    // each superseded round's plan is GC'd.
    var cur = edges
      .select(least(cu, cv).as("a"), greatest(cu, cv).as("b"))
      .filter(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
      .distinct().localCheckpoint(true)
    var nEdges = cur.count()
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      val deg = degrees(cur)
      val keep = deg.filter(col("deg") >= k).select(col("id"))
      val next = cur
        .join(keep.select(col("id").as("a")), Seq("a"), "left_semi")
        .join(keep.select(col("id").as("b")), Seq("b"), "left_semi")
        .select("a", "b").localCheckpoint(true)
      val n = next.count()
      if (n == nEdges) converged = true
      else {
        cur = next
        nEdges = n
      }
      round += 1
    }
    require(converged || nEdges == 0L,
      s"kCore did not converge within $maxRounds rounds")
    degrees(cur).select(col("id"), col("deg").as("core_deg"))
      .localCheckpoint(true)
  }

  /** Hop-bounded weighted shortest paths (distributed Bellman–Ford,
    * delta relaxation): dist(v) = minimum total weight over directed
    * paths from any seed using AT MOST `maxEdges` edges. The hop bound
    * is the semantics, not a truncation apology — it is what makes the
    * result well-defined on weighted cyclic graphs without a negative-
    * cycle precondition, it is the standard "within k hops, cheapest"
    * neighborhood query, and it makes the value integer-exact when the
    * weights are integers (no floating point anywhere for long
    * weights, so a SQL oracle enumerating ≤ k-edge paths matches every
    * row). Edges are (src, dst, w).
    *
    * Delta relaxation: round r relaxes only the frontier of nodes whose
    * distance IMPROVED in round r−1 (a node that reached its ≤(r−1)-edge
    * minimum at round j < r already propagated that value at round
    * j+1), so by induction dist after round r is the exact ≤ r-edge
    * minimum — the textbook invariant, with work per round proportional
    * to the frontier's out-edges, never the graph.
    *
    * Scale shape: per round one frontier⋈edges shuffle + a per-dst MIN
    * aggregation (map-side combinable — a Zipf-head dst receiving 10⁶
    * candidate distances pre-reduces to one row per map task) + one
    * improvement anti-check against the running table. State is (id,
    * dist) pairs. Rounds are persisted for their two consumers and
    * released before returning, like [[bfsDistances]].
    *
    * Returns (id, dist) for REACHED nodes only; seeds outside the node
    * set are ignored; edges to ids outside the node set are dropped.
    */
  def weightedSssp(edges: DataFrame, nodes: DataFrame, seeds: DataFrame,
                   maxEdges: Int): DataFrame = {
    require(maxEdges >= 0, "maxEdges must be >= 0")
    val cols = edges.columns
    require(cols.length == 3, s"expected (src, dst, w), got ${cols.mkString(",")}")
    val e = edges.toDF("src", "dst", "w").distinct().persist()
    val ids = nodes.toDF("id").persist()
    val retained = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    try {
      var dist = ids.join(seeds.toDF("id").distinct(), Seq("id"), "left_semi")
        .select(col("id"), lit(0L).as("dist")).persist()
      retained += dist
      var frontier = dist
      var round = 0
      var done = frontier.isEmpty
      while (round < maxEdges && !done) {
        round += 1
        val cand = frontier
          .join(e, frontier("id") === e("src"))
          .select(col("dst").as("id"), (col("dist") + col("w")).as("dist"))
          .join(ids, Seq("id"), "left_semi")
          .groupBy("id").agg(min("dist").as("dist"))
        val improved = cand
          .join(dist.select(col("id"), col("dist").as("old")), Seq("id"), "left")
          .filter(col("old").isNull || col("dist") < col("old"))
          .select("id", "dist").persist()
        retained += improved
        if (improved.isEmpty) done = true
        else {
          dist = dist.unionByName(improved)
            .groupBy("id").agg(min("dist").as("dist")).persist()
          retained += dist
          frontier = improved
        }
      }
      dist.localCheckpoint(true)
    } finally {
      e.unpersist(); ids.unpersist()
      retained.foreach(_.unpersist(): Unit)
    }
  }

  /** Deterministic DeepWalk-style random walks over the UNDIRECTED
    * graph (Perozzi et al. 2014 — the walk-corpus generator for graph
    * embeddings, made engine-reproducible): one walk per seed, exactly
    * `steps` steps (shorter if it hits an isolated node), where the
    * step-t choice from a node is neighbor RANK
    *
    *   pick = (key·1103515245 + t·12345) mod 2³¹ mod degree
    *
    * over the node's neighbors sorted ascending (rank 0-based). `nodes`
    * supplies the integer `key` per node id; the LCG runs on exact
    * int64 arithmetic (caller must keep keys < 2³¹ so the product
    * stays < 2⁶³), so the ENTIRE walk corpus is recomputable in ANSI
    * SQL — the same trade as [[graft.ann.Knn.planeComp]]: a seeded
    * arithmetic generator instead of JVM Random buys a full value
    * oracle. Walks depend only on (key, step, sorted adjacency), so a
    * walk from node X is the same whether X is a seed or mid-walk hop —
    * the corpus is a deterministic sub-sample of one global walk field.
    *
    * Scale shape: neighbor ranks are one row_number window partitioned
    * by node (per-node state = its adjacency list; an extreme hub is
    * one heavy-but-streamable sort partition, same class as
    * [[labelPropagation]]'s vote window); each step then shuffles the
    * WALK FRONTIER (#seeds rows, not the graph) against the ranked
    * adjacency on (node, rank) — join fan-out is exactly 1 per walk, so
    * a 10⁶-degree hub visited by 10⁴ walks costs 10⁴ joined rows, never
    * degree × walks. Per-step state is checkpointed (tiny) to keep the
    * unrolled lineage flat.
    *
    * Returns (walk_id, step, id): step 0 is the seed itself.
    */
  def randomWalks(edges: DataFrame, nodes: DataFrame, seeds: DataFrame,
                  steps: Int): DataFrame = {
    require(steps >= 0, "steps must be >= 0")
    val cols = edges.columns
    require(cols.length == 2, s"expected 2 edge columns, got ${cols.mkString(",")}")
    val (cu, cv) = (col(cols(0)), col(cols(1)))
    val und = edges
      .select(least(cu, cv).as("a"), greatest(cu, cv).as("b"))
      .filter(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
      .distinct()
    val adj = und.select(col("a").as("x"), col("b").as("nbr"))
      .unionByName(und.select(col("b").as("x"), col("a").as("nbr")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("x").orderBy("nbr")
    val ranked = adj
      .withColumn("r", row_number().over(w).cast("long") - 1L)
      .persist()
    // degree joined BEFORE the adjacency probe so `pick` is a plain
    // column and the ranked join is a pure (x, r) equi-join — computing
    // pick inside the join condition would fan every walk out to its
    // node's FULL degree and filter after, exactly the hub blowup this
    // operator is shaped to avoid
    val degs = adj.groupBy("x").agg(count(lit(1)).as("deg")).persist()
    val keys = nodes.toDF("id", "key").persist()
    try {
      var state = keys
        .join(seeds.toDF("id").distinct(), Seq("id"), "left_semi")
        .select(col("id").as("walk_id"), lit(0L).as("step"), col("id"))
        .localCheckpoint(true)
      val out = scala.collection.mutable.ArrayBuffer(state)
      var t = 1L
      while (t <= steps && !state.isEmpty) {
        val stepped = state
          .join(keys, "id")
          .join(degs.select(col("x").as("id"), col("deg")), "id")
          .withColumn("pick",
            pmod(col("key") * lit(1103515245L) + lit(t) * lit(12345L),
              lit(2147483648L)) % col("deg"))
        state = stepped
          .join(ranked, col("x") === col("id") && col("r") === col("pick"))
          .select(col("walk_id"), lit(t).as("step"), col("nbr").as("id"))
          .localCheckpoint(true)
        out += state
        t += 1
      }
      out.reduce(_ unionByName _)
    } finally {
      ranked.unpersist(); degs.unpersist(); keys.unpersist(): Unit
    }
  }

  /** HyperBall (Boldi & Vigna 2013, "In-Core Computation of Geometric
    * Centralities with HyperBall"): the per-node neighborhood function —
    * for EVERY node, an HLL sketch of its ≤ `maxHops` out-ball — via
    * register propagation instead of per-source BFS. Exact multi-source
    * BFS from all nodes is O(n·m) state (10²⁴ at web scale); HyperBall
    * keeps ≤ 256 register rows per node and grows balls by the
    * identity ball_t(v) = ball_{t-1}(v) ∪ ⋃_{(v,u)∈E} ball_{t-1}(u),
    * which for HLL state is just an elementwise register MAX — the one
    * sketch operation that is associative, commutative and idempotent,
    * so the per-round aggregation pre-reduces map-side and a Zipf-head
    * node's registers combine in O(log) tree depth instead of
    * collecting its in-neighborhood.
    *
    * Registers use EXACTLY [[graft.sketch.Sketches.hllBucketRank]]'s
    * integer arithmetic, so the final state is engine-reproducible:
    * the oracle recomputes every node's exact ≤ k ball relationally and
    * re-derives the registers — sketch STATE is proven, while the
    * cardinality estimate stays a documented derivation
    * ([[graft.sketch.Sketches.hllEstimate]]) exactly as qsk1 treats it.
    *
    * Returns one row per node: `n_regs` (occupied registers) and
    * `reg_fp`, the ORDER-FREE register fingerprint
    * Σ 2^(61−rank)·f(bucket) mod 2⁶² with f folding the bucket id in —
    * commutative integer arithmetic (the [[graft.text.TextStats
    * .invertedIndex]] trick), so no per-node sorted fold is needed.
    *
    * Scale shape: per round one edges⋈registers shuffle (fan-out
    * in-degree × that node's occupied registers, pre-reduced map-side
    * by the MAX) + an (id, bucket) max-aggregate; per-round state is
    * localCheckpoint-ed (each round's table feeds the next union).
    */
  def hyperBall(edges: DataFrame, nodes: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 0, "maxHops must be >= 0")
    val e = edges.toDF("src", "dst").distinct().persist()
    val ids = nodes.toDF("id").persist()
    try {
      val reg = ballRounds(e, ids, maxHops).last
      reg.groupBy("id").agg(
        count(lit(1)).as("n_regs"),
        expr("""cast(sum(cast(shiftleft(cast(1 as bigint),
               |  cast(61 - r as int)) as decimal(38,0))
               |  * (bucket * 2654435761 % 1048576 + 1))
               | % 4611686018427387904 as bigint)""".stripMargin).as("reg_fp"))
    } finally {
      e.unpersist(); ids.unpersist(): Unit
    }
  }

  /** The HyperBall register iteration shared by [[hyperBall]] and
    * [[harmonicCentrality]]: element (id, bucket, r) tables for hops
    * 0..maxHops, each localCheckpoint-ed (safe to consume after the
    * caller unpersists its inputs).
    */
  private def ballRounds(e: DataFrame, ids: DataFrame,
                         maxHops: Int): IndexedSeq[DataFrame] = {
    var reg = ids
      .select(col("id"), graft.sketch.Sketches.hllBucketRank(col("id")).as("br"))
      .select(col("id"), col("br.bucket").as("bucket"), col("br.rank").as("r"))
      .localCheckpoint(true)
    val out = IndexedSeq.newBuilder[DataFrame]
    out += reg
    var t = 0
    while (t < maxHops) {
      val contrib = e
        .join(reg.select(col("id").as("dst"), col("bucket"), col("r")), "dst")
        .select(col("src").as("id"), col("bucket"), col("r"))
      reg = reg.unionByName(contrib)
        .groupBy("id", "bucket").agg(max("r").as("r"))
        .localCheckpoint(true)
      out += reg
      t += 1
    }
    out.result()
  }

  /** Approximate harmonic centrality via HyperBall (Boldi & Vigna 2013
    * — the paper's headline application): H(v) = Σ_{t=1..k}
    * (|ball_t(v)| − |ball_{t−1}(v)|) / t with ball sizes read from the
    * per-hop HLL registers through the RAW estimator α·m²/(Σ 2^(−M_j))
    * — no bias/linear-counting corrections, declared semantics, because
    * raw keeps every float step engine-reproducible: 2^(−r) is an exact
    * power of two, the register sum folds in bucket order, hop deltas
    * and the final harmonic sum fold in hop order, and α is spelled as
    * the same literal expression in both engines. Registers are
    * monotone under the MAX propagation, so hop deltas are never
    * negative.
    *
    * Exact all-pairs harmonic centrality is O(n·m); this is the
    * sketch that made centrality feasible on web graphs — per-node
    * state is ≤ 256 registers per hop, and every aggregation
    * pre-reduces map-side (the [[hyperBall]] argument).
    *
    * Returns (id, harmonic, ball_est) — ball_est is the raw-estimated
    * ≤ maxHops ball size.
    */
  def harmonicCentrality(edges: DataFrame, nodes: DataFrame,
                         maxHops: Int): DataFrame = {
    require(maxHops >= 1, "maxHops must be >= 1")
    val e = edges.toDF("src", "dst").distinct().persist()
    val ids = nodes.toDF("id").persist()
    try {
      val estCol = graft.sketch.Sketches
        .rawEstimateCol(col("bucket"), col("r"))
      val ests = ballRounds(e, ids, maxHops).zipWithIndex.map {
        case (reg, t) =>
          reg.groupBy("id").agg(estCol.as("est"))
            .select(col("id"), lit(t).cast("int").as("hop"), col("est"))
      }.reduce(_ unionByName _)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("id").orderBy("hop")
      ests
        .withColumn("contrib",
          when(col("hop") === 0, lit(0.0))
            .otherwise((col("est") - lag(col("est"), 1).over(w)) /
              col("hop").cast("double")))
        .groupBy("id").agg(
          aggregate(array_sort(collect_list(struct(col("hop"),
              col("contrib")))), lit(0.0),
            (acc, x) => acc + x.getField("contrib")).as("harmonic"),
          max(when(col("hop") === maxHops, col("est"))).as("ball_est"))
    } finally {
      e.unpersist(); ids.unpersist(): Unit
    }
  }

  /** Power-of-two out-degree histogram per edge label — the profiling
    * summary a graph warehouse keeps per relationship type (the judge of
    * "is this label broadcast-able", "which label hides the Zipf head
    * that needs salting"): for each (label, bucket = ⌊log₂ deg⌋) the
    * node count and total edge count. The log-bucket is computed with
    * INTEGER arithmetic (binary-digit count − 1, never a float log that
    * can land on either side of an exact power), so every row
    * value-hashes cross-engine.
    *
    * Scale shape: one (label, src)-keyed count (map-side combinable) +
    * one (label, bucket) count over the degree table — output is
    * ≤ labels × 64 rows regardless of graph size.
    */
  def degreeHistogram(edges: DataFrame): DataFrame = {
    val cols = edges.columns
    require(cols.length == 2, s"expected (label, src), got ${cols.mkString(",")}")
    val deg = edges.toDF("label", "src")
      .groupBy("label", "src").agg(count(lit(1)).as("deg"))
    deg.select(col("label"),
        (length(bin(col("deg"))) - 1).cast("long").as("bucket"), col("deg"))
      .groupBy("label", "bucket")
      .agg(count(lit(1)).as("n_nodes"), sum(col("deg")).as("n_edges"))
  }

  /** Per-node degree of a canonical (a < b) undirected edge set. */
  private def degrees(und: DataFrame): DataFrame =
    und.select(explode(array(col("a"), col("b"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("deg"))

  /** Uniform teleport base: rank_0 = 1/n, base = (1-d)/n for every node. */
  private def uniformBase(damping: Double)(ids: DataFrame): DataFrame = {
    val n = ids.count()
    require(n > 0, "pageRank needs a non-empty node set")
    ids.select(col("id"), lit(1.0 / n).as("rank0"),
      lit((1.0 - damping) / n).as("base0"))
  }

  /** Left-to-right fold of a struct array's LAST field in array-sort
    * order — the deterministic summation both PageRank variants build on.
    */
  private def sortedFold(uc: Column): Column =
    aggregate(sort_array(uc), lit(0.0), (acc, x) => acc + x.getField("c"))

  /** Shared PageRank driver for every variant (uniform, salted fold,
    * personalized). `mkBase` receives the persisted node table and
    * returns one `(id, rank0, base0)` row per node — the initial rank
    * and the per-node teleport term (the uniform default is constant
    * `1/n` / `(1-d)/n`; personalization concentrates both on the seed
    * set); the table is persisted for the loop, since every iteration
    * references it. `sumContribs` receives the per-iteration
    * contribution table (id = dst, u = contributor, c = rank/outdeg) and
    * must return one (id, s) row per receiving node with a DETERMINISTIC
    * summation (the fold-tree variants differ only here).
    */
  private def pageRankCore(edges: DataFrame, nodes: DataFrame,
                           iterations: Int, damping: Double,
                           mkBase: DataFrame => DataFrame)
                          (sumContribs: DataFrame => DataFrame): DataFrame = {
    require(iterations >= 0 && damping >= 0.0 && damping <= 1.0)
    val e = edges.toDF("src", "dst").distinct().persist()
    val ids = nodes.toDF("id").persist()
    var outdeg: DataFrame = null
    var baseTbl: DataFrame = null
    try {
      baseTbl = mkBase(ids).persist()
      outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg")).persist()
      var ranks = baseTbl.select(col("id"), col("rank0").as("rank"))
      var i = 0
      while (i < iterations) {
        val contribs = e
          .join(ranks.select(col("id").as("src"), col("rank")), "src")
          .join(outdeg, "src")
          .select(col("dst").as("id"), col("src").as("u"),
            (col("rank") / col("outdeg")).as("c"))
        val summed = sumContribs(contribs)
        ranks = baseTbl
          .join(summed, Seq("id"), "left")
          .select(col("id"),
            (col("base0") + lit(damping) * coalesce(col("s"), lit(0.0))).as("rank"))
        i += 1
      }
      // eager localCheckpoint — see triangleCounts: materialized while
      // the inputs are cached, blocks auto-freed when the plan is GC'd;
      // same trade-off: unrecoverable after a post-return executor loss
      ranks.localCheckpoint(true)
    } finally {
      e.unpersist(); ids.unpersist()
      if (outdeg != null) outdeg.unpersist()
      if (baseTbl != null) baseTbl.unpersist(): Unit
    }
  }
}
