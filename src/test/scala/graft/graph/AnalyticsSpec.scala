package graft.graph

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

class AnalyticsSpec extends SparkSpecBase {
  import spark.implicits._

  test("triangleCounts: K4 plus a dangling path, messy input normalized") {
    // K4 over a,b,c,d (4 triangles; every node in C(3,2) = 3) plus a
    // triangle-free tail d-e-f. Input is deliberately messy: duplicate
    // rows, both orientations of the same edge, and a self-loop.
    val edges = Seq(
      ("a", "b"), ("b", "a"), ("a", "c"), ("a", "d"), ("b", "c"),
      ("b", "d"), ("c", "d"), ("c", "d"), ("d", "e"), ("e", "f"),
      ("e", "e")).toDF("u", "v")
    val got = Analytics.triangleCounts(edges)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L))
  }

  test("triangleCounts: hub wheel — every spoke pair on the rim closes") {
    // wheel: hub h connected to r0..r5, rim cycle r0-r1-...-r5-r0
    // triangles = 6 (one per rim edge); hub in all 6, each rim node in 2
    val rim = (0 until 6).map(i => (s"r$i", s"r${(i + 1) % 6}"))
    val spokes = (0 until 6).map(i => ("h", s"r$i"))
    val got = Analytics.triangleCounts((rim ++ spokes).toDF("u", "v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("h") === 6L)
    (0 until 6).foreach(i => assert(got(s"r$i") === 2L))
  }

  /** Local reference PageRank with the same sorted-fold summation. */
  private def refRanks(edges: Seq[(String, String)], nodes: Seq[String],
                       iters: Int, d: Double): Map[String, Double] = {
    val e = edges.distinct
    val out = e.groupBy(_._1).view.mapValues(_.size).toMap
    val n = nodes.size
    var r = nodes.map(_ -> 1.0 / n).toMap
    (1 to iters).foreach { _ =>
      val in = e.groupBy(_._2)
      r = nodes.map { v =>
        val s = in.getOrElse(v, Nil).map(_._1).sorted
          .foldLeft(0.0)((acc, u) => acc + r(u) / out(u))
        v -> ((1.0 - d) / n + d * s)
      }.toMap
    }
    r
  }

  test("pageRank: matches the sorted-fold reference bit-for-bit") {
    val nodes = Seq("a", "b", "c", "d")
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
      ("d", "c")) // d is a source; nothing points at d -> base rank
    val got = Analytics.pageRank(edges.toDF("src", "dst"),
      nodes.toDF("id"), iterations = 3, damping = 0.85)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val want = refRanks(edges, nodes, 3, 0.85)
    nodes.foreach { v =>
      assert(java.lang.Double.doubleToLongBits(got(v)) ===
        java.lang.Double.doubleToLongBits(want(v)), s"node $v")
    }
    // nothing links to d -> exactly the base term
    assert(got("d") === (1.0 - 0.85) / 4)
  }

  test("pageRank: bit-stable across partitionings") {
    val nodes = (0 until 50).map(i => s"n$i")
    val edges = (0 until 200).map(i => (s"n${i % 50}", s"n${(i * 7 + 3) % 50}"))
    def run(parts: Int): Array[(String, Double)] =
      Analytics.pageRank(edges.toDF("src", "dst").repartition(parts),
        nodes.toDF("id"), iterations = 2, damping = 0.85)
        .orderBy("id").collect().map(r => (r.getString(0), r.getDouble(1)))
    val a = run(2)
    val b = run(7)
    a.zip(b).foreach { case ((ida, ra), (idb, rb)) =>
      assert(ida === idb)
      assert(java.lang.Double.doubleToLongBits(ra) ===
        java.lang.Double.doubleToLongBits(rb), s"node $ida")
    }
  }

  test("triangleCounts: random graphs match a brute-force O(n^3) count (40 cases)") {
    val rnd = new scala.util.Random(42)
    (0 until 40).foreach { k =>
      val n = 4 + rnd.nextInt(12)
      val density = 0.15 + rnd.nextDouble() * 0.5
      val und = (for {
        a <- 0 until n; b <- (a + 1) until n
        if rnd.nextDouble() < density
      } yield (s"v%02d".format(a), s"v%02d".format(b))).toVector
      if (und.nonEmpty) {
        // brute force: check every (a, b, c) against the edge set
        val es = und.toSet
        def adj(x: String, y: String) =
          es(if (x < y) (x, y) else (y, x))
        val ids = (0 until n).map(i => s"v%02d".format(i))
        val want = (for {
          ai <- ids.indices; bi <- (ai + 1) until n; ci <- (bi + 1) until n
          if adj(ids(ai), ids(bi)) && adj(ids(bi), ids(ci)) && adj(ids(ai), ids(ci))
        } yield Seq(ids(ai), ids(bi), ids(ci))).flatten
          .groupBy(identity).view.mapValues(_.size.toLong).toMap
        // feed the operator a messy doubled/reversed copy of the edges
        val messy = und ++ und.map(_.swap)
        val got = Analytics.triangleCounts(messy.toDF("u", "v"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        assert(got === want, s"case $k (n=$n, m=${und.size})")
      }
    }
  }

  test("pageRank: random graphs match the sorted-fold reference bit-for-bit (15 cases)") {
    val rnd = new scala.util.Random(7)
    (0 until 15).foreach { k =>
      val n = 3 + rnd.nextInt(10)
      val ids = (0 until n).map(i => s"v%02d".format(i))
      val edges = (for {
        a <- ids; b <- ids
        if a != b && rnd.nextDouble() < 0.3
      } yield (a, b)).toVector
      val iters = 1 + rnd.nextInt(4)
      val got = Analytics.pageRank(edges.toDF("src", "dst"), ids.toDF("id"),
        iters, 0.85)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val want = refRanks(edges, ids, iters, 0.85)
      ids.foreach { v =>
        assert(java.lang.Double.doubleToLongBits(got(v)) ===
          java.lang.Double.doubleToLongBits(want(v)),
          s"case $k node $v (n=$n, m=${edges.size}, iters=$iters)")
      }
    }
  }

  /** Local reference personalized PageRank — seed-restricted teleport,
    * same sorted-fold summation.
    */
  private def refPpr(edges: Seq[(String, String)], nodes: Seq[String],
                     seeds: Set[String], iters: Int, d: Double): Map[String, Double] = {
    val e = edges.distinct
    val out = e.groupBy(_._1).view.mapValues(_.size).toMap
    val s = nodes.count(seeds)
    var r = nodes.map(v => v -> (if (seeds(v)) 1.0 / s else 0.0)).toMap
    (1 to iters).foreach { _ =>
      val in = e.groupBy(_._2)
      r = nodes.map { v =>
        val sum = in.getOrElse(v, Nil).map(_._1).sorted
          .foldLeft(0.0)((acc, u) => acc + r(u) / out(u))
        v -> ((if (seeds(v)) (1.0 - d) / s else 0.0) + d * sum)
      }.toMap
    }
    r
  }

  test("personalizedPageRank: random seeded graphs match the reference bit-for-bit (10 cases)") {
    val rnd = new scala.util.Random(11)
    (0 until 10).foreach { k =>
      val n = 4 + rnd.nextInt(9)
      val ids = (0 until n).map(i => s"v%02d".format(i))
      val edges = (for {
        a <- ids; b <- ids
        if a != b && rnd.nextDouble() < 0.3
      } yield (a, b)).toVector
      val seeds0 = ids.filter(_ => rnd.nextDouble() < 0.4).toSet
      val seeds = if (seeds0.isEmpty) Set(ids.head) else seeds0
      val iters = 1 + rnd.nextInt(4)
      val got = Analytics.personalizedPageRank(edges.toDF("src", "dst"),
        ids.toDF("id"), seeds.toSeq.toDF("id"), iters, 0.85)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val want = refPpr(edges, ids, seeds, iters, 0.85)
      ids.foreach { v =>
        assert(java.lang.Double.doubleToLongBits(got(v)) ===
          java.lang.Double.doubleToLongBits(want(v)),
          s"case $k node $v (n=$n, seeds=${seeds.size}, iters=$iters)")
      }
      // teleport is seed-restricted: an unreachable non-seed has rank 0
      val unreachable = ids.filterNot(seeds)
        .filterNot(v => edges.exists(_._2 == v))
      unreachable.foreach(v => assert(got(v) === 0.0, s"case $k: $v"))
    }
  }

  /** Local reference for the TWO-LEVEL salted fold: per receiver, fold
    * each salt bucket's contributors in id order, then fold the bucket
    * partials in bucket order — both with 0.0 init, like the operator.
    */
  private def refRanksSalted(edges: Seq[(String, String)], nodes: Seq[String],
                             iters: Int, d: Double,
                             saltFn: String => Int): Map[String, Double] = {
    val e = edges.distinct
    val out = e.groupBy(_._1).view.mapValues(_.size).toMap
    val n = nodes.size
    var r = nodes.map(_ -> 1.0 / n).toMap
    (1 to iters).foreach { _ =>
      val in = e.groupBy(_._2)
      r = nodes.map { v =>
        val s = in.getOrElse(v, Nil).map(_._1)
          .groupBy(saltFn).toSeq.sortBy(_._1)
          .map { case (_, us) =>
            us.sorted.foldLeft(0.0)((acc, u) => acc + r(u) / out(u)) }
          .foldLeft(0.0)(_ + _)
        v -> ((1.0 - d) / n + d * s)
      }.toMap
    }
    r
  }

  /** vNN ids → numeric suffix mod B, expressed identically as a Column
    * (what pageRankSalted gets) and as a Scala function (the reference).
    */
  private def saltCol(b: Int): org.apache.spark.sql.Column => org.apache.spark.sql.Column =
    u => pmod(substring(u, 2, 10).cast("int"), lit(b))
  private def saltFn(b: Int): String => Int = id => id.drop(1).toInt % b

  test("pageRankSalted: random graphs match the two-level reference bit-for-bit (12 cases)") {
    val rnd = new scala.util.Random(19)
    (0 until 12).foreach { k =>
      val n = 3 + rnd.nextInt(10)
      val ids = (0 until n).map(i => s"v%02d".format(i))
      val edges = (for {
        a <- ids; b <- ids
        if a != b && rnd.nextDouble() < 0.35
      } yield (a, b)).toVector
      val iters = 1 + rnd.nextInt(3)
      val buckets = 1 + rnd.nextInt(4)
      val got = Analytics.pageRankSalted(edges.toDF("src", "dst"),
        ids.toDF("id"), iters, 0.85, saltCol(buckets))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val want = refRanksSalted(edges, ids, iters, 0.85, saltFn(buckets))
      ids.foreach { v =>
        assert(java.lang.Double.doubleToLongBits(got(v)) ===
          java.lang.Double.doubleToLongBits(want(v)),
          s"case $k node $v (n=$n, m=${edges.size}, iters=$iters, b=$buckets)")
      }
    }
  }

  test("pageRankSalted with ONE bucket degenerates to pageRank bit-for-bit") {
    // one salt bucket -> level 1 folds every contributor in id order and
    // level 2 folds a single partial with 0.0 init (0.0 + p == p), so the
    // two operators must agree to the last bit
    val nodes = (0 until 40).map(i => s"v%02d".format(i))
    val edges = (0 until 160).map(i => (s"v%02d".format(i % 40), s"v%02d".format((i * 11 + 5) % 40)))
    val plain = Analytics.pageRank(edges.toDF("src", "dst"),
      nodes.toDF("id"), iterations = 3, damping = 0.85)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val salted = Analytics.pageRankSalted(edges.toDF("src", "dst"),
      nodes.toDF("id"), iterations = 3, damping = 0.85, saltCol(1))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    nodes.foreach { v =>
      assert(java.lang.Double.doubleToLongBits(plain(v)) ===
        java.lang.Double.doubleToLongBits(salted(v)), s"node $v")
    }
  }

  test("pageRankSalted: bit-stable across partitionings") {
    val nodes = (0 until 50).map(i => s"v%02d".format(i))
    val edges = (0 until 200).map(i => (s"v%02d".format(i % 50), s"v%02d".format((i * 7 + 3) % 50)))
    def run(parts: Int): Array[(String, Double)] =
      Analytics.pageRankSalted(edges.toDF("src", "dst").repartition(parts),
        nodes.toDF("id"), iterations = 2, damping = 0.85, saltCol(8))
        .orderBy("id").collect().map(r => (r.getString(0), r.getDouble(1)))
    val a = run(2)
    val b = run(7)
    a.zip(b).foreach { case ((ida, ra), (idb, rb)) =>
      assert(ida === idb)
      assert(java.lang.Double.doubleToLongBits(ra) ===
        java.lang.Double.doubleToLongBits(rb), s"node $ida")
    }
  }

  test("co-mention cap drops over-cap pages whole, keeps under-cap pages untouched") {
    val pageEnt = (
      (1 to 5).map(k => ("spam", s"e$k")) ++     // 5 distinct entities
        (1 to 3).map(k => ("ok", s"e$k"))        // 3 distinct entities
    ).toDF("url", "canonical_id")
    val kept = graft.operators.KgOps.capComentionPages(pageEnt, 4)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(kept === (1 to 3).map(k => ("ok", s"e$k")).toSet)
    // cap at 5 keeps everything
    assert(graft.operators.KgOps.capComentionPages(pageEnt, 5).count() === 8L)
    // the verdict counts DISTINCT entities, not rows: 300 mentions of 3
    // entities is still an under-cap page
    val repeated = (1 to 300).map(k => ("noisy", s"e${k % 3}"))
      .toDF("url", "canonical_id")
    assert(graft.operators.KgOps.capComentionPages(repeated, 4).count() === 300L)
  }

  /** Local reference HITS — max-normalized half-steps, contributor-sorted
    * fold summation, mirroring [[Analytics.hits]] exactly.
    */
  private def refHits(edges: Seq[(String, String)], nodes: Seq[String],
                      iters: Int): Map[String, (Double, Double)] = {
    val e = edges.distinct
    val in = e.groupBy(_._2)
    val out = e.groupBy(_._1)
    var hub = nodes.map(_ -> 1.0).toMap
    var auth = Map.empty[String, Double]
    (1 to iters).foreach { _ =>
      val h0 = hub
      val aRaw = nodes.map { v =>
        v -> in.getOrElse(v, Nil).map(_._1).sorted
          .foldLeft(0.0)((acc, u) => acc + h0(u))
      }.toMap
      val amax = aRaw.values.max
      auth = aRaw.view.mapValues(_ / amax).toMap
      val hRaw = nodes.map { v =>
        v -> out.getOrElse(v, Nil).map(_._2).sorted
          .foldLeft(0.0)((acc, w) => acc + auth(w))
      }.toMap
      val hmax = hRaw.values.max
      hub = hRaw.view.mapValues(_ / hmax).toMap
    }
    nodes.map(v => v -> (hub(v), auth(v))).toMap
  }

  test("hits: random graphs match the max-normalized reference bit-for-bit (12 cases)") {
    val rnd = new scala.util.Random(23)
    (0 until 12).foreach { k =>
      val n = 3 + rnd.nextInt(10)
      val ids = (0 until n).map(i => s"v%02d".format(i))
      val edges = (for {
        a <- ids; b <- ids
        if a != b && rnd.nextDouble() < 0.3
      } yield (a, b)).toVector
      if (edges.nonEmpty) {
        val iters = 1 + rnd.nextInt(3)
        val got = Analytics.hits(edges.toDF("src", "dst"), ids.toDF("id"), iters)
          .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
          .toMap
        val want = refHits(edges, ids, iters)
        ids.foreach { v =>
          assert(java.lang.Double.doubleToLongBits(got(v)._1) ===
            java.lang.Double.doubleToLongBits(want(v)._1),
            s"case $k node $v hub (n=$n, m=${edges.size}, iters=$iters)")
          assert(java.lang.Double.doubleToLongBits(got(v)._2) ===
            java.lang.Double.doubleToLongBits(want(v)._2),
            s"case $k node $v auth (n=$n, m=${edges.size}, iters=$iters)")
        }
      }
    }
  }

  /** Local reference BFS: level-synchronous, same node-set filtering. */
  private def refBfs(edges: Seq[(String, String)], nodes: Seq[String],
                     seeds: Seq[String], maxHops: Int): Map[String, Int] = {
    val adj = edges.distinct.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val inSet = nodes.toSet
    var dist = seeds.filter(inSet).distinct.map(_ -> 0).toMap
    var frontier = dist.keySet
    var hop = 0
    while (hop < maxHops && frontier.nonEmpty) {
      hop += 1
      val next = frontier.flatMap(u => adj.getOrElse(u, Nil))
        .filter(inSet).diff(dist.keySet)
      dist ++= next.map(_ -> hop)
      frontier = next
    }
    dist
  }

  test("bfsDistances: random digraphs match the reference BFS exactly (10 cases); off-set seeds ignored; hop cap respected") {
    val rnd = new scala.util.Random(77)
    (1 to 10).foreach { k =>
      val n = 2 + rnd.nextInt(20)
      val nodes = (0 until n).map(i => s"n$i")
      val edges = (0 until n * 2).map(_ =>
        (s"n${rnd.nextInt(n)}", s"n${rnd.nextInt(n)}"))
      // at least one real seed, plus one OUTSIDE the node set (ignored)
      val seeds = (nodes.filter(_ => rnd.nextBoolean()).take(3) :+
        nodes.head) :+ "zz_not_a_node"
      val maxHops = rnd.nextInt(5)
      val got = Analytics.bfsDistances(edges.toDF("src", "dst"),
          nodes.toDF("id"), seeds.toDF("id"), maxHops)
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      assert(got === refBfs(edges, nodes, seeds, maxHops), s"case $k")
      assert(got.values.forall(_ <= maxHops), s"case $k hop cap")
    }
  }

  test("bfsDistances: empty seed set yields an empty result, not an error") {
    val got = Analytics.bfsDistances(Seq(("a", "b")).toDF("src", "dst"),
      Seq("a", "b").toDF("id"), Seq.empty[String].toDF("id"), maxHops = 3)
    assert(got.count() === 0)
  }

  /** Local reference shared-neighbor Jaccard with the hub-degree cap. */
  private def refJaccard(edges: Seq[(String, String)], cap: Int)
      : Set[(String, String, Long, Long, Long)] = {
    val und = edges.map { case (u, v) => if (u < v) (u, v) else (v, u) }
      .filter(p => p._1 != p._2).distinct
    val adj = (und ++ und.map(_.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val deg = adj.view.mapValues(_.size).toMap
    (for {
      (a, na) <- adj.toSeq
      (b, nb) <- adj.toSeq
      if a < b
      common = na.intersect(nb).count(x => deg(x) <= cap)
      if common > 0
      union = deg(a) + deg(b) - common
    } yield (a, b, common.toLong, union.toLong,
        common.toLong * 1000000L / union)).toSet
  }

  test("neighborJaccard: random graphs match the brute-force reference (8 cases)") {
    val rnd = new scala.util.Random(31)
    (1 to 8).foreach { k =>
      val n = 3 + rnd.nextInt(15)
      val edges = (0 until n * 3).map(_ =>
        (s"n${rnd.nextInt(n)}", s"n${rnd.nextInt(n)}"))
      val cap = 1 + rnd.nextInt(6)
      val got = Analytics.neighborJaccard(edges.toDF("u", "v"), cap)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      assert(got === refJaccard(edges, cap), s"case $k (cap $cap)")
    }
  }

  test("neighborJaccard: a shared neighbor above the hub cap stops counting — hub-only pairs vanish, mixed pairs keep their non-hub overlap") {
    // h is a 12-degree super-hub; x,y share BOTH h and the normal node m
    // and are directly linked; s0..s9 share ONLY h
    val edges = (0 until 10).map(i => ("h", s"s$i")) ++
      Seq(("x", "h"), ("y", "h"), ("x", "m"), ("y", "m"), ("x", "y"))
    val got = Analytics.neighborJaccard(edges.toDF("u", "v"), maxHubDegree = 8)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    // no pair mediated ONLY by h survives
    assert(!got.keys.exists { case (a, b) => a.startsWith("s") && b.startsWith("s") })
    // x,y keep exactly their m overlap (h excluded), never the hub one
    assert(got(("x", "y")) === 1L)
    // parity with the reference under the same cap
    val want = refJaccard(edges, 8).map(t => (t._1, t._2) -> t._3).toMap
    assert(got === want)
  }

  /** Local reference Adamic–Adar: capped common neighbors, 1/lnOfIntRef
    * contributions folded in sorted neighbor order (0.0 seed — the same
    * association as the Column aggregate).
    */
  private def refAdamicAdar(edges: Seq[(String, String)], cap: Int)
      : Map[(String, String), (Long, Double)] = {
    val und = edges.map { case (u, v) => if (u < v) (u, v) else (v, u) }
      .filter(p => p._1 != p._2).distinct
    val adj = (und ++ und.map(_.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val deg = adj.view.mapValues(_.size).toMap
    (for {
      (a, na) <- adj.toSeq
      (b, nb) <- adj.toSeq
      if a < b
      common = na.intersect(nb).filter(x => deg(x) <= cap).toSeq.sorted
      if common.nonEmpty
    } yield (a, b) -> (common.size.toLong,
        common.foldLeft(0.0)((acc, z) =>
          acc + 1.0 / graft.functions.ExactMath.lnOfIntRef(deg(z).toLong))))
      .toMap
  }

  test("adamicAdar: random graphs match the brute-force reference bit-for-bit (8 cases)") {
    val rnd = new scala.util.Random(47)
    (1 to 8).foreach { k =>
      val n = 3 + rnd.nextInt(15)
      val edges = (0 until n * 3).map(_ =>
        (s"n${rnd.nextInt(n)}", s"n${rnd.nextInt(n)}"))
      val cap = 2 + rnd.nextInt(5)
      val got = Analytics.adamicAdar(edges.toDF("u", "v"), cap)
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), r.getDouble(3)))).toMap
      val want = refAdamicAdar(edges, cap)
      assert(got.keySet === want.keySet, s"case $k (cap $cap)")
      got.foreach { case (pair, (c, s)) =>
        assert(c === want(pair)._1, s"case $k $pair common")
        // bit-identical, not approximately equal — the fold order and
        // polynomial ln are the contract
        assert(s === want(pair)._2, s"case $k $pair score")
      }
    }
  }

  test("katzBounded: path counts on a chain and a diamond match by hand; isolated nodes score 0") {
    // chain a->b->c->d: c1(a)=1,c2(a)=1,c3(a)=1; diamond x->{y,z}->w
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"),
      ("x", "y"), ("x", "z"), ("y", "w"), ("z", "w"))
    val nodes = Seq("a", "b", "c", "d", "x", "y", "z", "w", "iso")
    val got = Analytics.katzBounded(edges.toDF("u", "v"), nodes.toDF("id"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got("a") === ((1L, 1L, 1L, 0.5 * 1 + 0.25 * 1 + 0.125 * 1)))
    assert(got("b") === ((1L, 1L, 0L, 0.75)))
    assert(got("x") === ((2L, 2L, 0L, 1.5)))
    assert(got("y") === ((1L, 0L, 0L, 0.5)))
    assert(got("iso") === ((0L, 0L, 0L, 0.0)))
  }

  test("squareCounts: C(common,2) per diagonal; the 4-cycle K_{2,2} yields one square per diagonal") {
    // K_{2,2}: a,b on one side, x,y on the other — squares through
    // diagonal (a,b): C(2,2)=1; through (x,y): 1; adjacent pairs share
    // 0 or 1 neighbors → absent
    val edges = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"))
    val got = Analytics.squareCounts(edges.toDF("u", "v"), maxHubDegree = 8)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got === Map(("a", "b") -> ((2L, 1L)), ("x", "y") -> ((2L, 1L))))
    // parity with the jaccard reference's common counts on random graphs
    val rnd = new scala.util.Random(59)
    val n = 10
    val redges = (0 until 30).map(_ =>
      (s"n${rnd.nextInt(n)}", s"n${rnd.nextInt(n)}"))
    val sq = Analytics.squareCounts(redges.toDF("u", "v"), 5)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(3))
      .toMap
    val want = refJaccard(redges, 5).filter(_._3 >= 2)
      .map(t => (t._1, t._2) -> t._3 * (t._3 - 1) / 2).toMap
    assert(sq === want)
  }

  test("adamicAdar: rarer shared neighbors outweigh busier ones; capped hubs contribute nothing") {
    // x,y share z2 (deg 2); p,q share z6 (deg 6, via 4 spokes); both
    // pair scores are single-neighbor sums → 1/ln(2) > 1/ln(6)
    val spokes = (0 until 4).map(i => ("z6", s"k$i"))
    val edges = Seq(("x", "z2"), ("y", "z2"), ("p", "z6"), ("q", "z6")) ++
      spokes
    val got = Analytics.adamicAdar(edges.toDF("u", "v"), maxHubDegree = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3))
      .toMap
    assert(got(("x", "y")) > got(("p", "q")))
    // dropping the cap to 5 removes z6-mediated pairs entirely
    val capped = Analytics.adamicAdar(edges.toDF("u", "v"), maxHubDegree = 5)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(capped.contains(("x", "y")) && !capped.contains(("p", "q")))
  }

  /** Independent reference: exact balls by set BFS, HLL registers via
    * MessageDigest md5 + the qsk1 rank rule, raw estimator and both
    * folds with the SAME association as the Column expressions.
    */
  private def refHarmonicCentrality(edges: Seq[(String, String)],
      nodes: Seq[String], k: Int): Map[String, (Double, Double)] = {
    val adj = edges.distinct.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
      .toMap.withDefaultValue(Set.empty[String])
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    def refRank(h: String): Long = {
      val t = h.substring(2, 17).dropWhile(_ == '0')
      val dz = t.headOption match {
        case Some('1') => 3L
        case Some(c) if c == '2' || c == '3' => 2L
        case Some(c) if c >= '4' && c <= '7' => 1L
        case _ => 0L
      }
      (15L - t.length) * 4L + dz + 1L
    }
    def rawEst(ball: Set[String]): Double = {
      val regs = ball.toSeq
        .map { id => val h = md5hex(id)
          (Integer.parseInt(h.substring(0, 2), 16), refRank(h)) }
        .groupBy(_._1).view.mapValues(_.map(_._2).max).toSeq.sortBy(_._1)
      val sumPow = regs.foldLeft(0.0)((acc, br) =>
        acc + math.pow(2.0, -br._2.toDouble))
      val alpha = 0.7213 / (1.0 + 1.079 / 256.0)
      alpha * 65536.0 / ((256.0 - regs.size.toDouble) + sumPow)
    }
    nodes.map { v =>
      var ball = Set(v)
      var ests = Vector(rawEst(ball))
      for (_ <- 1 to k) {
        ball = ball ++ ball.flatMap(adj)
        ests :+= rawEst(ball)
      }
      val harmonic = (1 to k).foldLeft(0.0)((acc, t) =>
        acc + (ests(t) - ests(t - 1)) / t.toDouble)
      v -> ((harmonic, ests(k)))
    }.toMap
  }

  test("harmonicCentrality: random digraphs match the exact-ball reference bit-for-bit (6 cases)") {
    val rnd = new scala.util.Random(83)
    (1 to 6).foreach { c =>
      val n = 4 + rnd.nextInt(12)
      val nodes = (0 until n).map(i => s"n$i")
      val edges = (0 until n * 2).map(_ =>
        (s"n${rnd.nextInt(n)}", s"n${rnd.nextInt(n)}"))
        .filter(p => p._1 != p._2)
      val k = 1 + rnd.nextInt(4)
      val got = Analytics.harmonicCentrality(edges.toDF("src", "dst"),
          nodes.toDF("id"), k)
        .collect().map(r => r.getString(0) ->
          ((r.getDouble(1), r.getDouble(2)))).toMap
      val want = refHarmonicCentrality(edges, nodes, k)
      assert(got.keySet === want.keySet, s"case $c")
      got.foreach { case (id, (h, b)) =>
        assert(h === want(id)._1, s"case $c $id harmonic")
        assert(b === want(id)._2, s"case $c $id ball_est")
      }
      // harmonic is a sum of non-negative hop deltas
      assert(got.values.forall(_._1 >= 0.0), s"case $c negativity")
    }
  }

  test("hits: empty node set and edge-free node set both fail with the precondition message, not an NPE") {
    val empty = intercept[IllegalArgumentException] {
      Analytics.hits(Seq(("a", "b")).toDF("src", "dst"),
        Seq.empty[String].toDF("id"), iterations = 1)
    }
    assert(empty.getMessage.contains("non-empty node set"), empty.getMessage)
    val noEdges = intercept[IllegalArgumentException] {
      Analytics.hits(Seq(("x", "y")).toDF("src", "dst"),
        Seq("a", "b").toDF("id"), iterations = 1)
    }
    assert(noEdges.getMessage.contains("at least one edge"), noEdges.getMessage)
  }

  test("hits: bit-stable across partitionings; max hub and max auth are exactly 1.0") {
    val nodes = (0 until 50).map(i => s"n$i")
    val edges = (0 until 200).map(i => (s"n${i % 50}", s"n${(i * 7 + 3) % 50}"))
    def run(parts: Int): Array[(String, Double, Double)] =
      Analytics.hits(edges.toDF("src", "dst").repartition(parts),
        nodes.toDF("id"), iterations = 2)
        .orderBy("id").collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val a = run(2)
    val b = run(7)
    a.zip(b).foreach { case ((ida, ha, aa), (idb, hb, ab)) =>
      assert(ida === idb)
      assert(java.lang.Double.doubleToLongBits(ha) ===
        java.lang.Double.doubleToLongBits(hb), s"node $ida hub")
      assert(java.lang.Double.doubleToLongBits(aa) ===
        java.lang.Double.doubleToLongBits(ab), s"node $ida auth")
    }
    assert(a.map(_._2).max === 1.0)
    assert(a.map(_._3).max === 1.0)
  }

  /** Local reference bounded Bellman–Ford: dist = min weight over paths
    * using at most maxEdges edges (full relaxation every round).
    */
  private def refSssp(edges: Seq[(String, String, Long)], nodes: Seq[String],
                      seeds: Seq[String], maxEdges: Int): Map[String, Long] = {
    val inSet = nodes.toSet
    val es = edges.distinct.filter(e => inSet(e._1) && inSet(e._2))
    var dist = seeds.filter(inSet).distinct.map(_ -> 0L).toMap
    (1 to maxEdges).foreach { _ =>
      val relaxed = es.flatMap { case (u, v, w) =>
        dist.get(u).map(du => v -> (du + w))
      }.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
      dist = (dist.keySet ++ relaxed.keySet).map { v =>
        v -> math.min(dist.getOrElse(v, Long.MaxValue),
          relaxed.getOrElse(v, Long.MaxValue))
      }.toMap
    }
    dist
  }

  test("weightedSssp: random weighted digraphs match the reference Bellman-Ford (10 cases, cycles included)") {
    val rnd = new scala.util.Random(42)
    (1 to 10).foreach { k =>
      val n = 2 + rnd.nextInt(18)
      val nodes = (0 until n).map(i => s"n$i")
      val edges = (0 until n * 3).map(_ =>
        (s"n${rnd.nextInt(n)}", s"n${rnd.nextInt(n)}", 1L + rnd.nextInt(9)))
      val seeds = (nodes.filter(_ => rnd.nextBoolean()).take(2) :+
        nodes.head) :+ "zz_not_a_node"
      val maxEdges = rnd.nextInt(5)
      val got = Analytics.weightedSssp(edges.toDF("src", "dst", "w"),
          nodes.toDF("id"), seeds.toDF("id"), maxEdges)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === refSssp(edges, nodes, seeds, maxEdges), s"case $k")
    }
  }

  test("weightedSssp: a longer path with smaller total weight wins within the hop budget") {
    // a->z direct weight 10; a->b->z total 3 — 2 hops beat 1 hop on weight
    val edges = Seq(("a", "z", 10L), ("a", "b", 1L), ("b", "z", 2L))
    val nodes = Seq("a", "b", "z")
    val d1 = Analytics.weightedSssp(edges.toDF("src", "dst", "w"),
      nodes.toDF("id"), Seq("a").toDF("id"), maxEdges = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(d1 === Map("a" -> 0L, "z" -> 10L, "b" -> 1L))
    val d2 = Analytics.weightedSssp(edges.toDF("src", "dst", "w"),
      nodes.toDF("id"), Seq("a").toDF("id"), maxEdges = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(d2 === Map("a" -> 0L, "z" -> 3L, "b" -> 1L))
  }

  /** Local reference walk: same LCG over the sorted undirected adjacency. */
  private def refWalks(edges: Seq[(String, String)], keys: Map[String, Long],
                       seeds: Seq[String], steps: Int)
      : Set[(String, Long, String)] = {
    val und = edges.map { case (u, v) => if (u < v) (u, v) else (v, u) }
      .filter(p => p._1 != p._2).distinct
    val adj = (und ++ und.map(_.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2).distinct.sorted.toVector).toMap
    seeds.distinct.filter(keys.contains).flatMap { s =>
      var cur = s
      var alive = true
      (s, 0L, s) +: (1 to steps).flatMap { t =>
        if (!alive) None
        else adj.get(cur) match {
          case None => alive = false; None
          case Some(nbrs) =>
            val pick = ((keys(cur) * 1103515245L + t * 12345L) %
              2147483648L % nbrs.size).toInt
            cur = nbrs(pick)
            Some((s, t.toLong, cur))
        }
      }
    }.toSet
  }

  test("randomWalks: random graphs match the reference LCG walk (8 cases); dead ends stop the walk") {
    val rnd = new scala.util.Random(7)
    (1 to 8).foreach { k =>
      val n = 3 + rnd.nextInt(15)
      val nodes = (0 until n).map(i => s"n%02d".format(i))
      val keys = nodes.zipWithIndex.map { case (id, i) => id -> i.toLong }.toMap
      val edges = (0 until n * 2).map(_ =>
        (nodes(rnd.nextInt(n)), nodes(rnd.nextInt(n))))
      val seeds = nodes.filter(_ => rnd.nextBoolean()).take(4) :+ nodes.head
      val steps = 1 + rnd.nextInt(4)
      val nodesDf = keys.toSeq.toDF("id", "key")
      val got = Analytics.randomWalks(edges.toDF("u", "v"), nodesDf,
          seeds.toDF("id"), steps)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
        .toSet
      assert(got === refWalks(edges, keys, seeds, steps), s"case $k")
    }
  }

  test("randomWalks: an isolated seed emits only its step-0 row") {
    val got = Analytics.randomWalks(Seq(("a", "b")).toDF("u", "v"),
      Seq(("a", 0L), ("b", 1L), ("c", 2L)).toDF("id", "key"),
      Seq("c").toDF("id"), steps = 3).collect()
    assert(got.map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .toSet === Set(("c", 0L, "c")))
  }

  /** Reference HLL bucket/rank (the SketchesSpec arithmetic). */
  private def refBucketRank(key: String): (Long, Long) = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val bucket = java.lang.Long.parseLong(h.substring(0, 2), 16)
    val t = h.substring(2, 17).dropWhile(_ == '0')
    val dz = t.headOption match {
      case Some('1') => 3L
      case Some(c) if c == '2' || c == '3' => 2L
      case Some(c) if c >= '4' && c <= '7' => 1L
      case _ => 0L
    }
    (bucket, (15L - t.length) * 4L + dz + 1L)
  }

  /** Reference HyperBall: exact ≤k ball per node, registers from it. */
  private def refHyperBall(edges: Seq[(String, String)], nodes: Seq[String],
                           k: Int): Map[String, (Long, BigInt)] = {
    val adj = edges.distinct.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    nodes.map { s =>
      var ball = Set(s)
      var frontier = Set(s)
      (1 to k).foreach { _ =>
        val next = frontier.flatMap(u => adj.getOrElse(u, Nil))
          .filter(nodes.contains).diff(ball)
        ball ++= next
        frontier = next
      }
      val regs = ball.map(refBucketRank).groupBy(_._1)
        .map { case (b, rs) => b -> rs.map(_._2).max }
      val fp = regs.map { case (b, r) =>
        (BigInt(1) << (61 - r).toInt) * (b * 2654435761L % 1048576L + 1L)
      }.sum % (BigInt(1) << 62)
      s -> (regs.size.toLong, fp)
    }.toMap
  }

  test("hyperBall: register state equals a from-scratch build over the exact ball (8 random digraphs)") {
    val rnd = new scala.util.Random(99)
    (1 to 8).foreach { case_ =>
      val n = 2 + rnd.nextInt(25)
      val nodes = (0 until n).map(i => s"n$i")
      val edges = (0 until n * 2).map(_ =>
        (s"n${rnd.nextInt(n)}", s"n${rnd.nextInt(n)}"))
      val k = rnd.nextInt(4)
      val got = Analytics.hyperBall(edges.toDF("src", "dst"),
          nodes.toDF("id"), k)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), BigInt(r.getLong(2)))).toMap
      assert(got === refHyperBall(edges, nodes, k), s"case $case_ k=$k n=$n")
    }
  }

  test("hyperBall: maxHops 0 is the singleton ball (one register per node)") {
    val got = Analytics.hyperBall(Seq(("a", "b")).toDF("src", "dst"),
      Seq("a", "b").toDF("id"), 0)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 1L, "b" -> 1L))
  }

  test("degreeHistogram: integer log2 buckets, node and edge counts per label") {
    // label A: n1 deg 3 (bucket 1), n2 deg 1 (bucket 0); label B: n1 deg 4 (bucket 2)
    val edges = Seq(
      ("A", "n1"), ("A", "n1"), ("A", "n1"), ("A", "n2"),
      ("B", "n1"), ("B", "n1"), ("B", "n1"), ("B", "n1"))
    val got = Analytics.degreeHistogram(edges.toDF("label", "src"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got === Map(
      ("A", 1L) -> ((1L, 3L)), ("A", 0L) -> ((1L, 1L)),
      ("B", 2L) -> ((1L, 4L))))
  }

  test("pageRank: ranks form a probability-mass deficit only from dangling leaks") {
    // no dangling nodes -> total mass stays exactly-ish 1 (fp tolerance)
    val nodes = Seq("a", "b", "c")
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"))
    val total = Analytics.pageRank(edges.toDF("src", "dst"),
      nodes.toDF("id"), iterations = 4, damping = 0.85)
      .agg(sum("rank")).head().getDouble(0)
    assert(math.abs(total - 1.0) < 1e-12)
  }
}
