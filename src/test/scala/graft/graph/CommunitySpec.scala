package graft.graph

import graft.SparkSpecBase

/** labelPropagation + kCore pinned against brute-force references on
  * handcrafted and pseudo-random graphs (the AnalyticsSpec pattern).
  */
class CommunitySpec extends SparkSpecBase {
  import spark.implicits._

  /** Reference synchronous LPA: majority neighbor label, smallest label
    * on ties, isolated nodes keep their own.
    */
  private def refLpa(edges: Seq[(String, String)], nodes: Seq[String],
                     iters: Int): Map[String, String] = {
    val und = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .filter { case (a, b) => a != b }.distinct
    val nbrs = und.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var lbl = nodes.map(v => v -> v).toMap
    (1 to iters).foreach { _ =>
      lbl = nodes.map { v =>
        val votes = nbrs.getOrElse(v, Nil).map(lbl)
        if (votes.isEmpty) v -> lbl(v)
        else v -> votes.groupBy(identity).toSeq
          .map { case (l, vs) => (vs.size, l) }
          .minBy { case (c, l) => (-c, l) }._2
      }.toMap
    }
    lbl
  }

  /** Reference k-core peel. Returns in-core degrees. */
  private def refKCore(edges: Seq[(String, String)], k: Int): Map[String, Int] = {
    var cur = edges.map { case (a, b) => if (a < b) (a, b) else (b, a) }
      .filter { case (a, b) => a != b }.distinct
    var changed = true
    while (changed) {
      val deg = cur.flatMap { case (a, b) => Seq(a, b) }
        .groupBy(identity).view.mapValues(_.size).toMap
      val keep = deg.filter(_._2 >= k).keySet
      val next = cur.filter { case (a, b) => keep(a) && keep(b) }
      changed = next.size != cur.size
      cur = next
    }
    cur.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).view.mapValues(_.size).toMap
  }

  test("labelPropagation: two cliques with one bridge get two labels") {
    val cl1 = for (i <- 0 until 4; j <- i + 1 until 4) yield (s"a$i", s"a$j")
    val cl2 = for (i <- 0 until 4; j <- i + 1 until 4) yield (s"b$i", s"b$j")
    val nodes = (0 until 4).flatMap(i => Seq(s"a$i", s"b$i")) :+ "iso"
    val got = Analytics.labelPropagation(
      (cl1 ++ cl2 :+ ("a0", "b0")).toDF("u", "v"), nodes.toDF("id"), 3)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // each clique converges to its min id; the isolate keeps its own
    (0 until 4).foreach { i =>
      assert(got(s"a$i") === "a0", s"a$i")
      assert(got(s"b$i") === "b0", s"b$i")
    }
    assert(got("iso") === "iso")
  }

  test("labelPropagation: matches the synchronous reference on random graphs") {
    for (k <- 0 until 4) {
      val n = 24 + k * 7
      val nodes = (0 until n).map(i => f"n$i%03d")
      val edges = (0 until n * 3).map { i =>
        val a = (i * 13 + k) % n
        val b = (i * i * 7 + 3 * k + 1) % n
        (f"n$a%03d", f"n$b%03d")
      }.filter { case (a, b) => a != b }
      // messy input: duplicates and both orientations welcome
      val got = Analytics.labelPropagation(
        (edges ++ edges.map(_.swap)).toDF("u", "v"), nodes.toDF("id"), 3)
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      val want = refLpa(edges, nodes, 3)
      nodes.foreach(v => assert(got(v) === want(v), s"case $k node $v"))
    }
  }

  test("kCore: K4 with a dangling tail peels to exactly the K4") {
    val k4 = for (i <- 0 until 4; j <- i + 1 until 4) yield (s"k$i", s"k$j")
    val tail = Seq(("k0", "t1"), ("t1", "t2"), ("t2", "t0x"),
      ("t1", "t1")) // self-loop must be ignored
    val got = Analytics.kCore((k4 ++ tail).toDF("u", "v"), k = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("k0" -> 3L, "k1" -> 3L, "k2" -> 3L, "k3" -> 3L))
  }

  test("kCore: empty core when the whole graph peels away") {
    val path = (0 until 6).map(i => (s"p$i", s"p${i + 1}"))
    assert(Analytics.kCore(path.toDF("u", "v"), k = 2).isEmpty)
  }

  test("kCore: matches brute-force peeling on random graphs, k = 2..4") {
    for (k <- 2 to 4; c <- 0 until 3) {
      val n = 30 + c * 11
      val edges = (0 until n * 2 + c * 17).map { i =>
        (f"n${(i * 11 + c) % n}%03d", f"n${(i * i * 5 + 7 * c + 2) % n}%03d")
      }.filter { case (a, b) => a != b }
      val got = Analytics.kCore(edges.toDF("u", "v"), k)
        .collect().map(r => r.getString(0) -> r.getLong(1).toInt).toMap
      assert(got === refKCore(edges, k), s"k=$k case $c")
    }
  }
}
