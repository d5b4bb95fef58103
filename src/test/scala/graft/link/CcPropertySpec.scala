package graft.link

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import graft.SparkSpecBase
import graft.kg.AliasRow

/** Property tests for the canonicalization layer: the distributed
  * large-star/small-star loop must agree with an independent union-find
  * on RANDOM graphs (not just the hand-built chains/stars in KgSpec),
  * and oversized-LSH-bucket chaining must keep planted duplicates
  * reachable even when they share no exact alias form and no rare token.
  */
class CcPropertySpec extends SparkSpecBase {
  import spark.implicits._

  private def unionFind(n: Int, edges: Seq[(Int, Int)]): Map[String, String] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    (0 until n).map(i => f"n$i%03d" -> f"${find(i)}%03d").map {
      case (k, v) => k -> s"n$v"
    }.toMap
  }

  test("distributed large-star/small-star CC == union-find on 20 ScalaCheck random graphs") {
    val genGraph = for {
      n <- Gen.choose(1, 30)
      m <- Gen.choose(0, 60)
      edges <- Gen.listOfN(m, for {
        a <- Gen.choose(0, n - 1); b <- Gen.choose(0, n - 1)
      } yield (a, b))
    } yield (n, edges)

    val prop = Prop.forAll(genGraph) { case (n, edges) =>
      val nodes = (0 until n).map(i => f"n$i%03d").toDF("id")
      val edgeDf = edges.map { case (a, b) => (f"n$a%03d", f"n$b%03d") }
        .toDF("u", "v")
      val got = ConnectedComponents.runDistributed(spark, edgeDf, nodes)
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      got == unionFind(n, edges)
    }
    // fixed seed + bounded case count: reproducible and CI-sized
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20).withInitialSeed(Seed(42L)),
      prop)
    assert(res.passed, res.status.toString)
  }

  test("oversized LSH buckets chain instead of drop: duplicates with no exact form and no rare token stay reachable") {
    // Every alias shares the same token multiset modulo a tiny suffix, so
    // every token is ubiquitous (df >> maxDf) and normalized forms all
    // differ — the exact and rare-token candidate paths see NOTHING and
    // recall rests solely on the LSH path. The planted duplicates are
    // near-identical alias pairs that must land adjacent in bucket sort
    // order; with the old drop-the-bucket behavior this recall was zero.
    val n = Blocking.MaxBucket * 2 // one over-cap bucket per band
    val dict = (0 until n).flatMap { g =>
      Seq(AliasRow(s"omega holdings group unit number$g", f"e$g%04da"),
          AliasRow(s"omega holdings group unit number$g extra", f"e$g%04db"))
    }
    val got = Blocking.duplicateEntityEdgesLocal(dict, tau = 0.5, maxDf = 4)
      .map(p => (p.a, p.b)).toSet
    val expected = (0 until n).map(g => (f"e$g%04da", f"e$g%04db")).toSet
    val found = expected.intersect(got)
    info(s"planted=${expected.size} found=${found.size}")
    assert(found.size >= expected.size * 9 / 10,
      s"chained buckets must keep near-identical pairs reachable; missing=${(expected -- got).take(5)}")

    // Dataset path agrees with the driver path on this adversarial dict
    val ds = Blocking.duplicateEntityEdges(spark, dict.toDS(), tau = 0.5)
      .collect().map(p => (p.a, p.b)).toSet
    assert(ds === got)
  }
}
