package graft.sample

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** Properties that make content-hash sampling the right primitive for
  * dataset mixing: rate convergence, invariance under repartitioning
  * (where rand(seed) breaks), nested samples (a lower rate is a subset
  * of a higher one), and quota stability under corpus growth.
  */
class SamplingSpec extends SparkSpecBase {
  import spark.implicits._

  private val ids = (1L to 20000L).toDF("doc_id")

  test("kept fraction converges to the rate (md5 uniformity)") {
    Seq(0.1, 0.25, 0.5).foreach { rate =>
      val kept = Sampling.hashSample(ids, col("doc_id"), rate).count().toDouble
      val frac = kept / 20000.0
      assert(math.abs(frac - rate) < 0.02, s"rate=$rate got $frac")
    }
    assert(Sampling.hashSample(ids, col("doc_id"), 0.0).count() === 0L)
    assert(Sampling.hashSample(ids, col("doc_id"), 1.0).count() === 20000L)
  }

  test("sample is a pure function of content: repartitioning changes nothing") {
    val a = Sampling.hashSample(ids, col("doc_id"), 0.25)
      .as[Long].collect().toSet
    val b = Sampling.hashSample(ids.repartition(17, col("doc_id") % 3), col("doc_id"), 0.25)
      .as[Long].collect().toSet
    assert(a === b)
  }

  test("samples nest: rate 0.1 ⊆ rate 0.25 ⊆ rate 0.5 (threshold construction)") {
    def s(r: Double) = Sampling.hashSample(ids, col("doc_id"), r).as[Long].collect().toSet
    val (s10, s25, s50) = (s(0.1), s(0.25), s(0.5))
    assert(s10.subsetOf(s25) && s25.subsetOf(s50))
    assert(s10.nonEmpty && s25.size > s10.size && s50.size > s25.size)
  }

  test("stratified quota: exact n per stratum; growth only replaces, never reshuffles") {
    val docs = (1L to 3000L).map(i => (i, s"lang${i % 3}")).toDF("doc_id", "lang")
    val q = Sampling.stratifiedQuota(docs, col("lang"), col("doc_id"), 10)
    val perLang = q.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(perLang === Map("lang0" -> 10L, "lang1" -> 10L, "lang2" -> 10L))
    // grow the corpus: each stratum's new quota differs from the old one
    // only by hash-order replacement — surviving members keep relative order
    val grown = (1L to 6000L).map(i => (i, s"lang${i % 3}")).toDF("doc_id", "lang")
    val q2 = Sampling.stratifiedQuota(grown, col("lang"), col("doc_id"), 10)
    def ranked(df: org.apache.spark.sql.DataFrame) = df
      .select("lang", "doc_id", "sample_rank").as[(String, Long, Long)]
      .collect().groupBy(_._1).view
      .mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    val (r1, r2) = (ranked(q), ranked(q2))
    r1.keys.foreach { lang =>
      val survivors = r1(lang).filter(r2(lang).contains)
      assert(survivors === r2(lang).filter(r1(lang).contains),
        s"$lang: surviving members must keep their relative hash order")
      assert(r2(lang).size === 10)
    }
  }

  test("hashNegatives: k draws per positive minus exact accidental-positive removals; repartition-invariant") {
    val pos = Seq((1L, 10L), (1L, 20L), (2L, 10L), (3L, 30L))
      .toDF("doc_id", "entity")
    val out = Sampling.hashNegatives(pos, "doc_id", "entity",
        space = 50L, k = 6)
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    // every surviving draw: in range, NOT a positive of its anchor
    val posSet = Set((1L, 10L), (1L, 20L), (2L, 10L), (3L, 30L))
    out.foreach { case (a, p, j, neg) =>
      assert(neg >= 0 && neg < 50)
      assert(j >= 0 && j < 6)
      assert(!posSet((a, neg)), s"accidental positive survived: ($a,$neg)")
      assert(posSet((a, p)))
    }
    // removed = exactly the draws that hash onto a positive (recompute)
    val md = java.security.MessageDigest.getInstance("MD5")
    def draw(j: Int, a: Long, p: Long): Long = {
      val h = md.digest(s"$j:$a:$p".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.substring(0, 8)
      java.lang.Long.parseLong(h, 16) % 50L
    }
    val want = (for {
      (a, p) <- posSet.toSeq; j <- 0 until 6
      n = draw(j, a, p) if !posSet((a, n))
    } yield (a, p, j.toLong, n)).sorted
    assert(out === want)
    // deterministic under any partitioning
    val re = Sampling.hashNegatives(pos.repartition(7), "doc_id", "entity",
        space = 50L, k = 6)
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    assert(re === out)
  }

  test("weightedSample: A-Res brute-force parity, weight monotonicity, non-positive weights excluded") {
    import org.apache.spark.sql.functions.col
    // two weight classes over 2000 keys: heavy (w=10) multiples of 4,
    // light (w=1) the rest; plus poisoned rows that must never appear
    val rows = (1L to 2000L).map(k =>
      (k, if (k % 4 == 0) 10.0 else 1.0)) ++
      Seq((9001L, 0.0), (9002L, -5.0))
    val df = rows.toDF("k", "w")
    val got = Sampling.weightedSample(df, col("k"), col("w"), 100)
      .as[(Long, Double, Double)].collect().toSeq
    // brute-force A-Res with the same draw (the ExactMath polynomial —
    // the documented contract, NOT libm ln)
    val md = java.security.MessageDigest.getInstance("MD5")
    def pri(k: Long, w: Double): Double = {
      val h = java.lang.Long.parseLong(md.digest(k.toString.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.substring(0, 8), 16)
      (graft.functions.ExactMath.lnOfIntRef(h + 1L) -
        32.0 * graft.functions.ExactMath.Ln2) / w
    }
    val want = rows.filter(_._2 > 0)
      .map { case (k, w) => (k, w, pri(k, w)) }
      .sortBy { case (k, _, p) => (-p, k) }.take(100)
    assert(got.sortBy { case (k, _, p) => (-p, k) } === want)
    assert(!got.exists(r => r._1 == 9001L || r._1 == 9002L))
    // heavy keys are 25% of the population but should dominate the
    // sample (w=10 vs 1 -> inclusion odds ~10x)
    val heavy = got.count(_._2 == 10.0)
    assert(heavy > 60, s"only $heavy heavy keys of 100")
    val re = Sampling.weightedSample(df.repartition(7), col("k"), col("w"), 100)
      .as[(Long, Double, Double)].collect().toSeq
    assert(re.sortBy { case (k, _, p) => (-p, k) } === want)
  }

  test("assignSplits: disjoint, exhaustive, fraction-converging, growth-stable") {
    val split = Sampling.assignSplits(ids, "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .as[(Long, String)].collect().toMap
    assert(split.size === 20000) // every key assigned exactly once
    val counts = split.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(math.abs(counts("train") - 16000) < 400, counts.toString)
    assert(math.abs(counts("val") - 2000) < 200, counts.toString)
    assert(math.abs(counts("test") - 2000) < 200, counts.toString)
    // growth stability: tripling the corpus never moves an existing key
    val grown = Sampling.assignSplits((1L to 60000L).toDF("doc_id"), "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .as[(Long, String)].collect().toMap
    assert(split.forall { case (k, s) => grown(k) == s })
  }

  test("tokenBudgetSample: budget-exact with boundary doc, keep-all above total, absent strata dropped, two-level ≡ naive prefix") {
    import org.apache.spark.sql.functions.col
    val docs = ((1L to 400L).map(i => (i, "en", 10L + i % 7)) ++
      (1000L to 1050L).map(i => (i, "de", 20L)) ++
      (2000L to 2020L).map(i => (i, "fr", 5L)))
      .toDF("doc_id", "lang", "n_tok")
    val budgets = Map("en" -> 1000L, "de" -> 100000L)
    val kept = Sampling.tokenBudgetSample(docs, "lang", col("doc_id"),
        col("n_tok"), budgets)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    // fr absent from the recipe → dropped entirely
    assert(!kept.exists(_._1 == "fr"))
    // de budget above total → every de doc kept
    assert(kept.count(_._1 == "de") === 51)
    // en: boundary semantics — total kept ≥ budget, minus the last doc < budget
    val en = kept.filter(_._1 == "en")
    val enTotal = en.map(_._3).sum
    assert(enTotal >= 1000L, s"$enTotal")
    assert(enTotal - en.maxBy(_._4)._3 < 1000L, s"$enTotal")
    // two-level prefix equals the naive per-stratum running total under
    // the (shard, hash, key) order
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val naive = (1L to 400L).map { i =>
      val h = md5hex(s"en:$i")
      (java.lang.Long.parseLong(h.substring(0, 2), 16), h, i, 10L + i % 7)
    }.sortBy(t => (t._1, t._2, t._3))
      .scanLeft((0L, 0L, 0L)) { case ((cum, _, _), (_, _, i, n)) =>
        (cum + n, i, n) }
      .sliding(2).collect { case Seq((cum, _, _), (_, i, n))
        if cum < 1000L => (i, n, cum) }.toSeq
    assert(en.map(t => (t._2, t._3, t._4)).sortBy(_._1) ===
      naive.map(t => (t._1, t._2, t._3)).sortBy(_._1))
  }

  test("epochOrder: complete per-epoch permutations, contiguous shard ranks, epochs independent, repartition-invariant") {
    import org.apache.spark.sql.functions.col
    val docs = (1L to 3000L).toDF("doc_id")
    val ord = Sampling.epochOrder(docs, col("doc_id"), epochs = 2)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getInt(3)))
    // every (epoch, doc) appears exactly once
    assert(ord.length === 6000)
    assert(ord.map(t => (t._1, t._3)).distinct.length === 6000)
    // within each (epoch, shard) ranks are contiguous 1..n
    ord.groupBy(t => (t._1, t._2)).foreach { case (_, rows) =>
      assert(rows.map(_._4).sorted.toSeq === (1 to rows.length))
    }
    // the two epochs produce genuinely different orders
    val e0 = ord.filter(_._1 == 0).sortBy(t => (t._2, t._4)).map(_._3).toSeq
    val e1 = ord.filter(_._1 == 1).sortBy(t => (t._2, t._4)).map(_._3).toSeq
    assert(e0 !== e1)
    // reproducible under a different partitioning
    val re = Sampling.epochOrder(docs.repartition(17), col("doc_id"), 2)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getInt(3))).sortBy(t => (t._1, t._2, t._4))
    assert(re.toSeq === ord.sortBy(t => (t._1, t._2, t._4)).toSeq)
  }
}
