package graft.text

import java.security.MessageDigest
import graft.SparkSpecBase

class InvertedIndexSpec extends SparkSpecBase {
  import spark.implicits._

  private def fp32(s: String): Long =
    java.lang.Long.parseLong(
      MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.substring(0, 8), 16)

  private val corpus = Seq(
    (1L, "the cat sat"),
    (2L, "the the dog"),
    (3L, "cat"))

  test("invertedIndex: counts, df, and fingerprint match brute force") {
    val got = TextStats.invertedIndex(
        corpus.toDF("doc_id", "text").withColumn("lang",
          org.apache.spark.sql.functions.lit("en")))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val postings = corpus.flatMap { case (d, t) =>
      t.split(" ", -1).zipWithIndex.map { case (w, i) => (w, d, i + 1L) } }
    val want = postings.groupBy(_._1).map { case (term, ps) =>
      term -> (ps.size.toLong, ps.map(_._2).distinct.size.toLong,
        ps.map(p => fp32(s"${p._2}:${p._3}")).sum % 4611686018427387904L)
    }
    assert(got === want)
  }

  test("invertedIndex: fingerprint is partitioning-invariant (order-free)") {
    val df = corpus.toDF("doc_id", "text")
    val a = TextStats.invertedIndex(df).collect().map(_.toSeq).toSet
    val b = TextStats.invertedIndex(df.repartition(7)).collect()
      .map(_.toSeq).toSet
    assert(a === b)
  }

  test("lmScore: hand-computed add-one bigram log-probs, positional fold, short docs excluded") {
    import graft.functions.ExactMath.lnOfIntRef
    // V = {a,b,c} = 3; c1: a=3, b=2, c=1; c2: (a,b)=2, (b,a)=1
    val docs = Seq((1L, "a b a"), (2L, "a b"), (3L, "c"))
      .toDF("doc_id", "text")
    val got = TextStats.lmScore(docs)
      .as[(Long, Long, Double)].collect().toSeq
    val lpAB = lnOfIntRef(2L + 1L) - lnOfIntRef(3L + 3L)
    val lpBA = lnOfIntRef(1L + 1L) - lnOfIntRef(2L + 3L)
    val want = Seq(
      (1L, 2L, (0.0 + lpAB + lpBA) / 2L),
      (2L, 1L, (0.0 + lpAB) / 1L)) // doc 3 has no bigram -> excluded
    assert(got === want)
    // partitioning invariance of the positional fold
    val re = TextStats.lmScore(docs.repartition(5))
      .as[(Long, Long, Double)].collect().toSeq
    assert(re === got)
  }

  test("skipgramPpmi: hand-computed window-1 pairs; doc boundaries respected; only positive PMI") {
    import graft.functions.ExactMath.lnOfIntRef
    // doc 1 "a b c" w=1: pairs (a,b),(b,a),(b,c),(c,b); doc 2 "d d":
    // (d,d) twice — no cross-doc pair (a,d) may ever appear
    val docs = Seq((1L, "a b c"), (2L, "d d")).toDF("doc_id", "text")
    val got = TextStats.skipgramPpmi(docs, window = 1)
      .as[(String, String, Long, Double)].collect().toSeq
    val t = 6L
    val cc = Map("a" -> 1L, "b" -> 2L, "c" -> 1L, "d" -> 2L)
    def ppmi(c: String, x: String, n: Long): Double =
      lnOfIntRef(n * t) - lnOfIntRef(cc(c) * cc(x))
    val want = Seq(
      ("a", "b", 1L), ("b", "a", 1L), ("b", "c", 1L), ("c", "b", 1L),
      ("d", "d", 2L))
      .map { case (c, x, n) => (c, x, n, ppmi(c, x, n)) }
      .filter(_._4 > 0.0).sortBy(r => (r._1, r._2))
    assert(got === want)
    // (d,d): ppmi = ln(2*6) − ln(4) = ln3 > 0 — present exactly once
    assert(got.count(_._1 == "d") === 1)
  }

  test("bm25: scores equal the textbook formula bitwise; ranking and partitioning stable") {
    // doc 1: 'cat' twice in 4 tokens; doc 2: 'cat' once, longer; doc 3
    // matches nothing (absent from output); doc 4: rare term 'owl'
    val docs = Seq(
      (1L, "cat cat sat mat"),
      (2L, "cat dog dog dog dog dog"),
      (3L, "fish fish"),
      (4L, "owl cat"))
      .toDF("doc_id", "text")
    val got = TextStats.bm25(docs, Seq("cat", "owl"), topK = 10)
      .as[(Long, Double)].collect().toSeq
    // reference: plain Scala doubles, same association as the operator
    val n = 4.0
    val dls = Map(1L -> 4L, 2L -> 6L, 3L -> 2L, 4L -> 2L)
    val avgdl = dls.values.sum.toDouble / 4.0
    val dfs = Map("cat" -> 3L, "owl" -> 1L)
    val tfs = Map((1L, "cat") -> 2L, (2L, "cat") -> 1L, (4L, "cat") -> 1L,
      (4L, "owl") -> 1L)
    def part(d: Long, t: String): Double = {
      val tf = tfs((d, t)); val df = dfs(t)
      // idf = lnOfInt(2(N−df)+1) − lnOfInt(2df+1): the engine-portable
      // polynomial ln is the operator's documented contract
      val idf = graft.functions.ExactMath.lnOfIntRef(2L * (n.toLong - df) + 1L) -
        graft.functions.ExactMath.lnOfIntRef(2L * df + 1L)
      idf * (tf * (1.2 + 1.0)) /
        (tf + 1.2 * ((1.0 - 0.75) + 0.75 * dls(d) / avgdl))
    }
    // sorted term fold, 0.0 init — the operator's exact association
    def score(d: Long): Double =
      tfs.keys.filter(_._1 == d).map(_._2).toSeq.sorted
        .foldLeft(0.0)((acc, t) => acc + part(d, t))
    val want = Seq(1L, 2L, 4L).map(d => d -> score(d))
      .sortBy { case (d, s) => (-s, d) }
    assert(got === want)
    val re = TextStats.bm25(docs.repartition(5), Seq("cat", "owl"),
      topK = 10).as[(Long, Double)].collect().toSeq
    assert(re === got)
  }
}
