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
}
