package graft.text

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Pins [[TextStats.bpeMerges]] on the classic low/lower/lowest corpus
  * and [[TextStats.mergePair]]'s greedy-run semantics.
  */
class BpeSpec extends SparkSpecBase {
  import spark.implicits._

  private def merge(syms: Seq[String], a: String, b: String): Seq[String] =
    Seq(Tuple1(syms)).toDF("syms")
      .select(TextStats.mergePair(col("syms"), lit(a), lit(b)).as("m"))
      .head().getSeq[String](0)

  test("mergePair: greedy leftmost, runs merge at even offsets, non-matches untouched") {
    assert(merge(Seq("a", "a", "a"), "a", "a") === Seq("aa", "a"))
    assert(merge(Seq("a", "a", "a", "a"), "a", "a") === Seq("aa", "aa"))
    assert(merge(Seq("a", "b", "a", "b"), "a", "b") === Seq("ab", "ab"))
    // a merged symbol cannot chain into the next match within the pass
    assert(merge(Seq("a", "b", "b"), "a", "b") === Seq("ab", "b"))
    assert(merge(Seq("x", "y"), "a", "b") === Seq("x", "y"))
    assert(merge(Seq("x"), "a", "b") === Seq("x"))
  }

  test("bpeMerges: low/lower/lowest learns lo, low, lowe with the right counts and vocab sizes") {
    val docs = Seq((0L, "low low lower lowest")).toDF("doc_id", "text")
    val got = TextStats.bpeMerges(docs, iterations = 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getLong(4))).toSeq
    // (l,o) and (o,w) tie at 4 — lexicographic tie-break picks (l,o)
    assert(got === Seq(
      (1L, "l", "o", 4L, 6L),
      (2L, "lo", "w", 4L, 5L),
      (3L, "low", "e", 2L, 5L)))
  }

  test("bpeMerges stops early when no pairs remain") {
    val docs = Seq((0L, "a b c a")).toDF("doc_id", "text")
    assert(TextStats.bpeMerges(docs, iterations = 3).count() === 0)
  }

  test("sourceProfile: counts, language spread, and dominant language with count-then-lang tie order") {
    val docs = Seq(
      (0L, "s1", "en", "a b c"), (1L, "s1", "en", "d e"),
      (2L, "s1", "de", "f g h i"),
      // s2: en and de tie at 1 doc each → 'de' wins lexicographically
      (3L, "s2", "en", "x"), (4L, "s2", "de", "y z"))
      .toDF("doc_id", "source", "lang", "text")
    val got = TextStats.sourceProfile(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getLong(5)))).toMap
    assert(got("s1") === ((3L, 9L, 2L, "en", 2L)))
    assert(got("s2") === ((2L, 3L, 2L, "de", 1L)))
  }

  test("vocabGrowth: first-occurrence positions follow the (doc_id, position) global order") {
    val docs = Seq((0L, "a b a"), (1L, "c a d")).toDF("doc_id", "text")
    // global positions: a=1 b=2 (doc0), c=4 d=6 (doc1 offset 3)
    val got = TextStats.vocabGrowth(docs, Seq(1L, 2L, 3L, 5L, 10L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 5L -> 3L, 10L -> 4L))
  }
}
