package graft.text

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Pins [[TextStats.segmentDedup]]'s keep-first semantics on hand-built
  * corpora: cross-document duplicates drop everywhere but the smallest
  * (doc_id, seg_idx); within-document repeats keep only the earliest;
  * the kept-text md5 preserves original segment order.
  */
class SegmentDedupSpec extends SparkSpecBase {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def run(docs: Seq[(Long, String)], segTokens: Int) =
    TextStats.segmentDedup(docs.toDF("doc_id", "text"), segTokens)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))).toMap

  test("cross-doc duplicate segment kept only at its first occurrence") {
    val got = run(Seq(
      (0L, "a b c d e"),          // segs: "a b c", "d e"
      (1L, "a b c x y z w")),     // "a b c" dup → dropped; "x y z"; "w"
      segTokens = 3)
    assert(got(0L) === ((2L, 2L, md5hex("a b c d e"), 0L)))
    assert(got(1L) === ((3L, 2L, md5hex("x y z w"), 1L)))
  }

  test("within-doc repeat keeps the earliest segment only") {
    val got = run(Seq((5L, "p q r p q r")), segTokens = 3)
    assert(got(5L) === ((2L, 1L, md5hex("p q r"), 1L)))
  }

  test("doc losing every segment pins md5 of the empty string") {
    val got = run(Seq((0L, "a b c"), (9L, "a b c")), segTokens = 3)
    assert(got(9L) === ((1L, 0L, md5hex(""), 1L)))
  }

  test("partial tail segments dedup like any other segment") {
    // both docs end with the 1-token tail "t" → second occurrence drops
    val got = run(Seq((0L, "a b t"), (1L, "c d t")), segTokens = 2)
    assert(got(0L) === ((2L, 2L, md5hex("a b t"), 0L)))
    assert(got(1L) === ((2L, 1L, md5hex("c d"), 1L)))
  }

  test("noveltyScore: originals introduce all grams, exact copies none, short docs excluded") {
    val docs = Seq(
      (0L, "a b c d e"),        // 3 grams, all first here → novelty 1
      (5L, "a b c d e"),        // exact copy → 0
      (7L, "a b c x y z"),      // grams: abc (old), bcx,cxy,xyz (new) → 3/4
      (9L, "t u"))              // < 3 tokens → excluded
      .toDF("doc_id", "text")
    val got = TextStats.noveltyScore(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got === Map(
      0L -> ((3L, 3L, 1.0)),
      5L -> ((3L, 0L, 0.0)),
      7L -> ((4L, 3L, 0.75))))
  }

  test("total kept across the corpus equals the distinct-segment count") {
    val docs = (0L until 40L).map(i =>
      (i, (0 until 20).map(j => s"w${(i * 7 + j) % 23}").mkString(" ")))
    val out = TextStats.segmentDedup(docs.toDF("doc_id", "text"), 5)
    val kept = out.agg(sum("n_kept")).head().getLong(0)
    val distinctSegs = docs.flatMap { case (_, t) =>
      t.split(" ").grouped(5).map(_.mkString(" ")) }.distinct.size
    assert(kept === distinctSegs)
    // and every token is covered: segments partition the document
    val segsTotal = out.agg(sum("n_segments")).head().getLong(0)
    assert(segsTotal === docs.map(_._2.split(" ").grouped(5).size).sum)
  }
}
