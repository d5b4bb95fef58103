package graft.text

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Pins [[TextStats.dfPrune]]'s class thresholds and the kept-text md5
  * on a hand-built corpus with known document frequencies.
  */
class DfPruneSpec extends SparkSpecBase {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("dfPrune: stop ≥ 30% of docs, rare df < 2, kept text md5 preserves original order") {
    // 10 docs; "the" in 4 docs (40% → stop), "unique<i>" df 1 (rare),
    // "keep1"/"keep2" in 2 docs each (keep). Double space → empty token
    // dropped before any counting.
    val docs = Seq(
      (0L, "the keep1  unique0 keep2"),
      (1L, "keep1 the"),
      (2L, "unique2 keep2 the"),
      (3L, "the unique3"),
      (4L, "unique4"), (5L, "unique5"), (6L, "unique6"),
      (7L, "unique7"), (8L, "unique8"), (9L, "unique9")
    ).toDF("doc_id", "text")
    val got = TextStats.dfPrune(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getString(5))).toMap
    // doc 0: 4 tokens; keep1, keep2 kept in ORIGINAL order
    assert(got(0L) === ((4L, 2L, 1L, 1L, md5hex("keep1 keep2"))))
    assert(got(1L) === ((2L, 1L, 1L, 0L, md5hex("keep1"))))
    assert(got(2L) === ((3L, 1L, 1L, 1L, md5hex("keep2"))))
    // doc 3: everything pruned → md5 of the empty string
    assert(got(3L) === ((2L, 0L, 1L, 1L, md5hex(""))))
    assert(got(4L) === ((1L, 0L, 0L, 1L, md5hex(""))))
  }

  test("dfPrune: thresholds are parameters (minDf, stopPct)") {
    val docs = Seq((0L, "a b"), (1L, "a c"), (2L, "a b")).toDF("doc_id", "text")
    // stopPct 100 → only df == n_docs is stop; minDf 1 → nothing rare
    val got = TextStats.dfPrune(docs, minDf = 1, stopPct = 100)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got(0L) === ((1L, 1L, 0L))) // b kept, a stop
    assert(got(1L) === ((1L, 1L, 0L))) // c kept
  }
}
