package graft.ann

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Pins [[Knn.pqCodes]] against a brute-force local reference (same
  * sampling, same double-exact squared-L2, same smallest-code ties).
  */
class PqCodesSpec extends SparkSpecBase {
  import spark.implicits._

  /** Local reference: codebook = ids % step == 0 sorted by id; per
    * subspace the ascending-code argmin under strict `<`.
    */
  private def refCodes(vecs: Seq[(Long, Array[Float])], m: Int, step: Int)
      : Set[(Long, Long, Long)] = {
    val cb = vecs.filter(_._1 % step == 0).sortBy(_._1)
    vecs.flatMap { case (id, v) =>
      val sw = v.length / m
      (0 until m).map { s =>
        var best = -1L
        var bd = Double.PositiveInfinity
        cb.foreach { case (code, cv) =>
          var d = 0.0
          var j = 0
          while (j < sw) {
            val dd = v(s * sw + j).toDouble - cv(s * sw + j).toDouble
            d += dd * dd
            j += 1
          }
          if (d < bd) { bd = d; best = code }
        }
        (id, s.toLong, best)
      }
    }.toSet
  }

  test("pqCodes: random vectors match the brute-force reference; codebook vectors encode to themselves when unique") {
    val rnd = new scala.util.Random(123)
    val vecs = (0L until 60L).map(i =>
      (i, Array.fill(16)(rnd.nextFloat() * 2f - 1f)))
    val got = Knn.pqCodes(spark, vecs.toDF("vec_id", "embedding"),
        m = 4, centStep = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === refCodes(vecs, m = 4, step = 10))
    // every code must be a sampled id
    assert(got.forall(_._3 % 10 == 0))
    // random floats collide with probability ~0: each sampled vector's
    // nearest codebook entry in every subspace is itself (distance 0)
    got.filter(_._1 % 10 == 0).foreach { case (id, _, code) =>
      assert(code === id)
    }
  }

  test("pqCodes: exact subspace ties break to the smallest code") {
    // ids 0 and 10 are both sampled (step 10) and IDENTICAL — every
    // vector's tie between codes 0 and 10 must resolve to 0
    val shared = Array.fill(8)(0.5f)
    val vecs = Seq(
      (0L, shared), (10L, shared.clone()),
      (3L, Array.fill(8)(0.4f)), (7L, Array.fill(8)(0.9f)))
    val got = Knn.pqCodes(spark, vecs.toDF("vec_id", "embedding"),
        m = 2, centStep = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    assert(got.forall(_._3 === 0L))
  }

  test("adcTopK: ranking equals the brute-force ADC reference (codes + distance tables)") {
    val rnd = new scala.util.Random(5)
    val vecs = (0L until 40L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat() * 2f - 1f)))
    val m = 2; val step = 8; val k = 3
    val queries = Seq(0L, 3L, 17L)
    val got = Knn.adcTopK(spark, vecs.toDF("vec_id", "embedding"), queries,
        k, m, step)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // reference: codes from refCodes; adc = sum over subs of q-to-code dist
    val cb = vecs.filter(_._1 % step == 0).toMap
    val codes = refCodes(vecs, m, step)
      .groupBy(_._1).view.mapValues(_.map(t => t._2 -> t._3).toMap).toMap
    def subD(q: Array[Float], c: Array[Float], s: Int): Double = {
      val sw = q.length / m
      var d = 0.0
      (0 until sw).foreach { j =>
        val dd = q(s * sw + j).toDouble - c(s * sw + j).toDouble
        d += dd * dd
      }
      d
    }
    val qm = vecs.toMap
    val want = queries.flatMap { qid =>
      val ranked = vecs.filter(_._1 != qid).map { case (vid, _) =>
        val adc = (0 until m).map(s => subD(qm(qid), cb(codes(vid)(s.toLong)), s)).sum
        (vid, adc)
      }.sortBy { case (vid, adc) => (adc, vid) }.take(k)
      ranked.zipWithIndex.map { case ((vid, _), i) => (qid, (i + 1).toLong, vid) }
    }
    assert(got.toSeq === want)
  }

  test("ivfPqTopK: candidates are cell-pruned and ranked by the same ADC order") {
    val rnd = new scala.util.Random(11)
    val vecs = (0L until 60L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat() * 2f - 1f)))
    val emb = vecs.toDF("vec_id", "embedding")
    val queries = Seq(0L, 9L)
    // with nprobe = number of cells, pruning keeps EVERYTHING — the
    // composed ranking must then equal plain adcTopK
    val nCells = vecs.count(_._1 % 12 == 0)
    val full = Knn.adcTopK(spark, emb, queries, k = 4, m = 2, centStep = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val composed = Knn.ivfPqTopK(spark, emb, queries, k = 4, centStep = 12,
        nprobe = nCells, m = 2, pqStep = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(composed === full)
    // with nprobe = 1 the candidate set shrinks to one cell's members —
    // results are a (possibly shorter) list whose ids all share the
    // query's nearest cell
    val pruned = Knn.ivfPqTopK(spark, emb, queries, k = 4, centStep = 12,
        nprobe = 1, m = 2, pqStep = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(pruned.nonEmpty)
    val cells = Knn.assignCells(spark, emb,
        emb.filter(col("vec_id") % 12 === 0)
          .select(col("vec_id").as("cid"), col("embedding").as("cv")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    pruned.foreach { case (q, n) => assert(cells(n) === cells(q),
      s"neighbor $n of query $q outside its probe cell") }
  }

  test("pqCodes: indivisible dimension is rejected") {
    val vecs = Seq((0L, Array.fill(10)(1f)))
    val ex = intercept[org.apache.spark.SparkException] {
      Knn.pqCodes(spark, vecs.toDF("vec_id", "embedding"),
        m = 4, centStep = 1).collect()
    }
    assert(ex.getMessage.contains("not divisible") ||
      Option(ex.getCause).exists(_.getMessage.contains("not divisible")))
  }
}
