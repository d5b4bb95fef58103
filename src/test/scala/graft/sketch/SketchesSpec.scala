package graft.sketch

import java.security.MessageDigest
import graft.SparkSpecBase

class SketchesSpec extends SparkSpecBase {
  import spark.implicits._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  /** Reference rank: 1 + leading zero bits of the 60-bit tail. */
  private def refRank(h: String): Long = {
    val tail = h.substring(2, 17)
    val t = tail.dropWhile(_ == '0')
    val dz = t.headOption match {
      case Some('1') => 3L
      case Some(c) if c == '2' || c == '3' => 2L
      case Some(c) if c >= '4' && c <= '7' => 1L
      case _ => 0L
    }
    (15L - t.length) * 4L + dz + 1L
  }

  test("hllRegisters: registers equal the brute-force md5 rank maxima") {
    val keys = (0L until 2000L)
    val got = Sketches.hllRegisters(keys.toDF("k"), "k")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val want = keys.map(k => md5hex(k.toString))
      .groupBy(h => java.lang.Long.parseLong(h.substring(0, 2), 16))
      .map { case (b, hs) => b -> (hs.map(refRank).max, hs.size.toLong) }
    assert(got === want)
  }

  test("hllRegisters: duplicates cannot move a register") {
    val once = Sketches.hllRegisters((0L until 500L).toDF("k"), "k")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dup = Sketches.hllRegisters(
        ((0L until 500L) ++ (0L until 500L)).toDF("k"), "k")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(once === dup)
  }

  test("cmsCounters: total mass conserved per row; estimates bound truth") {
    val keys = (0 until 3000).map(i => s"k${i % 80}") // skewed: 80 terms
    val counters = Sketches.cmsCounters(keys.toDF("k"), "k")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // every hash row holds the full input mass
    (0L until 4L).foreach { r =>
      assert(counters.collect { case ((`r`, _), n) => n }.sum === 3000L) }
    val truth = keys.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    truth.foreach { case (k, n) =>
      val est = Sketches.cmsEstimate(counters, k)
      assert(est >= n, s"$k: est $est < true $n")
      assert(est <= n + 300, s"$k: est $est implausibly high vs $n")
    }
  }

  test("cmsPointEstimates: distributed estimates equal the Map-based cmsEstimate; unseen key estimates 0") {
    val keys = (0 until 3000).map(i => s"k${i % 80}")
    val countersDf = Sketches.cmsCounters(keys.toDF("k"), "k")
    val counters = countersDf
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val probes = ((0 until 80).map(i => s"k$i") :+ "never_seen").toDF("k")
    val got = Sketches.cmsPointEstimates(countersDf, probes, "k")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.size === 81)
    got.foreach { case (k, est) =>
      assert(est === Sketches.cmsEstimate(counters, k), s"key $k")
    }
    // an unseen key only reads collision mass — with 80 keys in 4x1024
    // cells a specific probe key colliding in ALL 4 rows is ~(80/1024)^4
    assert(got("never_seen") === 0L)
  }

  test("hllEstimate: within 15% of the true cardinality at n=5000") {
    val regs = Sketches.hllRegisters((0L until 5000L).toDF("k"), "k")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val est = Sketches.hllEstimate(regs)
    assert(math.abs(est - 5000.0) / 5000.0 < 0.15, s"estimate $est")
  }
}
