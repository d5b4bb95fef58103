package graft.tools

import org.apache.spark.sql.functions._
import graft.core.Graft
import graft.dedup.Dedup

/** One-off calibration tool (not part of the driver contract): measures
  * planted vs organic SimHash Hamming distributions to pick thresholds.
  */
object Calibrate {
  def main(args: Array[String]): Unit = {
    val spark = Graft.session("local[8]", 8, "calibrate")
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val corpus = Dedup.corpusWithCopies(spark, sf)
    val sigs = Dedup.shingleRows(corpus).groupBy(col("doc_id"))
      .agg(collect_list(col("shingle")).as("sh"))
      .as[(Long, Seq[String])]
      .map { case (id, sh) => (id, Dedup.simhash64(sh)) }
      .collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val planted = sigs.keys.filter(k => k < 100000 && k % 5 == 0)
      .flatMap(k => sigs.get(k + 100000).map(s => ham(sigs(k), s))).toSeq.sorted
    println(s"planted near-copy hamming: min=${planted.min} p50=${planted(planted.size / 2)} p90=${planted((planted.size * 9) / 10)} max=${planted.max}")
    val orig = sigs.keys.filter(_ < 100000).toArray.sorted
    val organic = (for {
      i <- orig.indices.iterator; j <- (i + 1) until orig.length
    } yield ham(sigs(orig(i)), sigs(orig(j)))).toSeq.sorted
    println(s"organic pair hamming: min=${organic.min} p1=${organic(organic.size / 100)} p5=${organic(organic.size / 20)} p50=${organic(organic.size / 2)}")
    println(s"organic pairs <= 20: ${organic.count(_ <= 20)}, <= 24: ${organic.count(_ <= 24)}, <= 28: ${organic.count(_ <= 28)}")
    spark.stop()
  }
}
