package graft.ann

import org.apache.spark.sql.functions._

/** Scratch probe (Test/runMain graft.ann.LshRecallProbe): measure LSH
  * top-k equality vs brute force across (bits, tables) settings at the
  * correctness-gate scale factors, to size qann3's parameters for an
  * exact-equality oracle if achievable.
  *
  * Measured conclusion (2026-08-17): equality with the exact top-5 holds
  * only at (bits=3, tables=32) or wider — parameters whose union of
  * probed buckets covers ≈ all of the corpus, i.e. an exhaustive search
  * wearing an LSH costume. qann3 therefore deliberately STAYS a
  * rows-only query with a recall-≥0.7 spec at its honest (4, 16)
  * setting: tuning an approximate operator until it is secretly exact
  * would fake the oracle, not earn it.
  */
object LshRecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Graft.session("local[8]", 8, "lsh-probe")
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val emb = Knn.embeddings(spark, sf).cache()
      val queryIds = (0L until 20L).toSeq
      val bf = Knn.bruteForceTopK(spark, emb, queryIds, 5)
        .select("query_id", "rank", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      for ((bits, tables) <- Seq((4, 16), (4, 32), (3, 16), (3, 32), (2, 16))) {
        val lsh = Knn.lshTopK(spark, emb, queryIds, 5, bits, tables)
          .select("query_id", "rank", "neighbor_id")
          .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
        val eq = lsh == bf
        val recall = lsh.intersect(bf).size.toDouble / bf.size
        println(f"sf=$sf bits=$bits tables=$tables equal=$eq recall=$recall%.3f")
      }
      emb.unpersist(): Unit
    }
    spark.stop()
  }
}
