package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import graft.kg.{Corpus, KgPipeline}

/** Benchmark main (driver contract): one JSON line on stdout.
  *
  * Two measurements in one run:
  *  1. headline operator queries on SPARK_GRAFT_SF_DIR at local[N]
  *     (N = SPARK_GRAFT_CPUS, default 32) — seconds each;
  *  2. the north-star KG pipeline (pages → extract → mentions/links →
  *     canonical → triples → graph merge) end-to-end at TWO parallelism
  *     levels, local[8] and local[N], on IDENTICAL input — the sandbox
  *     evidence for the ≥0.8 N→4N scaling-efficiency rule
  *     (BASELINE.json north_rule; no real cluster available here).
  *     Reported: pages/sec and triples/sec at both levels, and
  *     efficiency = (throughput_N / throughput_8) / (N/8).
  *
  * The pipeline is write-heavy by design (every stage commits a
  * snapshot); throughput includes those commits — it is end-to-end, not
  * compute-only.
  */
object Bench {

  /** Headline subset: one representative per operator family (full
    * coverage is Verify's job; bench tracks the shapes that dominate at
    * scale).
    */
  private val headline: Seq[String] = Seq(
    "q1_agg", "q2_join_agg", "q5_antijoin", "q6_window_top1",
    "q12_twohop_closure", "q16_khop", "q17_wildcard_policy",
    "q20_exposure_propagation", "qdd2_neardup_allpairs", "qdd4_minhash_lsh",
    "qann1_topk", "qtx1_tokens", "qtx3_langid")

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  /** One full KG-pipeline run on a fresh work dir; returns
    * (pages, triples, seconds).
    */
  private def kgRun(spark: SparkSession, sfDir: String, replicas: Int): (Long, Long, Double) = {
    val work = Files.createTempDirectory("kgbench").toString
    val pipe = new KgPipeline(spark, work)
    val pages = Corpus.pages(spark, sfDir, replicas)
    val (res, sec) = timed {
      val r = pipe.run(pages, Corpus.aliasRows, 100L, mergeGraph = true)
      r.triples.count() // force the final stage read
      r
    }
    (res.pages.count(), res.triples.count(), sec)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val replicas = sys.env.getOrElse("SPARK_GRAFT_KG_REPLICAS", "10").toInt

    // ---- headline queries at local[cpus] -----------------------------------
    var spark = core.Graft.session(s"local[$cpus]", cpus, "graft-bench")
    val qtimes: Seq[(String, Double)] = headline.map { name =>
      val fn = SparkEntry.queries(name)
      val (_, sec) = timed(fn(spark, sfDir).count())
      name -> sec
    }

    // ---- KG pipeline at local[cpus] (the big-parallelism leg) --------------
    kgRun(spark, "/root/testdata/sf0.001", 1) // JIT/codegen warmup
    val (pagesN, triplesN, secN) = kgRun(spark, sfDir, replicas)
    spark.stop()

    // ---- same job, same input, local[8] (the small-parallelism leg) --------
    spark = core.Graft.session("local[8]", 8, "graft-bench-8")
    kgRun(spark, "/root/testdata/sf0.001", 1) // warm the new session too
    val (_, _, sec8) = kgRun(spark, sfDir, replicas)
    spark.stop()

    val thruN = pagesN / secN
    val thru8 = pagesN / sec8
    val eff = (thruN / thru8) / (cpus / 8.0)

    val total = qtimes.map(_._2).sum + secN
    val qs = (qtimes ++ Seq(
      "kg_pipeline" -> secN, "kg_pipeline_8core" -> sec8))
      .map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    println(
      f"""{"metric":"headline+kg_sec","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","kg_pages":$pagesN,"kg_triples":$triplesN,"kg_pages_per_sec":$thruN%.1f,"kg_triples_per_sec":${triplesN / secN}%.1f,"kg_pages_per_sec_8core":$thru8%.1f,"scaling_cores":[8,$cpus],"scaling_efficiency":$eff%.3f}""")
  }
}
