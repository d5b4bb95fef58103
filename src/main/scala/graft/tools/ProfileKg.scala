package graft.tools

import java.nio.file.Files
import graft.core.Graft
import graft.kg.{Corpus, KgPipeline}

/** One-off profiling tool (not part of the driver contract): a single
  * KG-pipeline run with per-stage timings on stderr.
  * args: [sfDir] [replicas] [cpus]
  */
object ProfileKg {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val replicas = if (args.length > 1) args(1).toInt else 10
    val cpus = if (args.length > 2) args(2).toInt else 16
    val noise = if (args.length > 3) args(3).toInt else 0
    val spark = Graft.session(s"local[$cpus]", cpus, "profile-kg")
    sys.env.get("GRAFT_LOG").foreach(spark.sparkContext.setLogLevel)
    val work = graft.core.Graft.scratchDir("kgprof")
    val pipe = new KgPipeline(spark, work)
    val t0 = System.nanoTime()
    val res = pipe.run(Corpus.pages(spark, sfDir, replicas, noise),
      Corpus.aliasRows, 100L, mergeGraph = true)
    val nt = res.triples.count()
    val sec = (System.nanoTime() - t0) / 1e9
    // counted from the committed texts table (1 row/page): counting
    // res.pages would re-render the raw input
    val np = res.texts.count()
    println(f"[kg-profile] pages=$np triples=$nt sec=$sec%.2f pages_per_sec=${np / sec}%.1f cpus=$cpus replicas=$replicas noise=$noise")
    spark.stop()
  }
}
