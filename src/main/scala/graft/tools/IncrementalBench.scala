package graft.tools

import java.nio.file.Files
import graft.core.Graft
import graft.kg.{Corpus, KgPipeline}
import graft.snapshot.SnapshotTable

/** Incremental-sync cost evidence (the north star's "sync-and-cleanup"
  * semantics at scale): one FULL sync, then two delta syncs into the
  * SAME graph tables under fresh update tags:
  *
  *  - day 2: one replica of new urls (~1/replicas of the corpus) —
  *    evidence that a delta sync costs the per-run floor plus
  *    delta-proportional work, not table-proportional work;
  *  - day 3: a ~1%-of-a-replica slice (page ids ending in 00) —
  *    small enough that the batch's merge keys hash into a strict
  *    subset of the graph buckets, so the post-commit manifest shows
  *    CARRIED partitions: file references to the previous version,
  *    zero data movement (the Iceberg MERGE file-pruning property that
  *    BucketedSnapshotSpec pins byte-identically at unit scale).
  *
  * Buckets default to 64 (deployment-sized-ish, vs 8 at unit-test
  * scale); at 100 TB the bucket count is thousands and the touched
  * fraction of ANY realistic delta is small.
  *
  * args: [sfDir] [replicas] [cpus] [noise] [buckets]
  */
object IncrementalBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val replicas = if (args.length > 1) args(1).toInt else 20
    val cpus = if (args.length > 2) args(2).toInt else 8
    val noise = if (args.length > 3) args(3).toInt else 14000
    val buckets = if (args.length > 4) args(4).toInt else 64

    val spark = Graft.session(s"local[$cpus]", cpus, "graft-incr-bench")
    val work = Files.createTempDirectory("kgincr").toString
    val pipe = new KgPipeline(spark, work, graphBuckets = buckets)

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def extractPages(): Long =
      SnapshotTable(spark, s"$work/stage_extract", None).rowCount()
    def freshCarried(t: SnapshotTable): (Int, Int) = {
      val v = t.latestVersion.get
      val parts = t.partitionsOf(v)
      val fresh = parts.values.count(_.startsWith(s"data/v$v/"))
      (fresh, parts.size - fresh)
    }

    val full = Corpus.pages(spark, sfDir, replicas, noise, minParts = 192)
    val tFull = timed { pipe.run(full, Corpus.aliasRows, 100L): Unit }
    val pagesFull = extractPages()

    val day2 = Corpus.pages(spark, sfDir, 1, noise, repOffset = replicas,
      minParts = 192)
    val tDay2 = timed { pipe.run(day2, Corpus.aliasRows, 101L): Unit }
    val pagesDay2 = extractPages()

    // day 3: ids ending in 00 — a tiny batch whose keys hash into a
    // strict subset of the buckets
    val day3 = Corpus.pages(spark, sfDir, 1, noise, repOffset = replicas + 1,
      minParts = 192)
      .filter((p: graft.kg.Page) => p.url.endsWith("00"))
    val tDay3 = timed { pipe.run(day3, Corpus.aliasRows, 102L): Unit }
    val pagesDay3 = extractPages()

    val (nf, nc) = freshCarried(pipe.nodes)
    val (ef, ec) = freshCarried(pipe.edges)
    val nodeRows = pipe.nodes.rowCount()
    // invariant: the graph holds every page node from all three syncs
    // (plus entity nodes)
    require(nodeRows >= pagesFull + pagesDay2 + pagesDay3,
      s"node table lost rows: $nodeRows < ${pagesFull + pagesDay2 + pagesDay3}")

    println(
      f"""{"metric":"incremental_sync","buckets":$buckets,"full_pages":$pagesFull,"full_sec":$tFull%.1f,"day2_pages":$pagesDay2,"day2_sec":$tDay2%.1f,"day2_page_fraction":${pagesDay2.toDouble / pagesFull}%.4f,"day2_time_fraction":${tDay2 / tFull}%.4f,"day3_pages":$pagesDay3,"day3_sec":$tDay3%.1f,"day3_nodes_fresh":$nf,"day3_nodes_carried":$nc,"day3_edges_fresh":$ef,"day3_edges_carried":$ec}""")
    spark.stop()
  }
}
