package graft.kg

/** Micro-benchmark: single-pass scanner vs the original regex pipeline
  * on Common-Crawl-weight pages (run manually:
  * `sbt "Test/runMain graft.kg.ExtractMicroBench"`). Not a test.
  */
object ExtractMicroBench {
  def main(args: Array[String]): Unit = {
    val pages = (0 until 200).map { i =>
      val text = Corpus.groundTruthText(i.toLong, "seed paragraph.\n\nsecond & third.")
      Corpus.renderHtml(i.toLong, text, 5000)
    }
    val bytes = pages.map(_.length.toLong).sum
    def time(label: String)(f: String => String): Unit = {
      var sink = 0L
      (1 to 3).foreach(_ => pages.foreach(p => sink += f(p).length)) // warmup
      val t0 = System.nanoTime()
      (1 to 10).foreach(_ => pages.foreach(p => sink += f(p).length))
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$label: ${10 * bytes / sec / 1e6}%.1f MB/s  (${sec / 10 / pages.size * 1e6}%.0f us/page, sink=$sink)")
    }
    println(f"page size ~ ${bytes / pages.size / 1024} KB")
    time("scanner")(Html.extract)
    time("regex  ")(RegexHtml.extract)
    var renderSink = 0L
    val t0 = System.nanoTime()
    (0 until 2000).foreach { i =>
      renderSink += Corpus.renderHtml(i.toLong, "seed.", 5000).length
    }
    println(f"render : ${renderSink / ((System.nanoTime() - t0) / 1e9) / 1e6}%.1f MB/s")
  }
}
