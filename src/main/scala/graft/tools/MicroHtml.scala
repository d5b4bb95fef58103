package graft.tools

import graft.kg.{Corpus, Html}

/** One-off single-thread micro-benchmark for the Stage-1 hot path (not
  * part of the driver contract): render + extract throughput on
  * corpus-template pages, MB/s over the rendered HTML bytes.
  * args: [pages] [noiseWords]
  */
object MicroHtml {
  def main(args: Array[String]): Unit = {
    val pages = if (args.length > 0) args(0).toInt else 300
    val noise = if (args.length > 1) args(1).toInt else 14000
    val text = ("Quick Example Corp acquired Zenith Labs in 2024. " * 40).trim
    // honest steady-state numbers: measure the 3rd repetition
    var rep = 0
    while (rep < 3) {
      var bytes = 0L
      var outChars = 0L
      val t0 = System.nanoTime()
      var i = 0
      while (i < pages) {
        val html = Corpus.renderHtmlBytes(i.toLong, text, noise)
        bytes += html.length
        i += 1
      }
      val t1 = System.nanoTime()
      i = 0
      val htmls = Array.tabulate(pages)(j => Corpus.renderHtmlBytes(j.toLong, text, noise))
      val t2 = System.nanoTime()
      while (i < pages) {
        outChars += Html.extract(htmls(i)).length
        i += 1
      }
      val t3 = System.nanoTime()
      val mb = bytes / 1e6
      println(f"[micro] rep=$rep pages=$pages bytes=${bytes}%d render=${mb / ((t1 - t0) / 1e9)}%.0f MB/s extract=${mb / ((t3 - t2) / 1e9)}%.0f MB/s outChars=$outChars")
      rep += 1
    }
  }
}
