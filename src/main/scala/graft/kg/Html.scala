package graft.kg

/** Deterministic HTML encode + extract.
  *
  * The extractor is the engine's "reference extractor": a fully
  * specified, locale-free, dependency-free pure function whose output is
  * pinned byte-identically per url (BASELINE.json input_hint; golden
  * tests in KgCorpusSpec). It is the Spark-side Stage-1 transform run
  * inside mapPartitions over Dataset[Page] — deliberately a pure Scala
  * function so partition output is reproducible (SURVEY.md §4
  * "deterministic extraction").
  *
  * Rules (in order):
  *  1. drop <script>…</script>, <style>…</style>, HTML comments;
  *  2. drop non-content containers wholesale: <head>, <nav>, <footer>,
  *     <aside>;
  *  3. paragraph-ify: closing </p>, </h1>..</h6>, </li>, <br> become
  *     "\n\n";
  *  4. strip every remaining tag;
  *  5. decode entities in a single left-to-right pass (&amp; &lt; &gt;
  *     &quot; &apos; &#39; &#NNN; &#xHH;) — single pass so "&amp;lt;"
  *     decodes to "&lt;", never doubly;
  *  6. trim trailing paragraph separators.
  */
object Html {

  /** Minimal encoder used by the corpus generator: &, <, > and every
    * char above 126 become entities (exercises the decoder).
    */
  def escape(s: String): String = {
    val sb = new StringBuilder(s.length + 16)
    s.foreach {
      case '&' => sb.append("&amp;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case c if c > 126 => sb.append("&#").append(c.toInt).append(';')
      case c => sb.append(c)
    }
    sb.toString
  }

  private val dropBlocks = Seq("script", "style", "head", "nav", "footer", "aside")
    .map(t => (s"(?is)<$t\\b[^>]*>.*?</$t>").r)
  private val comments = "(?s)<!--.*?-->".r
  private val paraTags = "(?i)</p>|</h[1-6]>|</li>|<br\\s*/?>".r
  private val anyTag = "(?s)<[^>]*>".r

  def extract(html: String): String = {
    var s = comments.replaceAllIn(html, "")
    dropBlocks.foreach(r => s = r.replaceAllIn(s, ""))
    s = paraTags.replaceAllIn(s, "\n\n")
    s = anyTag.replaceAllIn(s, "")
    s = unescape(s)
    // trim separator runs at both ends (tags outside content collapse to
    // leading/trailing breaks)
    s.replaceAll("\\A(\\n\\n)+", "").replaceAll("(\\n\\n)+\\z", "")
  }

  def extract(html: Array[Byte]): String =
    extract(new String(html, java.nio.charset.StandardCharsets.UTF_8))

  /** Single-pass entity decoder. Unknown entities pass through verbatim. */
  def unescape(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          val body = s.substring(i + 1, semi)
          val decoded: Option[String] = body match {
            case "amp" => Some("&")
            case "lt" => Some("<")
            case "gt" => Some(">")
            case "quot" => Some("\"")
            case "apos" => Some("'")
            case b if b.startsWith("#x") || b.startsWith("#X") =>
              try Some(Character.toChars(Integer.parseInt(b.drop(2), 16)).mkString)
              catch { case _: Exception => None }
            case b if b.startsWith("#") =>
              try Some(Character.toChars(Integer.parseInt(b.drop(1))).mkString)
              catch { case _: Exception => None }
            case _ => None
          }
          decoded match {
            case Some(d) => sb.append(d); i = semi + 1
            case None => sb.append(c); i += 1
          }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
