package graft.kg

/** The original multi-pass regex extractor, kept in the test tree as the
  * independent cross-check oracle for the single-pass scanner in
  * [[Html.extract]]. On well-formed pages (no cross-nested unclosed
  * blocks, no entities spanning tags) the two are byte-identical;
  * HtmlEquivalenceSpec pins that over the full synthetic corpus plus
  * randomized well-formed templates.
  */
object RegexHtml {

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
    s = Html.unescape(s)
    s.replaceAll("\\A(\\n\\n)+", "").replaceAll("(\\n\\n)+\\z", "")
  }
}
