package graft.kg

import org.scalatest.funsuite.AnyFunSuite

/** Pins the single-pass scanner ([[Html.extract]]) byte-identical to the
  * original multi-pass regex pipeline ([[RegexHtml.extract]]) on every
  * page shape the engine meets: the full synthetic corpus template
  * (scripts, styles, comments, nav/footer/aside noise, entities, numeric
  * refs) and randomized well-formed documents mixing all tag kinds.
  */
class HtmlEquivalenceSpec extends AnyFunSuite {

  test("scanner == regex pipeline on corpus-template pages (200 ids, with and without noise)") {
    (0 until 200).foreach { i =>
      val text = Corpus.groundTruthText(i.toLong, s"seed paragraph $i.\n\nsecond para & <raw>.")
      Seq(0, 40).foreach { noise =>
        val html = Corpus.renderHtml(i.toLong, text, noise)
        assert(Html.extract(html) === RegexHtml.extract(html), s"i=$i noise=$noise")
        assert(Html.extract(html) === text, s"invariant i=$i")
      }
    }
  }

  test("scanner == regex pipeline on randomized well-formed documents (400 cases)") {
    val rng = new scala.util.Random(20260817)
    val paraClosers = Seq("</p>", "</h1>", "</h3>", "</h6>", "</li>", "<br>", "<br/>", "<br />")
    val dropTags = Seq("script", "style", "head", "nav", "footer", "aside")
    def chunk(): String = rng.nextInt(10) match {
      case 0 =>
        val t = dropTags(rng.nextInt(dropTags.length))
        s"<$t class='x'>inner & <p>gone</p> junk</$t>"
      case 1 => s"<!-- comment ${rng.nextInt(100)} -->"
      case 2 => paraClosers(rng.nextInt(paraClosers.length))
      case 3 => s"<div id=\"d${rng.nextInt(9)}\">"
      case 4 => "</div>"
      case 5 => "&amp; &lt; &gt; &quot; &apos; &#233; &#x41; &bogus; &#zz;"
      case 6 => "<p>"
      case 7 => s"<SCRIPT>var x = 1 < 2;</SCRIPT>"
      case _ => Html.escape(s"text ${rng.nextInt(1000)} with spaces & specials é№")
    }
    (1 to 400).foreach { _ =>
      val html = Seq.fill(2 + rng.nextInt(20))(chunk()).mkString(" ")
      assert(Html.extract(html) === RegexHtml.extract(html), s"html=<$html>")
    }
  }

  test("scanner edge cases match the regex pipeline") {
    val cases = Seq(
      "",
      "plain text no tags",
      "a < b and c > d",                       // stray < with later > (anyTag eats the span)
      "<p>one</p><p>two</p>",
      "<br>start and end<br/>",
      "<script>no close tag",                  // unclosed drop block: open tag stripped, content kept
      "<head>only open",
      "x<!-- unclosed comment eats rest",
      "<UL><LI>item one</LI><LI>item &amp; two</LI></UL>",
      "<scriptx>not a script tag</scriptx>text",
      "<br >odd spacing<br  />",
      "<p >attr-ish close</p >tail",
      "&#x110000; bad codepoint &#-3; &",      // undecodable refs pass through
      "\n\n\n\nleading and trailing\n\n\n")
    cases.foreach { html =>
      assert(Html.extract(html) === RegexHtml.extract(html), s"html=<$html>")
    }
  }
}
