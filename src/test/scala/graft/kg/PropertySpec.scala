package graft.kg

import org.scalatest.funsuite.AnyFunSuite

/** Property-style invariants over seeded random inputs (SURVEY.md §5):
  * extractor determinism and round-trip, single-pass entity decoding,
  * and Aho–Corasick agreement with a naive reference matcher. Pure JVM
  * (no Spark session), so hundreds of cases run in milliseconds; the
  * fixed seed keeps failures reproducible.
  */
class PropertySpec extends AnyFunSuite {

  private def randomText(rng: scala.util.Random, max: Int = 60): String = {
    val specials = "&<>.!\n\"'é№"
    val n = rng.nextInt(max)
    val sb = new StringBuilder
    (0 until n).foreach { _ =>
      val r = rng.nextInt(12)
      if (r < 8) sb.append(('a' + rng.nextInt(26)).toChar)
      else if (r < 11) sb.append(' ')
      else sb.append(specials.charAt(rng.nextInt(specials.length)))
    }
    sb.toString
  }

  test("escape → extract round-trips any paragraph text wrapped in the page template (500 cases)") {
    val rng = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      // paragraph-normal form: the corpus never embeds blank-line runs
      // inside one paragraph
      val text = randomText(rng).replaceAll("\\s+", " ").trim
      if (text.nonEmpty) {
        val html = s"<html><head><title>t</title></head><body><nav>junk</nav>" +
          s"<article><p>${Html.escape(text)}</p></article><footer>f</footer></body></html>"
        assert(Html.extract(html) === text, s"text=<$text>")
      }
    }
  }

  test("extract is deterministic; escape/unescape round-trip; decode is single-pass (500 cases)") {
    assert(Html.unescape("&amp;lt;") === "&lt;", "no double decoding")
    assert(Html.unescape("&amp;amp;") === "&amp;")
    val rng = new scala.util.Random(7)
    (1 to 500).foreach { _ =>
      val s = randomText(rng)
      assert(Html.extract(s) === Html.extract(s))
      assert(Html.unescape(Html.escape(s)) === s, s"s=<$s>")
    }
  }

  test("aho-corasick mentions equal a naive word-boundary leftmost-longest scan (300 cases)") {
    val rng = new scala.util.Random(1234)
    val vocab = Array("aa", "ab", "ba", "bb", "cc", "aab")
    (1 to 300).foreach { _ =>
      val dict = Array.fill(1 + rng.nextInt(6))(
        Array.fill(1 + rng.nextInt(3))(vocab(rng.nextInt(vocab.length))).mkString(" "))
        .distinct.sorted
      val vocabX = vocab :+ "x"
      val text = Array.fill(rng.nextInt(14))(
        vocabX(rng.nextInt(vocabX.length))).mkString(" ")
      val ac = new AhoCorasick(dict)
      val got = ac.findMentions(text).map { case (s, e, i) => (s, e, dict(i)) }
      // naive reference: every boundary-valid occurrence, then the same
      // (start asc, longest first, pattern idx) leftmost-longest sweep
      val occ = for {
        (p, pi) <- dict.zipWithIndex
        s <- 0 to (text.length - p.length) if text.regionMatches(s, p, 0, p.length)
        e = s + p.length
        if (s == 0 || !Character.isLetterOrDigit(text.charAt(s - 1))) &&
          (e == text.length || !Character.isLetterOrDigit(text.charAt(e)))
      } yield (s, e, pi)
      val sorted = occ.sortBy { case (s, e, pi) => (s, -(e - s), pi) }
      var lastEnd = -1
      val kept = sorted.filter { m =>
        if (m._1 >= lastEnd) { lastEnd = m._2; true } else false
      }.map { case (s, e, pi) => (s, e, dict(pi)) }
      assert(got.toList === kept.toList, s"dict=${dict.mkString("|")} text=<$text>")
    }
  }
}
