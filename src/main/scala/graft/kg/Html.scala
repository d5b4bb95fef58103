package graft.kg

/** Deterministic HTML encode + extract.
  *
  * The extractor is the engine's "reference extractor": a fully
  * specified, locale-free, dependency-free pure function whose output is
  * pinned byte-identically per url (BASELINE.json input_hint; golden
  * tests in KgSpec/PropertySpec). It is the Spark-side Stage-1 transform
  * run inside mapPartitions over Dataset[Page] — deliberately a pure
  * Scala function so partition output is reproducible (SURVEY.md §4
  * "deterministic extraction").
  *
  * Specification — ONE left-to-right pass over the markup:
  *  1. `<!--` skips to the matching `-->` (an unclosed comment degrades
  *     to generic-tag handling: stripped to the first `>`);
  *  2. an opening `<script|style|head|nav|footer|aside ...>` tag skips to
  *     the first matching `</tag>` (case-insensitive); if no close tag
  *     follows, the open tag alone is stripped like any other tag and its
  *     content is kept;
  *  3. closing `</p>`, `</h1>`..`</h6>`, `</li>` and `<br>`/`<br/>` emit
  *     a paragraph separator `"\n\n"`;
  *  4. every other `<...>` tag is stripped (a lone `<` with no closing
  *     `>` is kept as text);
  *  5. text runs are entity-decoded in the same pass (&amp; &lt; &gt;
  *     &quot; &apos; &#NNN; &#xHH;) — decoded output is never re-scanned,
  *     so "&amp;lt;" yields "&lt;", never doubly, and entities do not
  *     span tags;
  *  6. finally, leading/trailing paragraph-separator runs are trimmed.
  *
  * The first implementation was a ~9-regex-pass pipeline (comments,
  * 6 drop-blocks, para tags, any-tag), each pass reallocating the full
  * ~40 KB page; on a Common-Crawl-weight corpus Stage 1 is the whole
  * pipeline cost, so it was rewritten as this single-pass scanner. The
  * regex pipeline survives in the test tree (`RegexHtml`) and a property
  * test pins scanner == regex pipeline on corpus-shaped and random
  * well-formed pages.
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

  private val dropTags: Array[String] =
    Array("script", "style", "head", "nav", "footer", "aside")

  /** True if s[i..] starts with `pat` ignoring ASCII case. */
  private def startsWithIC(s: String, i: Int, pat: String): Boolean =
    s.regionMatches(true, i, pat, 0, pat.length)

  /** Index of the first case-insensitive occurrence of `pat` at or after
    * `from`, or -1.
    *
    * When the first pattern char has no case variants (every caller
    * passes "</tag>", so it is '<'), candidates are found with the
    * intrinsic single-char `String.indexOf` — a vectorized skip instead
    * of a char-by-char walk. This is the drop-block hot path: on a
    * Common-Crawl-weight page ~97% of the bytes sit inside one
    * `<aside>` block, so this search IS the scanner's cost for them.
    */
  private def indexOfIC(s: String, pat: String, from: Int): Int = {
    val n = s.length - pat.length
    var i = math.max(from, 0)
    val c0 = pat.charAt(0)
    val c0l = Character.toLowerCase(c0)
    val c0u = Character.toUpperCase(c0)
    if (c0l == c0u) {
      while (i <= n) {
        i = s.indexOf(c0, i)
        if (i < 0 || i > n) return -1
        if (s.regionMatches(true, i, pat, 0, pat.length)) return i
        i += 1
      }
      -1
    } else {
      while (i <= n) {
        val c = s.charAt(i)
        if ((c == c0l || c == c0u) && s.regionMatches(true, i, pat, 0, pat.length))
          return i
        i += 1
      }
      -1
    }
  }

  /** True if the char after a tag name ends the name (regex `\b` between
    * a word char and [^>]* — i.e. not a letter/digit/underscore).
    */
  @inline private def nameBoundary(c: Char): Boolean =
    !(Character.isLetterOrDigit(c) || c == '_')

  def extract(html: String): String = {
    val s = html
    val n = s.length
    val sb = new java.lang.StringBuilder(math.min(n, 1 << 16))
    var i = 0
    // Positions of the next '<' / '&' at-or-after the cursor, refreshed
    // lazily (only once the cursor passes them). Each refresh is the
    // intrinsic single-char String.indexOf, so locating every special
    // char costs an amortized ONE vectorized sweep of the page per char
    // kind; the plain-text runs between them are then appended in bulk
    // (System.arraycopy under StringBuilder.append(CharSequence,i,j))
    // instead of char-by-char. Byte-identical to the per-char loop —
    // pinned by HtmlEquivalenceSpec (corpus, random, adversarial,
    // prefix-sweep passes).
    var nextLt = s.indexOf('<')
    var nextAmp = s.indexOf('&')
    while (i < n) {
      if (nextLt >= 0 && nextLt < i) nextLt = s.indexOf('<', i)
      if (nextAmp >= 0 && nextAmp < i) nextAmp = s.indexOf('&', i)
      val runEnd = {
        val a = if (nextLt < 0) n else nextLt
        val b = if (nextAmp < 0) n else nextAmp
        if (a < b) a else b
      }
      if (runEnd > i) {
        sb.append(s, i, runEnd)
        i = runEnd
      } else {
      val c = s.charAt(i)
      if (c == '<') {
        val commentClose =
          if (startsWithIC(s, i, "<!--")) s.indexOf("-->", i + 4) else -1
        if (commentClose >= 0) {
          i = commentClose + 3
        } else {
          // drop-block open tag?
          var handled = false
          if (i + 1 < n && s.charAt(i + 1) != '/') {
            var t = 0
            while (!handled && t < dropTags.length) {
              val tag = dropTags(t)
              if (startsWithIC(s, i + 1, tag) &&
                  (i + 1 + tag.length >= n || nameBoundary(s.charAt(i + 1 + tag.length)))) {
                val openEnd = s.indexOf('>', i + 1 + tag.length)
                if (openEnd >= 0) {
                  val close = indexOfIC(s, "</" + tag + ">", openEnd + 1)
                  if (close >= 0) { i = close + 3 + tag.length; handled = true }
                }
              }
              t += 1
            }
          }
          if (!handled) {
            // paragraph-break tags
            val para =
              if (startsWithIC(s, i, "</p>") || startsWithIC(s, i, "</li>")) true
              else if (startsWithIC(s, i, "</h") && i + 4 < n &&
                       s.charAt(i + 3) >= '1' && s.charAt(i + 3) <= '6' &&
                       s.charAt(i + 4) == '>') true
              else false
            if (para) {
              sb.append("\n\n")
              i = s.indexOf('>', i) + 1
            } else if (startsWithIC(s, i, "<br")) {
              // <br\s*/?>  (regex paraTags)
              var j = i + 3
              while (j < n && Character.isWhitespace(s.charAt(j))) j += 1
              if (j < n && s.charAt(j) == '/') j += 1
              if (j < n && s.charAt(j) == '>') { sb.append("\n\n"); i = j + 1 }
              else {
                val gt = s.indexOf('>', i)
                if (gt < 0) { sb.append(c); i += 1 } else i = gt + 1
              }
            } else {
              val gt = s.indexOf('>', i)
              if (gt < 0) { sb.append(c); i += 1 } else i = gt + 1
            }
          }
        }
      } else {
        // runEnd == i, so the cursor is ON a special char and c == '&'
        // (the '<' case is handled above).
        i = appendEntity(s, i, sb)
      }
      }
    }
    trimSeparators(sb)
  }

  def extract(html: Array[Byte]): String =
    extract(new String(html, java.nio.charset.StandardCharsets.UTF_8))

  /** Decode one entity at s(i)=='&' into sb; returns the next index.
    * Unknown entities pass through verbatim (only the '&' is consumed).
    */
  private def appendEntity(s: String, i: Int, sb: java.lang.StringBuilder): Int = {
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
        case Some(d) => sb.append(d); semi + 1
        case None => sb.append('&'); i + 1
      }
    } else { sb.append('&'); i + 1 }
  }

  /** Trim leading/trailing runs of "\n\n" pairs (tags outside content
    * collapse to leading/trailing breaks). Equivalent to
    * `replaceAll("\\A(\\n\\n)+", "").replaceAll("(\\n\\n)+\\z", "")`.
    */
  private def trimSeparators(sb: java.lang.StringBuilder): String = {
    var a = 0
    val len = sb.length
    while (a + 1 < len && sb.charAt(a) == '\n' && sb.charAt(a + 1) == '\n') a += 2
    var b = len
    while (b - 2 >= a && sb.charAt(b - 1) == '\n' && sb.charAt(b - 2) == '\n') b -= 2
    sb.substring(a, b)
  }

  /** Single-pass entity decoder over a plain-text string (no tags).
    * Unknown entities pass through verbatim.
    */
  def unescape(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') i = appendEntity(s, i, sb)
      else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
