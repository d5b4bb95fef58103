package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** Invariants of the chunking and PII-redaction operators beyond the
  * driver oracle: full token coverage, overlap arithmetic, short-doc
  * behavior, and masking semantics (order, idempotence, boundaries).
  */
class ChunkRedactSpec extends SparkSpecBase {

  test("repetitionSignals: hand-computed counts on planted repetition") {
    import spark.implicits._
    val docs = Seq(
      // "a b c a b c a b x": 9 tokens, top token 'a'/'b'/'c' tf: a=3;
      // 3-grams: [a b c][b c a][c a b][a b c][b c a][c a b][a b x] →
      // 7 grams, counts: "a b c"=2, "b c a"=2, "c a b"=2, "a b x"=1 →
      // dup occurrences = 6
      (1L, "a b c a b c a b x"),
      // all distinct: dup = 0
      (2L, "p q r s t"),
      // under 3 tokens: no 3-grams, dup_ratio defined as 0.0
      (3L, "only two"))
      .toDF("doc_id", "text")
    val got = TextStats.repetitionSignals(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))).toMap
    assert(got(1L) === ((9L, 3L, 3.0 / 9.0, 7L, 6L, 6.0 / 7.0)))
    assert(got(2L) === ((5L, 1L, 1.0 / 5.0, 3L, 0L, 0.0)))
    assert(got(3L) === ((2L, 1L, 1.0 / 2.0, 0L, 0L, 0.0)))
  }

  test("distinctiveTerms: integer-exact top-k by tf*(10^6 div df), ties by term") {
    import spark.implicits._
    // df: "rare"->1, "shared"->2, "common"->3; doc 1 has tf(rare)=2
    val docs = Seq(
      (1L, "rare rare shared common"),
      (2L, "shared common x y"),
      (3L, "common z")).toDF("doc_id", "text")
    val got = graft.text.TextStats.distinctiveTerms(docs, k = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    // doc1: rare tf=2 df=1 -> 2_000_000; shared tf=1 df=2 -> 500_000
    // doc2: x/y tf=1 df=1 -> 1_000_000 each (tie -> both, term order)
    // doc3: z 1_000_000; common tf=1 df=3 -> 333_333 (integral division)
    assert(got === Set(
      (1L, "rare", 2L, 1L, 2000000L), (1L, "shared", 1L, 2L, 500000L),
      (2L, "x", 1L, 1L, 1000000L), (2L, "y", 1L, 1L, 1000000L),
      (3L, "z", 1L, 1L, 1000000L), (3L, "common", 1L, 3L, 333333L)))
  }
  import spark.implicits._

  test("canonicalizeUrl: fragment/case/port/utm/root-slash rules, path case preserved") {
    import spark.implicits._
    val cases = Seq(
      // fragment + case + default port + utm, path case kept
      ("HTTP://ExAmple.CoM:80/Path?utm_source=a&id=1#frag",
        "http://example.com/Path?id=1"),
      ("https://X.com:443/", "https://x.com"),
      // non-default port kept; https default on http scheme NOT stripped
      ("https://x.com:8443/A", "https://x.com:8443/A"),
      ("http://x.com:443/a", "http://x.com:443/a"),
      // all-utm query drops the '?'; root slash drops too
      ("http://x.com/?utm_a=1&utm_b=2", "http://x.com"),
      // deeper trailing slash is meaningful and kept
      ("http://x.com/a/", "http://x.com/a/"),
      // adjacent utm params (no regex-fixpoint trap), mid-list survivor
      ("http://x.com/p?utm_a=1&utm_b=2&keep=3&utm_c=4", "http://x.com/p?keep=3"),
      // schemeless input passes through
      ("example.com/X?utm_a=1", "example.com/X"),
      // query case preserved
      ("HTTPS://A.B/p?ID=Q", "https://a.b/p?ID=Q"),
      // a '://' EMBEDDED in a query value is not the URL's own authority:
      // the value keeps its case AND its deep trailing slash (rules 2/5
      // are anchored to the real scheme+authority)
      ("http://a.com/r?u=HTTP://B.com/", "http://a.com/r?u=HTTP://B.com/"),
      // schemeless input whose query embeds a full URL: no authority to
      // lowercase, nothing rewritten
      ("EXAMPLE.com?u=HTTP://B.com/x", "EXAMPLE.com?u=HTTP://B.com/x"),
      // '://' embedded in the PATH never triggers the root-slash drop
      ("http://a.com/redirect/http://b.com/",
        "http://a.com/redirect/http://b.com/"),
      // empty query segments are preserved verbatim (only utm_* drops)
      ("http://x.com/p?a=1&&b=2", "http://x.com/p?a=1&&b=2"),
      // userinfo is case-SENSITIVE credential data: scheme + host lower,
      // userinfo intact (RFC 3986 §6.2.2.1 normalizes only scheme/host)
      ("HTTP://UsEr@ExAmple.CoM:80/Path", "http://UsEr@example.com/Path"),
      ("https://U:Pw@X.com/a", "https://U:Pw@x.com/a"),
      // the ':' inside user:pw is not the port delimiter — the default
      // port still drops (and a non-default one still survives)
      ("https://U:Pw@X.com:443/a", "https://U:Pw@x.com/a"),
      ("https://U:Pw@X.com:8443/a", "https://U:Pw@x.com:8443/a"),
      // the userinfo split is the authority's LAST '@'
      ("http://A@B@Host.COM/p", "http://A@B@host.com/p"))
    val got = cases.map(_._1).toDF("u")
      .select(graft.text.TextStats.canonicalizeUrl(col("u")))
      .as[String].collect().toSeq
    assert(got === cases.map(_._2))
  }

  test("chunking covers every token; stride/overlap arithmetic holds; short docs yield one chunk") {
    val docs = Seq(
      (1L, (1 to 100).map(i => s"w$i").mkString(" ")), // 100 tokens
      (2L, "only three tokens"),
      (3L, (1 to 24).map(i => s"t$i").mkString(" ")),  // exactly one stride
      (4L, (1 to 25).map(i => s"t$i").mkString(" "))   // one past the stride
    ).toDF("doc_id", "text")
    val chunks = TextStats.chunkTokens(docs, chunkSize = 32, step = 24)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def of(id: Long) = chunks.filter(_._1 == id).sortBy(_._2)
    // 100 tokens, stride 24: starts 0,24,48,72,96 → sizes 32,32,32,28,4
    assert(of(1L).map(_._3).toSeq === Seq(32L, 32L, 32L, 28L, 4L))
    assert(of(1L).map(_._2).toSeq === Seq(0L, 1L, 2L, 3L, 4L))
    // coverage: start of chunk k = 24k ≤ 99, last chunk reaches token 100
    assert(of(1L).map(t => t._2 * 24 + t._3).max === 100L)
    assert(of(2L).map(_._3).toSeq === Seq(3L), "short doc = one partial chunk")
    assert(of(3L).map(_._3).toSeq === Seq(24L), "n == stride → one chunk, no empty tail")
    assert(of(4L).map(_._3).toSeq === Seq(25L, 1L), "one token past the stride spawns a tail chunk")
  }

  test("overlapping windows share exactly chunkSize-step tokens (hash-checkable)") {
    val text = (1 to 56).map(i => s"u$i").mkString(" ") // starts 0, 24, 48
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val hashes = TextStats.chunkTokens(docs).orderBy("chunk_idx")
      .select("chunk_hash").as[String].collect()
    val ws = text.split(" ")
    def h(a: Int, sz: Int) = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(ws.slice(a, a + sz).mkString(" ").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    }
    assert(hashes.toSeq === Seq(h(0, 32), h(24, 32), h(48, 32)))
  }

  test("redaction masks emails before IPs/phones, counts pre-mask, and is idempotent") {
    val docs = Seq(
      (1L, "write to a.b+c@sub.domain.org or 10.1.2.3 ext 555-1234"),
      (2L, "no pii here at all"),
      (3L, "double x@y.zz and q@r.ss; ip 255.255.255.255; 555-0000 555-9999"),
      (4L, "not-an-ip 1234.5.6.7 and short 55-1234 stay")).toDF("doc_id", "text")
    val out = TextStats.redactPii(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(out(1L)._1 === 1L && out(1L)._2 === 1L && out(1L)._3 === 1L)
    assert(out(2L) === ((0L, 0L, 0L, md5Hex("no pii here at all"))))
    assert(out(3L)._1 === 2L && out(3L)._2 === 1L && out(3L)._3 === 2L)
    // \b boundaries: 1234.5.6.7 has a 4-digit first octet → no IP match;
    // 55-1234 lacks the 3-digit prefix → no phone match
    assert(out(4L) === ((0L, 0L, 0L, md5Hex("not-an-ip 1234.5.6.7 and short 55-1234 stay"))))
    assert(out(1L)._4 === md5Hex("write to <EMAIL> or <IP> ext <PHONE>"))
    // idempotent: masking already-masked text changes nothing
    val again = TextStats.redactPii(
      Seq((1L, "write to <EMAIL> or <IP> ext <PHONE>")).toDF("doc_id", "text"))
      .collect().head
    assert((again.getLong(1), again.getLong(2), again.getLong(3)) === ((0L, 0L, 0L)))
    assert(again.getString(4) === out(1L)._4)
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
}
