package graft.link

import graft.SparkSpecBase

/** The local blocking path chains oversized groups along a sort order
  * that MUST match the distributed path's Window orderBy (Spark compares
  * strings as UTF-8 bytes = code points). Java's String.compareTo
  * compares UTF-16 code units, which inverts supplementary-plane
  * characters (surrogate range 0xD800-0xDFFF) against [U+E000, U+FFFF]
  * — this spec pins the custom ordering to Spark's, including exactly
  * that divergence case.
  */
class BlockingOrderSpec extends SparkSpecBase {
  import spark.implicits._

  private val tricky = Seq(
    " private-use",                                   // U+E000
    new String(Character.toChars(0x10000)) + " linear-b",   // U+10000
    "plain ascii",
    "Plain Ascii",
    "� replacement",                                   // U+FFFD
    "zürich",                                          // U+00FC
    new String(Character.toChars(0x1F600)),                 // U+1F600
    "",
    "a",
    " control")

  test("codePointOrdering matches Spark's string sort order, including supplementary planes") {
    val sparkOrder = tricky.toDF("s").orderBy("s").as[String].collect().toSeq
    val localOrder = tricky.sorted(Blocking.codePointOrdering)
    assert(localOrder === sparkOrder)

    // the specific divergence Java ordering would produce: a surrogate-
    // encoded U+10000 sorts BELOW U+E000 under compareTo, above under
    // code points
    val hi = new String(Character.toChars(0x10000))
    assert("".compareTo(hi) > 0, "Java code-unit order inverts this pair")
    assert(Blocking.codePointOrdering.compare("", hi) < 0)
  }
}
