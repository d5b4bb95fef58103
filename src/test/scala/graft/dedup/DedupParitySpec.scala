package graft.dedup

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** Oracle-parity and bounded-miss contracts for the dedup operators:
  * the probabilistic candidate generators (MinHash-LSH 32×2, SimHash
  * banded Hamming) followed by exact-Jaccard verification must emit
  * exactly the all-pairs baseline on the fixture corpus (this is what
  * lets the driver hash-compare qdd4/qdd5 against the same DuckDB SQL
  * as qdd2), and the df-capped inverted index must drop ubiquitous
  * shingles loudly without ever inventing pairs.
  */
class DedupParitySpec extends SparkSpecBase {
  import spark.implicits._

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("LSH-verified and SimHash-verified pairs equal the exact all-pairs baseline") {
    val corpus = Dedup.corpusWithCopies(spark, sf1)
    val exact = pairSet(Dedup.allPairsJaccard(spark, corpus))
    assert(exact.nonEmpty)
    val lsh = pairSet(Dedup.minhashLshPairs(spark, corpus))
    assert(lsh === exact, s"LSH missing=${(exact -- lsh).take(3)} extra=${(lsh -- exact).take(3)}")
    val sim = pairSet(Dedup.simhashVerifiedPairs(spark, corpus))
    assert(sim === exact, s"SimHash missing=${(exact -- sim).take(3)} extra=${(sim -- exact).take(3)}")
  }

  test("df-cap prunes ubiquitous shingles: never invents pairs, loses only boilerplate-overlap pairs") {
    // 30 docs sharing heavy boilerplate + unique tails; docs 100/101 are
    // exact copies of each other with a mostly-unique body.
    val boiler = (0 until 20).map(i => s"b$i").mkString(" ")
    val uniqueBody = (0 until 40).map(i => s"u$i").mkString(" ")
    val docs =
      (0L until 30L).map(i => (i, s"$boiler tail$i x$i y$i")) ++
        Seq((100L, s"b0 b1 b2 $uniqueBody"), (101L, s"b0 b1 b2 $uniqueBody"))
    val corpus = docs.toDF("doc_id", "text")

    // uncapped: boilerplate-heavy docs all pair up
    val uncapped = pairSet(Dedup.allPairsJaccard(spark, corpus, maxDf = 100000))
    assert(uncapped.contains((100L, 101L)))
    assert(uncapped.exists { case (a, b) => a < 30 && b < 30 },
      "boilerplate similarity passes the threshold uncapped")

    // capped: boilerplate shingles (df ~ 30) leave the index; the copy
    // pair survives on its distinctive body, cross pairs disappear
    val capped = pairSet(Dedup.allPairsJaccard(spark, corpus, maxDf = 10))
    assert(capped.contains((100L, 101L)), "distinctive-overlap pair must survive the cap")
    assert(!capped.exists { case (a, b) => a < 30 && b < 30 },
      "boilerplate-only pairs are the documented bounded miss")
    assert(capped.subsetOf(uncapped), "the cap can only remove pairs, never invent them")
  }

  test("band-bucket chain cap: a mass-duplicated group yields linear pairs but one connected cluster") {
    // Adversarial 100 TB shape: one boilerplate page duplicated far past
    // MaxBandBucket. Every band bucket holds the whole group; uncapped
    // LSH would emit O(m²) ≈ 3.1M candidate pairs — the chain cap must
    // emit exactly the m−1 sort-adjacent pairs per band (distinct across
    // bands), and CC must still close the group into ONE cluster.
    val m = Dedup.MaxBandBucket + 1500
    val text = (0 until 8).map(i => s"w$i").mkString(" ")
    val corpus = (0L until m.toLong).map(i => (i, text)).toDF("doc_id", "text")

    val lsh = Dedup.minhashLshPairs(spark, corpus)
    val lshPairs = pairSet(lsh)
    assert(lshPairs.size === m - 1,
      s"expected ${m - 1} chain pairs, got ${lshPairs.size}")
    assert(lshPairs.forall { case (a, b) => b == a + 1 },
      "chain pairs are sort-adjacent")

    val sim = Dedup.simhashVerifiedPairs(spark, corpus)
    assert(pairSet(sim).size === m - 1)

    val clusters = Dedup.clusters(spark, corpus, lsh).collect()
    assert(clusters.length === m)
    assert(clusters.forall(_.getLong(1) == 0L),
      "chain pairs keep the whole group one connected component")
  }

  test("keepBest: per-cluster argmax on tokens with min-doc_id tie-break; singletons kept") {
    // cluster {1,2,3}: doc 2 longest; cluster {5,6}: tie -> keep 5;
    // doc 9 is a singleton
    val corpus = Seq(
      (1L, "a b c"), (2L, "a b c d e"), (3L, "a b"),
      (5L, "x y z"), (6L, "p q r"), (9L, "solo doc"))
      .toDF("doc_id", "text")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (5L, 5L), (6L, 5L),
      (9L, 9L)).toDF("doc_id", "canonical")
    val got = Dedup.keepBest(corpus, clusters)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 2L, 5L, 3L), (5L, 5L, 3L, 2L), (9L, 9L, 2L, 1L)))
  }

  test("contamination: planted eval excerpts hit their source docs with exact shared counts") {
    // 30-word docs with disjoint vocabularies; eval items are word
    // windows of docs 1 and 3, plus one clean item that matches nothing
    def words(tag: String) = (0 until 30).map(i => s"$tag$i").mkString(" ")
    val train = Seq((1L, words("a")), (2L, words("b")), (3L, words("c")))
      .toDF("doc_id", "text")
    val evalDocs = Seq(
      (10L, (5 until 25).map(i => s"a$i").mkString(" ")), // 20 words of doc 1
      (11L, (0 until 13).map(i => s"c$i").mkString(" ")), // exactly one 13-gram
      (12L, words("z"))) // clean
      .toDF("eval_id", "text")
    val got = Dedup.contamination(train, evalDocs, n = 13, minShared = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // 20-word excerpt -> 8 distinct 13-grams, all present in doc 1
    assert(got === Map((1L, 10L) -> 8L, (3L, 11L) -> 1L))
    // broadcast and shuffle paths agree
    val shuffled = Dedup.contamination(train, evalDocs, n = 13,
      minShared = 1L, broadcastEval = false)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(shuffled === got)
    // minShared gates: requiring 2 shared n-grams drops the single-hit pair
    val gated = Dedup.contamination(train, evalDocs, n = 13, minShared = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gated === Set((1L, 10L)))

    // decontaminate: the per-doc decision table — doc 1 and 3 flagged
    // with their hit counts, doc 2 clean with zeros
    val dec = Dedup.decontaminate(train, evalDocs, n = 13, minShared = 1L)
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getLong(2), r.getLong(3)))).toMap
    assert(dec === Map(
      1L -> ((true, 1L, 8L)),
      2L -> ((false, 0L, 0L)),
      3L -> ((true, 1L, 1L))))
    // raising the gate de-flags the single-collision doc
    val dec2 = Dedup.decontaminate(train, evalDocs, n = 13, minShared = 2L)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(dec2 === Map(1L -> true, 2L -> false, 3L -> false))
  }
}
