package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ann.Knn
import graft.dedup.Dedup
import graft.kg.Corpus
import graft.multimodal.BinaryOps
import graft.text.TextStats

/** Driver-checkable training-data-pipeline queries: dedup, text
  * analysis, similarity search, multimodal plumbing.
  */
object DataOps {

  // ---- dedup --------------------------------------------------------------

  def qdd1ExactDedup(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.exactDupGroups(Dedup.corpusWithCopies(spark, sfDir))

  def qdd2NearDupAllPairs(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.allPairsJaccard(spark, Dedup.corpusWithCopies(spark, sfDir))

  /** Benchmark decontamination over a PLANTED leak: every 13th document
    * donates words 11..60 as an "eval benchmark" item, so each eval doc
    * must collide with (at least) its source document on 13-grams. The
    * oracle rebuilds the same eval set and recomputes the shared-n-gram
    * counts relationally — ground truth, not Spark parity.
    */
  def qdc1Contamination(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = TextStats.docs(spark, sfDir).select(col("doc_id"), col("text"))
    val evalDocs = docs.filter(col("doc_id") % 13 === 0)
      .select(col("doc_id").as("eval_id"),
        array_join(slice(split(col("text"), " "), 11, 50), " ").as("text"))
    Dedup.contamination(docs, evalDocs, n = 13, minShared = 1L)
      .orderBy("train_id", "eval_id")
  }

  /** Decontamination decision table over the qdc1 leak plant: every
    * training doc with its eval-hit counts and the contaminated flag
    * (docs ≥ 13 shared 13-grams with a planted eval excerpt); clean
    * docs report zeros; see [[Dedup.decontaminate]].
    */
  def qdc2Decontaminate(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = TextStats.docs(spark, sfDir).select(col("doc_id"), col("text"))
    val evalDocs = docs.filter(col("doc_id") % 13 === 0)
      .select(col("doc_id").as("eval_id"),
        array_join(slice(split(col("text"), " "), 11, 50), " ").as("text"))
    Dedup.decontaminate(docs, evalDocs, n = 13, minShared = 13L)
      .orderBy("doc_id")
  }

  def qdd3DedupClusters(spark: SparkSession, sfDir: String): DataFrame = {
    val corpus = Dedup.corpusWithCopies(spark, sfDir)
    val pairs = Dedup.allPairsJaccard(spark, corpus)
    Dedup.clusters(spark, corpus, pairs)
  }

  /** MinHash-LSH near-dup detection (probabilistic candidates + exact
    * Jaccard verify). Oracle-backed: with 32×2 banding, candidate recall
    * on the fixture corpus is 1, so the verified output equals the exact
    * all-pairs baseline and DuckDB can recompute it relationally.
    * ScalaTest separately asserts recall ≥ 0.9 as the probabilistic
    * contract.
    */
  def qdd4MinhashLsh(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.minhashLshPairs(spark, Dedup.corpusWithCopies(spark, sfDir))

  /** SimHash near-dup detection: banded Hamming buckets as the candidate
    * generator + exact Jaccard verify — oracle-backed the same way as
    * qdd4. The raw Hamming-threshold variant (simhashPairs) remains
    * spec-pinned.
    */
  def qdd5Simhash(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.simhashVerifiedPairs(spark, Dedup.corpusWithCopies(spark, sfDir))

  /** Content-defined chunking dedup: CDC chunks ([[graft.dedup.Dedup
    * .cdcChunks]], boundary-word rule replayed exactly by the oracle)
    * → inverted-index join on chunk hashes → doc pairs sharing ≥ 2
    * distinct chunks. The perturbed near-copies (every 17th word
    * replaced) still share every untouched chunk; the df-cap drop of
    * boilerplate chunks is part of the proven semantics.
    */
  def qdd6CdcPairs(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.cdcSharedPairs(spark, Dedup.corpusWithCopies(spark, sfDir))

  /** Near-dup removal with representative selection: per cluster keep
    * the most-token member (tie → smallest doc_id); see
    * [[graft.dedup.Dedup.keepBest]]. On the planted corpus every near/
    * exact copy ties its original on token count, so the tie-break is
    * load-bearing and the oracle proves it.
    */
  def qdd7KeepBest(spark: SparkSession, sfDir: String): DataFrame = {
    val corpus = Dedup.corpusWithCopies(spark, sfDir)
    Dedup.keepBest(corpus, Dedup.clusters(spark, corpus,
      Dedup.allPairsJaccard(spark, corpus), sorted = false))
  }

  // ---- events --------------------------------------------------------------

  /** Clickstream sessionization over the events table: 8-hour
    * inactivity timeout, per-session integer aggregates (epoch-micro
    * bounds, event counts) — see [[graft.events.Sessionize.sessions]].
    */
  def qev1Sessionize(spark: SparkSession, sfDir: String): DataFrame =
    graft.events.Sessionize.sessions(
      graft.events.Sessionize.events(spark, sfDir), gapSec = 28800L)

  /** Cohort retention over the events table — (first-active-day cohort,
    * day offset) active-user counts; see
    * [[graft.events.EventAnalytics.retention]].
    */
  def qev2Retention(spark: SparkSession, sfDir: String): DataFrame =
    graft.events.EventAnalytics.retention(
      graft.events.Sessionize.events(spark, sfDir))

  /** Ordered funnel view → click → purchase with first-touch anchors;
    * see [[graft.events.EventAnalytics.funnel]].
    */
  def qev3Funnel(spark: SparkSession, sfDir: String): DataFrame =
    graft.events.EventAnalytics.funnel(
      graft.events.Sessionize.events(spark, sfDir),
      Seq("view", "click", "purchase"))

  /** Exact p25/p50/p75 of event values per type by rank selection
    * (values are INPUT doubles, never interpolations); see
    * [[graft.events.EventAnalytics.quantiles]].
    */
  def qev4Quantiles(spark: SparkSession, sfDir: String): DataFrame =
    graft.events.EventAnalytics.quantiles(
      graft.events.Sessionize.events(spark, sfDir),
      group = "event_type", value = "value", tiebreak = "event_id",
      pcts = Seq(25, 50, 75))

  /** Last-touch attribution: each purchase joined as-of to the latest
    * view by the same user at-or-before it (union + carry-forward, not
    * a range join); see [[graft.events.EventAnalytics.asofJoin]].
    */
  def qev5Asof(spark: SparkSession, sfDir: String): DataFrame = {
    val typed = graft.events.Sessionize.events(spark, sfDir)
      .select(col("event_id"), unix_micros(col("ts")).as("us"),
        col("user_id"), col("event_type"))
    val purchases = typed.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("us").as("purchase_us"),
        col("user_id"))
    val views = typed.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("us").as("view_us"),
        col("user_id"))
    graft.events.EventAnalytics.asofJoin(purchases, views, key = "user_id",
        leftTime = "purchase_us", rightTime = "view_us",
        leftTie = "purchase_id", rightTie = "view_id",
        rightPayload = Seq("view_id", "view_us"))
      .select(col("purchase_id"), col("user_id"), col("purchase_us"),
        col("asof_view_id").as("view_id"), col("asof_view_us").as("view_us"))
      .orderBy("purchase_id")
  }

  /** Trailing 7-day rolling distinct active users per day via the
    * interval-disjointness explode (map-side-combinable exact distinct);
    * see [[graft.events.EventAnalytics.rollingActiveUsers]].
    */
  def qev6RollingActive(spark: SparkSession, sfDir: String): DataFrame =
    graft.events.EventAnalytics.rollingActiveUsers(
      graft.events.Sessionize.events(spark, sfDir), windowDays = 7)

  /** Daily LOCF gap fill: each user's per-day last value carried
    * forward across inactive days; see
    * [[graft.events.EventAnalytics.dailyLocf]].
    */
  def qev7Locf(spark: SparkSession, sfDir: String): DataFrame =
    graft.events.EventAnalytics.dailyLocf(
      graft.events.Sessionize.events(spark, sfDir))

  /** HyperLogLog register table over doc_id — exact integer sketch
    * state, engine-reproducible; see
    * [[graft.sketch.Sketches.hllRegisters]].
    */
  def qsk1HllRegisters(spark: SparkSession, sfDir: String): DataFrame =
    graft.sketch.Sketches.hllRegisters(
      TextStats.docs(spark, sfDir).select(col("doc_id")), key = "doc_id")

  /** Distributed CMS point estimates for the 20 most frequent tokens
    * (count desc, term tiebreak) joined with their true counts — the
    * estimate ≥ truth upper-bound contract as data; see
    * [[graft.sketch.Sketches.cmsPointEstimates]].
    */
  def qsk3CmsEstimates(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = TextStats.docs(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("term"))
    val probes = toks.groupBy("term").agg(count(lit(1)).as("true_cnt"))
      .orderBy(col("true_cnt").desc, col("term")).limit(20)
    val counters = graft.sketch.Sketches.cmsCounters(toks, key = "term")
    graft.sketch.Sketches.cmsPointEstimates(counters, probes.select("term"),
        key = "term")
      .join(probes, "term")
      .select(col("term"), col("true_cnt"), col("cms_est"))
      .orderBy("term")
  }

  /** Weighted sample of 50 orders by total price (A-Res priorities,
    * bit-identical doubles); see
    * [[graft.sample.Sampling.weightedSample]].
    */
  def qsp6WeightedSample(spark: SparkSession, sfDir: String): DataFrame =
    graft.sample.Sampling.weightedSample(
      spark.read.parquet(s"$sfDir/orders.parquet")
        .select(col("o_orderkey"), col("o_totalprice")),
      col("o_orderkey"), col("o_totalprice"), k = 50)
      .orderBy(col("sample_priority").desc, col("o_orderkey"))

  /** Per-event-type HLL user sketches — approximate distinct users per
    * dimension value as engine-exact register state; see
    * [[graft.sketch.Sketches.hllRegistersBy]].
    */
  def qsk8HllByType(spark: SparkSession, sfDir: String): DataFrame =
    graft.sketch.Sketches.hllRegistersBy(
      spark.read.parquet(s"$sfDir/events.parquet")
        .select(col("event_type"), col("user_id")),
      group = "event_type", key = "user_id")

  /** HLL audience overlap by inclusion–exclusion: distinct viewers,
    * distinct purchasers, their union sketch (register MAX), and
    * overlap = a + b − union — the cross-segment audience arithmetic
    * HLL supports WITHOUT storing pairs (intersections aren't
    * mergeable; inclusion–exclusion over union sketches is the standard
    * workaround). Raw estimator → every double engine-reproducible; see
    * [[graft.sketch.Sketches.rawEstimateCol]].
    */
  def qsk9HllOverlap(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.sketch.Sketches
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_type"), col("user_id"))
    def regs(t: String) = Sketches.hllRegisters(
      ev.filter(col("event_type") === t).select(col("user_id")), "user_id")
    def est(df: DataFrame, name: String) =
      df.agg(Sketches.rawEstimateCol(col("bucket"), col("max_rank"))
        .as(name))
    // eager checkpoint: each sketch is ≤ 256 rows but its LINEAGE ends
    // in a full events scan — est() and the merge would otherwise
    // re-execute it (4 scans per query)
    val a = regs("view").localCheckpoint(true)
    val b = regs("purchase").localCheckpoint(true)
    val u = Sketches.hllMerge(Seq(a, b))
    est(a, "est_view").crossJoin(est(b, "est_purchase"))
      .crossJoin(est(u, "est_union"))
      .withColumn("est_overlap",
        col("est_view") + col("est_purchase") - col("est_union"))
  }

  /** HLL mergeability as data: two half-corpus register tables (even /
    * odd doc_ids) merged by elementwise MAX must equal the whole-corpus
    * sketch — the distributed-combine property; see
    * [[graft.sketch.Sketches.hllMerge]]. The oracle is qsk1's
    * whole-corpus register SQL, so the merge path is proven equivalent,
    * not replayed.
    */
  def qsk6HllMerge(spark: SparkSession, sfDir: String): DataFrame = {
    val ids = TextStats.docs(spark, sfDir).select(col("doc_id"))
    val halves = Seq(0, 1).map(r =>
      graft.sketch.Sketches.hllRegisters(
        ids.filter(col("doc_id") % 2 === r), key = "doc_id"))
    graft.sketch.Sketches.hllMerge(halves)
  }

  /** Histogram sketch (64 bins on [0, 20)) over event values — integer
    * bin counts, mergeable by sum; see
    * [[graft.sketch.Sketches.histogram]].
    */
  def qsk7Histogram(spark: SparkSession, sfDir: String): DataFrame =
    graft.sketch.Sketches.histogram(
      spark.read.parquet(s"$sfDir/events.parquet"),
      col("value"), lo = 0.0, hi = 20.0, bins = 64)

  /** Bloom-filter 1-bit positions for the urgent-order key set — the
    * sketch state as data, integer-exact like the HLL/CMS queries; see
    * [[graft.sketch.Sketches.bloomBits]].
    */
  def qsk4BloomBits(spark: SparkSession, sfDir: String): DataFrame =
    graft.sketch.Sketches.bloomBits(
      spark.read.parquet(s"$sfDir/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey")),
      key = "o_orderkey", numBits = 1 << 16, numHashes = 3)

  /** Bloom-pre-filtered exact semi-join: lineitem rows of urgent orders,
    * aggregated per returnflag — the output is the exact semi-join (the
    * bloom layer only prunes the shuffle input); see
    * [[graft.sketch.Sketches.bloomSemiJoin]].
    */
  def qsk5BloomSemijoin(spark: SparkSession, sfDir: String): DataFrame = {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val urgent = spark.read.parquet(s"$sfDir/orders.parquet")
      .filter(col("o_orderpriority") === "1-URGENT")
    graft.sketch.Sketches
      .bloomSemiJoin(li, "l_orderkey", urgent, "o_orderkey",
        numBits = 1 << 16, numHashes = 3)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
          .as("sum_qty"))
      .orderBy("l_returnflag")
  }

  /** Funnel latency: per converting user, the gap between their first
    * view and first at-or-after purchase; see
    * [[graft.events.EventAnalytics.timeToConvert]].
    */
  def qev11TimeToConvert(spark: SparkSession, sfDir: String): DataFrame =
    graft.events.EventAnalytics.timeToConvert(
      graft.events.Sessionize.events(spark, sfDir), "view", "purchase")

  /** Token-budget mixture sample: en capped at 40k tokens, de at 15k,
    * es uncapped (budget above its total — keep-all edge), fr/zh absent
    * from the recipe (dropped); see
    * [[graft.sample.Sampling.tokenBudgetSample]].
    */
  def qsp8TokenBudget(spark: SparkSession, sfDir: String): DataFrame =
    graft.sample.Sampling.tokenBudgetSample(
        TextStats.docs(spark, sfDir)
          .select(col("doc_id"), col("lang"),
            TextStats.nTokensCol(col("text")).as("n_tok")),
        stratum = "lang", key = col("doc_id"), tokens = col("n_tok"),
        budgets = Map("en" -> 40000L, "de" -> 15000L, "es" -> 100000000L))
      .select(col("lang"), col("k").as("doc_id"), col("n_tokens"),
        col("cum_before"))
      .orderBy("lang", "doc_id")

  /** Deterministic per-epoch shuffled ordering (2 epochs, 256 shards):
    * the reproducible training-batch order; see
    * [[graft.sample.Sampling.epochOrder]].
    */
  def qsp7EpochOrder(spark: SparkSession, sfDir: String): DataFrame =
    graft.sample.Sampling.epochOrder(
        spark.read.parquet(s"$sfDir/documents.parquet")
          .select(col("doc_id").cast("long").as("doc_id")),
        col("doc_id"), epochs = 2)
      .select(col("epoch").cast("bigint").as("epoch"), col("shard"),
        col("k").as("doc_id"), col("ord").cast("bigint").as("ord"))
      .orderBy("epoch", "shard", "ord")

  /** RFM user segmentation over the events table — recency/frequency/
    * monetary with NTILE(5) quintile scores, deterministic tie-breaks;
    * see [[graft.events.EventAnalytics.rfm]].
    */
  def qev10Rfm(spark: SparkSession, sfDir: String): DataFrame =
    graft.events.EventAnalytics.rfm(
      graft.events.Sessionize.events(spark, sfDir))

  /** SCD Type-2 validity intervals from the event change log: each
    * event's value is valid until the user's next event, the last one
    * open-ended and flagged current; see
    * [[graft.events.EventAnalytics.scd2]].
    */
  def qev9Scd2(spark: SparkSession, sfDir: String): DataFrame =
    graft.events.EventAnalytics.scd2(
      graft.events.Sessionize.events(spark, sfDir)
        .select(col("user_id"), col("ts"), col("event_id"), col("value")),
      key = "user_id", tsCol = "ts", tiebreak = "event_id")
      .select(col("user_id"), col("event_id"), col("value"),
        col("valid_from_us"), col("valid_to_us"), col("is_current"))
      .orderBy("user_id", "valid_from_us", "event_id")

  /** Event-type transition counts with exact-integer-ratio
    * probabilities; see [[graft.events.EventAnalytics.transitions]].
    */
  def qev8Transitions(spark: SparkSession, sfDir: String): DataFrame =
    graft.events.EventAnalytics.transitions(
      graft.events.Sessionize.events(spark, sfDir))

  /** Deterministic 80/10/10 train/val/test assignment over doc_id;
    * see [[graft.sample.Sampling.assignSplits]].
    */
  def qsp4Splits(spark: SparkSession, sfDir: String): DataFrame =
    graft.sample.Sampling.assignSplits(
      TextStats.docs(spark, sfDir).select(col("doc_id")), key = "doc_id",
      fractions = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .orderBy("doc_id")

  /** Deterministic negative sampling over the closed-form mention pairs
    * (doc → doc_id%1000 and (7·doc_id+3)%1000): 4 hash draws per
    * positive from the 1000-entity space, accidental positives
    * anti-joined away; see [[graft.sample.Sampling.hashNegatives]].
    */
  def qsp5Negatives(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"))
    val pos = docs.select(col("doc_id"), (col("doc_id") % 1000).as("entity"))
      .unionByName(docs.select(col("doc_id"),
        ((col("doc_id") * 7 + 3) % 1000).as("entity")))
    graft.sample.Sampling.hashNegatives(pos, "doc_id", "entity", 1000L, 4)
      .orderBy("doc_id", "entity", "draw")
  }

  /** Count-Min Sketch counters (4×1024) over whitespace tokens — exact
    * integer sketch state; see [[graft.sketch.Sketches.cmsCounters]].
    */
  def qsk2CmsCounters(spark: SparkSession, sfDir: String): DataFrame =
    graft.sketch.Sketches.cmsCounters(
      TextStats.docs(spark, sfDir)
        .select(explode(split(col("text"), " ")).as("term")),
      key = "term")

  // ---- text analysis ------------------------------------------------------

  def qtx1Tokens(spark: SparkSession, sfDir: String): DataFrame =
    TextStats.tokenCounts(TextStats.docs(spark, sfDir))

  def qtx2Quality(spark: SparkSession, sfDir: String): DataFrame =
    TextStats.quality(TextStats.docs(spark, sfDir))

  def qtx3LangId(spark: SparkSession, sfDir: String): DataFrame =
    TextStats.langId(TextStats.docs(spark, sfDir))

  def qtx4Fingerprint(spark: SparkSession, sfDir: String): DataFrame =
    TextStats.fingerprintMd5(TextStats.docs(spark, sfDir))

  /** Rabin rolling polynomial fingerprints — oracle-backed: the hash is
    * (h·257 + c) mod 2⁶¹−1 over UTF-16 code units, which DuckDB
    * recomputes exactly with a HUGEINT list_reduce (the corpus is BMP
    * text, where code units and codepoints coincide).
    */
  def qtx5Rabin(spark: SparkSession, sfDir: String): DataFrame =
    TextStats.rabinFingerprints(spark, TextStats.docs(spark, sfDir))

  /** Token-window chunking (size 32, stride 24 → 8-token overlap); chunk
    * content is value-pinned via md5 so the oracle checks the exact
    * chunk text without shipping it.
    */
  def qtx6Chunks(spark: SparkSession, sfDir: String): DataFrame =
    TextStats.chunkTokens(TextStats.docs(spark, sfDir))

  /** PII redaction over documents with deterministically planted
    * email/IP/phone strings (doc_id arithmetic, so the oracle replants
    * them exactly); counts computed pre-mask, redacted text value-pinned
    * via md5.
    */
  def qtx7Redact(spark: SparkSession, sfDir: String): DataFrame = {
    val planted = TextStats.docs(spark, sfDir).select(col("doc_id"),
      concat(col("text"),
        lit(" contact user"), col("doc_id"), lit("@mail"), col("doc_id") % 7,
        lit(".example or 10."), col("doc_id") % 256, lit(".0."),
        col("doc_id") % 100, lit(" ext 555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0")).as("text"))
    TextStats.redactPii(planted)
  }

  /** Corpus-level bigram-support quality score (two-pass corpus
    * statistic: bigram document frequencies joined back per document).
    */
  def qtx8BigramSupport(spark: SparkSession, sfDir: String): DataFrame =
    TextStats.bigramSupport(TextStats.docs(spark, sfDir))

  /** Top-3 distinctive terms per document by the integer-exact
    * tf·(10⁶ div df) score — log-free TF-IDF ranking, value-checkable.
    */
  def qtx9DistinctiveTerms(spark: SparkSession, sfDir: String): DataFrame =
    TextStats.distinctiveTerms(TextStats.docs(spark, sfDir))

  /** Per-document repetition/boilerplate signals (top-token frequency,
    * duplicated-3-gram occupancy) — the Gopher-style spam heuristics;
    * see [[TextStats.repetitionSignals]].
    */
  def qtx11Repetition(spark: SparkSession, sfDir: String): DataFrame =
    TextStats.repetitionSignals(TextStats.docs(spark, sfDir))

  /** Inverted-index build stats per term (posting count, document
    * frequency, order-free posting fingerprint); see
    * [[TextStats.invertedIndex]].
    */
  def qtx12Postings(spark: SparkSession, sfDir: String): DataFrame =
    TextStats.invertedIndex(TextStats.docs(spark, sfDir))

  /** Skip-gram (window 2) positive-PMI co-occurrence pairs — the
    * word2vec training-pair matrix, engine-portable log on integer
    * products; see [[TextStats.skipgramPpmi]].
    */
  def qtx16SkipgramPpmi(spark: SparkSession, sfDir: String): DataFrame =
    TextStats.skipgramPpmi(TextStats.docs(spark, sfDir), window = 2)

  /** Self-trained bigram-LM quality score per document (add-one
    * smoothing, engine-portable polynomial log, sorted positional
    * fold); see [[TextStats.lmScore]].
    */
  def qtx15LmScore(spark: SparkSession, sfDir: String): DataFrame =
    TextStats.lmScore(TextStats.docs(spark, sfDir))

  /** BM25 top-20 for the fixed query {dup, spark, join} — 'dup' is the
    * discriminative term (df ≈ 5% at every scale, so its idf is positive
    * and dominates; the common terms exercise BM25's negative-idf
    * saturation regime) — bit-identical
    * doubles like qkg10 (exact-integer inputs, correctly-rounded ln,
    * sorted per-doc term fold); see [[TextStats.bm25]].
    */
  def qtx14Bm25(spark: SparkSession, sfDir: String): DataFrame =
    TextStats.bm25(TextStats.docs(spark, sfDir),
      Seq("dup", "spark", "join"))

  /** Cross-document segment dedup (C4-style repeated-span removal) over
    * the planted-copy corpus: every segment text is kept only at its
    * first (doc_id, seg_idx) occurrence — exact copies lose every
    * segment, near copies every segment without a perturbed word; see
    * [[TextStats.segmentDedup]].
    */
  def qtx17SegmentDedup(spark: SparkSession, sfDir: String): DataFrame =
    TextStats.segmentDedup(Dedup.corpusWithCopies(spark, sfDir))

  /** Corpus novelty over the planted-copy corpus: originals introduce
    * their grams; exact copies score 0, near copies are novel only at
    * their perturbed positions; see [[TextStats.noveltyScore]].
    */
  def qtx21Novelty(spark: SparkSession, sfDir: String): DataFrame =
    TextStats.noveltyScore(Dedup.corpusWithCopies(spark, sfDir))

  /** Per-source corpus profile over the documents table's `source`
    * dimension; see [[TextStats.sourceProfile]].
    */
  def qtx20SourceProfile(spark: SparkSession, sfDir: String): DataFrame =
    TextStats.sourceProfile(
      spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("source"), col("lang"), col("text")))

  /** Vocabulary growth curve at fixed token checkpoints under the
    * canonical (doc_id, position) global order — the Heaps'-law
    * profile; see [[TextStats.vocabGrowth]].
    */
  def qtx19VocabGrowth(spark: SparkSession, sfDir: String): DataFrame =
    TextStats.vocabGrowth(TextStats.docs(spark, sfDir))

  /** First 3 BPE merges over the corpus vocabulary (tokenizer
    * training): most-frequent adjacent symbol pair per round
    * (lexicographic ties), greedy leftmost merge, vocabulary-size
    * trajectory; see [[TextStats.bpeMerges]].
    */
  def qtx18BpeMerges(spark: SparkSession, sfDir: String): DataFrame =
    TextStats.bpeMerges(TextStats.docs(spark, sfDir), iterations = 3)

  /** Corpus-df-driven token pruning: per-document class-wise counts
    * (keep / stop ≥ 30% df / rare df < 2) plus an md5 pin of the kept
    * text; see [[TextStats.dfPrune]].
    */
  def qtx13DfPrune(spark: SparkSession, sfDir: String): DataFrame =
    TextStats.dfPrune(TextStats.docs(spark, sfDir))

  /** URL canonicalization over planted messy URLs (case/port/utm/
    * fragment/root-slash variants by doc_id arithmetic); the oracle
    * recomputes the EXPECTED canonical form from the same arithmetic —
    * it never re-implements the normalizer, so the value check proves
    * [[TextStats.canonicalizeUrl]]'s rules, not SQL parity.
    */
  def qtx10UrlCanon(spark: SparkSession, sfDir: String): DataFrame = {
    val d = col("doc_id")
    val ds = d.cast("string")
    val scheme = when(d % 2 === 0, "HTTP").otherwise("https")
    // userinfo is case-SENSITIVE (RFC 3986 §6.2.2.1 lowers only scheme +
    // host) — planted mixed-case so the oracle proves it survives intact
    val userinfo = when(d % 11 === 0, "UsEr@").otherwise("")
    val host = concat(lit("ExAmple"), (d % 100).cast("string"), lit(".CoM"))
    val port = when(d % 3 === 0, when(d % 2 === 0, ":80").otherwise(":443"))
      .when(d % 3 === 1, ":8080").otherwise("")
    val path = when(d % 7 === 0, "").when(d % 7 === 1, "/")
      .otherwise(concat(lit("/P"), ds))
    val query = when(d % 4 === 0, concat(lit("?utm_source=x&id="), ds))
      .when(d % 4 === 1, "?utm_a=1&utm_b=2")
      .when(d % 4 === 2, concat(lit("?id="), ds))
      .otherwise("")
    val frag = when(d % 5 === 0, "#Frag").otherwise("")
    val raw = concat(scheme, lit("://"), userinfo, host, port, path, query,
      frag)
    TextStats.docs(spark, sfDir)
      .select(col("doc_id"), raw.as("raw_url"),
        TextStats.canonicalizeUrl(raw).as("url"))
      .orderBy("doc_id")
  }

  /** Deterministic Bernoulli sample (rate 0.25) by content hash — the
    * reproducible training-data subsampling primitive.
    */
  def qsp1HashSample(spark: SparkSession, sfDir: String): DataFrame =
    graft.sample.Sampling.hashSample(
      TextStats.docs(spark, sfDir).select(col("doc_id"), col("lang")),
      col("doc_id"), 0.25).orderBy("doc_id")

  /** Stratified fixed quota (20 docs per language) in content-hash order
    * — the dataset-mixing primitive (fixed per-source quotas).
    */
  def qsp2Stratified(spark: SparkSession, sfDir: String): DataFrame =
    graft.sample.Sampling.stratifiedQuota(
      TextStats.docs(spark, sfDir).select(col("doc_id"), col("lang")),
      col("lang"), col("doc_id"), 20)
      .select(col("lang"), col("doc_id"), col("sample_rank"))
      .orderBy("lang", "sample_rank")

  /** Per-stratum rate sampling (temperature mixing): en kept at 0.5,
    * de at 0.25, es at 1.0; strata not named in the mix spec (fr, und)
    * are DROPPED — allowlist semantics; see
    * [[graft.events.EventAnalytics.mixByRates]].
    */
  def qsp3MixRates(spark: SparkSession, sfDir: String): DataFrame =
    graft.sample.Sampling.mixByRates(
      TextStats.docs(spark, sfDir).select(col("doc_id"), col("lang")),
      stratum = "lang", key = "doc_id",
      rates = Map("en" -> 0.5, "de" -> 0.25, "es" -> 1.0))
      .orderBy("doc_id")

  // ---- similarity search --------------------------------------------------

  val annQueryIds: Seq[Long] = (0L until 20L)
  val annK = 5

  def qann1TopK(spark: SparkSession, sfDir: String): DataFrame =
    Knn.bruteForceTopK(spark, Knn.embeddings(spark, sfDir), annQueryIds, annK)
      .select(col("query_id"), col("rank").cast("bigint").as("rank"),
        col("neighbor_id"))

  /** Filtered vector search — top-5 restricted to the query's own
    * label (k matching neighbors, never k-then-filter); see
    * [[Knn.filteredTopK]].
    */
  def qann9FilteredTopK(spark: SparkSession, sfDir: String): DataFrame =
    Knn.filteredTopK(spark, Knn.embeddings(spark, sfDir), annQueryIds, annK)
      .select(col("query_id"), col("rank").cast("bigint").as("rank"),
        col("neighbor_id"), col("label"))

  def qann2PairsAbove(spark: SparkSession, sfDir: String): DataFrame =
    Knn.pairsAbove(spark, Knn.embeddings(spark, sfDir), 0.42)

  /** LSH-bucketed ANN — fully oracle-backed since the hyperplanes moved
    * to an integer-LCG construction expressible in ANSI SQL
    * ([[graft.ann.Knn.planeComp]]): DuckDB recomputes the planes, sign
    * sketches, bucket joins and final cosine ranking value-for-value.
    * The probabilistic recall contract vs brute force stays asserted in
    * ScalaTest.
    */
  def qann3LshTopK(spark: SparkSession, sfDir: String): DataFrame =
    Knn.lshTopK(spark, Knn.embeddings(spark, sfDir), annQueryIds, annK)
      .select(col("query_id"), col("rank").cast("bigint").as("rank"),
        col("neighbor_id"))

  /** IVF-Flat ANN with sampled centroids — fully oracle-backed: the
    * centroid sample, cell assignment, probe set, and final ranking are
    * all deterministic and recomputed value-for-value by the DuckDB
    * oracle.
    */
  def qann4IvfTopK(spark: SparkSession, sfDir: String): DataFrame =
    Knn.ivfTopK(spark, Knn.embeddings(spark, sfDir), annQueryIds, annK)
      .select(col("query_id"), col("rank").cast("bigint").as("rank"),
        col("neighbor_id"))

  /** Product-quantization codes per (vector, subspace) — deterministic
    * sampled codebooks, double-exact squared-L2 assignment; fully
    * oracle-backed like qann4; see [[Knn.pqCodes]].
    */
  def qann6PqCodes(spark: SparkSession, sfDir: String): DataFrame =
    Knn.pqCodes(spark, Knn.embeddings(spark, sfDir))
      .select(col("vec_id"), col("sub"), col("code"))
      .orderBy("vec_id", "sub")

  /** Asymmetric-distance top-k over the PQ codes — the compressed-domain
    * search pass (query uncompressed, corpus read as codes only); fully
    * oracle-backed: distance tables, code lookups and the subspace-
    * ordered fold are all replayed by the SQL; see [[Knn.adcTopK]].
    */
  def qann7AdcTopK(spark: SparkSession, sfDir: String): DataFrame =
    Knn.adcTopK(spark, Knn.embeddings(spark, sfDir), annQueryIds, annK)

  /** IVF-PQ search — cell pruning + compressed-domain ADC ranking, the
    * full production index shape; fully oracle-backed; see
    * [[Knn.ivfPqTopK]].
    */
  def qann8IvfPq(spark: SparkSession, sfDir: String): DataFrame =
    Knn.ivfPqTopK(spark, Knn.embeddings(spark, sfDir), annQueryIds, annK)

  /** Embedding-space near-dup CLUSTERS: cosine-threshold pairs (qann2's
    * exact baseline) closed into connected components — the embedding
    * analog of qdd3's shingle-based dedup clusters, giving the dedup
    * suite the same pair→cluster symmetry in both text and vector space.
    * At 100 TB the pair generator swaps to the LSH/IVF candidate paths;
    * the CC loop is the same large-star/small-star iteration either way.
    * Fully oracle-backed (pairs via list_cosine_similarity + recursive-
    * CTE min-label propagation in DuckDB).
    */
  def qann5EmbedClusters(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Knn.embeddings(spark, sfDir)
    // unsorted intermediates: the only sort this query needs is the final
    // presentation orderBy — pair and cluster sorts would be shuffled away
    val pairs = Knn.pairsAbove(spark, emb, 0.42, sorted = false)
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
    Dedup.clusters(spark, emb.select(col("vec_id").as("doc_id")), pairs,
        sorted = false)
      .select(col("doc_id").as("vec_id"), col("canonical"))
      .orderBy("vec_id")
  }

  // ---- multimodal ---------------------------------------------------------

  /** Binary media metadata over opaque payload columns (stubbed decode,
    * real plumbing). The stand-in payloads are the documents table's
    * UTF-8 bytes — exactly as opaque to the decoder as image bytes, and
    * (unlike the rendered-HTML variant this replaces) byte-reproducible
    * in SQL, so the ENTIRE metadata row — length, MD5 content hash and
    * the stub's derived width/height/frames — is value-checked by a
    * DuckDB oracle. The html-payload path stays exercised in
    * DataOpsSpec's frame-sampling test.
    */
  def qmm1MediaMeta(spark: SparkSession, sfDir: String): DataFrame = {
    val media = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(concat(lit("doc://"), col("doc_id").cast("string")).as("url"),
        encode(col("text"), "UTF-8").as("payload"))
    BinaryOps.extractMeta(spark, media).toDF()
      .orderBy("url")
  }

  /** qmm2: REAL image-header parsing — plant deterministic PNG/GIF/BMP/
    * JPEG headers (format cycles by doc_id, dims are doc_id arithmetic)
    * and recover format+dimensions through [[BinaryOps.imageDims]]'
    * byte-level parsers. Builder and parser share no code: the oracle
    * recomputes the expected dims from doc_id, so a parser that misreads
    * endianness, offsets or marker structure hash-mismatches.
    */
  def qmm2ImageDims(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ids = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long")).as[Long]
    val media = ids.map(id => ("img://" + id, imageBytes(id)))
      .toDF("url", "payload")
    BinaryOps.imageMeta(spark, media).toDF().orderBy("url")
  }

  /** qmm3: REAL RIFF/WAV header parsing — plant deterministic WAV
    * headers (channels/rate/bits/sample-count all doc_id arithmetic;
    * every 4th doc carries an odd-sized LIST chunk before fmt to
    * exercise RIFF even-padding) and recover the audio metadata through
    * [[BinaryOps.wavMeta]]'s chunk scan. Builder and parser share no
    * code: the oracle recomputes expected fields from doc_id, so a
    * parser that misreads chunk offsets, endianness or the padding rule
    * hash-mismatches.
    */
  def qmm3WavMeta(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ids = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long")).as[Long]
    val media = ids.map(id => ("wav://" + id, wavBytes(id)))
      .toDF("url", "payload")
    BinaryOps.audioMeta(spark, media).toDF().orderBy("url")
  }

  /** qmm4: magic-byte dispatch over a MIXED media column — payload kind
    * cycles image/WAV/raw-text by doc_id, and [[BinaryOps.sniffMeta]]
    * must route each to the right parser; the oracle recomputes the
    * unified metadata from doc_id arithmetic per branch.
    */
  def qmm4MediaDispatch(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val rows = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
    val media = rows.map { case (id, text) =>
      val payload = (id % 3) match {
        case 0 => imageBytes(id)
        case 1 => wavBytes(id)
        case _ => text.getBytes("UTF-8")
      }
      ("mixed://" + id, payload)
    }.toDF("url", "payload")
    BinaryOps.sniffMeta(spark, media).toDF().orderBy("url")
  }

  /** qmm5: perceptual image near-dup over REAL PNG pixel decode — the
    * image analog of SimHash dedup, completing the multimodal story
    * past header parsing: plant arithmetically generated full PNGs
    * (real zlib streams, real CRCs, all five scanline filters cycled
    * per row; ids ≡ 1 (mod 4) are near-copies of id−1 with a sparse
    * +1-gray perturbation), decode through
    * [[BinaryOps.pngPixels]] (Inflater + defilter), dHash, and find
    * pairs within hamming ≤ 6 via the banded 4×16 join. The oracle
    * recomputes every dHash from the pixel FORMULA (never the PNG
    * bytes), so a decoder that misreads any filter, the zlib framing,
    * or the luma/downsample arithmetic hash-mismatches. Output also
    * carries each side's dhash so the pair evidence is auditable.
    */
  def qmm5ImageNearDup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ids = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long")).as[Long]
    val media = ids.map(id => ("png://" + id, pngBytes(id)))
      .toDF("url", "payload")
    val hashes = BinaryOps.imageHashes(spark, media).toDF()
    // pair order inside imageNearDupPairs is LEXICAL on urls; re-normalize
    // numerically so ("png://10","png://9") lands as (9, 10)
    BinaryOps.imageNearDupPairs(hashes, maxHamming = 6)
      .select(
        regexp_replace(col("a_url"), "png://", "").cast("bigint").as("ai"),
        regexp_replace(col("b_url"), "png://", "").cast("bigint").as("bi"),
        col("hamming"))
      .select(least(col("ai"), col("bi")).as("a_id"),
        greatest(col("ai"), col("bi")).as("b_id"), col("hamming"))
      .orderBy("a_id", "b_id")
  }

  /** qmm6: image dedup CLUSTERS with representative selection — the
    * removal decision on top of qmm5's pair evidence, completing the
    * image-dedup story the way qdd3/qdd7 complete the text one:
    * connected components over the near-dup pair graph
    * ([[graft.dedup.Dedup.clusters]] — driver union-find under the
    * bound, iterative star contraction above it), singleton images
    * mapping to themselves, min-id representative. One row per image:
    * (doc_id, canonical, n_imgs, is_rep).
    */
  def qmm6ImageClusters(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ids = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long")).as[Long]
    val media = ids.map(id => ("png://" + id, pngBytes(id)))
      .toDF("url", "payload")
    val hashes = graft.multimodal.BinaryOps.imageHashes(spark, media).toDF()
    val pairs = graft.multimodal.BinaryOps.imageNearDupPairs(hashes, 6)
      .select(
        regexp_replace(col("a_url"), "png://", "").cast("bigint").as("ai"),
        regexp_replace(col("b_url"), "png://", "").cast("bigint").as("bi"))
      .select(least(col("ai"), col("bi")).as("doc_a"),
        greatest(col("ai"), col("bi")).as("doc_b"))
    val cl = graft.dedup.Dedup.clusters(spark, ids.toDF("doc_id"), pairs,
      sorted = false)
    val sizes = cl.groupBy("canonical").agg(count(lit(1)).as("n_imgs"))
    cl.join(sizes, "canonical")
      .select(col("doc_id"), col("canonical"), col("n_imgs"),
        when(col("doc_id") === col("canonical"), 1L).otherwise(0L)
          .as("is_rep"))
      .orderBy("doc_id")
  }

  /** Test-scaffolding full-PNG builder (the corpus side of qmm5) — the
    * engine-side decode never sees this code; the oracle recomputes
    * pixels from the same id-arithmetic independently. Gray value at
    * (x, y) is `(x·7 + y·13 + x·y·((cid%13)+1) + cid·31 + (cid/256)·7
    * (+1 on the sparse (x+y)%7==0 lattice for near-copies)) mod 256` —
    * the x·y cross term and the /256 carry decorrelate hashes across
    * cids (a purely linear formula makes distinct images differ by a
    * constant gray offset, which lands unrelated pairs at small hamming
    * distances and cycles with period 8,960 — at a 50k-image soak that
    * quadratic near-collision mass cost 7 minutes; with the cross term
    * the pair set is the planted copies plus a thin chance tail). Even
    * cids encode as color type 0 (gray), odd as type 2 (RGB with
    * R=G=B, so integer luma is the identity); scanline filter cycles
    * `y mod 5` to exercise every defilter branch.
    */
  private[graft] def pngBytes(id: Long): Array[Byte] = {
    val cid = if (id % 4 == 1) id - 1 else id
    val pert = id % 4 == 1
    val w = (24 + (cid % 5) * 3).toInt
    val h = (16 + (cid % 7) * 2).toInt
    val colorType = if (cid % 2 == 0) 0 else 2
    val bpp = if (colorType == 0) 1 else 3
    def gray(x: Int, y: Int): Int =
      (((x * 7 + y * 13 + x * y * ((cid % 13) + 1) + cid * 31 +
        (cid / 256) * 7) % 256 +
        (if (pert && (x + y) % 7 == 0) 1 else 0)) % 256).toInt
    val stride = w * bpp
    val pix = new Array[Byte](h * stride)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until bpp)
      pix(y * stride + x * bpp + c) = gray(x, y).toByte
    // forward-filter each scanline (filter = y % 5) over ORIGINAL bytes
    val raw = new Array[Byte](h * (1 + stride))
    for (y <- 0 until h) {
      val ft = y % 5
      raw(y * (1 + stride)) = ft.toByte
      for (x <- 0 until stride) {
        val cur = pix(y * stride + x) & 0xff
        val a = if (x >= bpp) pix(y * stride + x - bpp) & 0xff else 0
        val up = if (y > 0) pix((y - 1) * stride + x) & 0xff else 0
        val c = if (x >= bpp && y > 0) pix((y - 1) * stride + x - bpp) & 0xff
          else 0
        val paeth = {
          val p = a + up - c
          val pa = math.abs(p - a); val pb = math.abs(p - up)
          val pc = math.abs(p - c)
          if (pa <= pb && pa <= pc) a else if (pb <= pc) up else c
        }
        val f = ft match {
          case 0 => cur
          case 1 => cur - a
          case 2 => cur - up
          case 3 => cur - (a + up) / 2
          case 4 => cur - paeth
        }
        raw(y * (1 + stride) + 1 + x) = (f & 0xff).toByte
      }
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val zbuf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!defl.finished()) zbuf.write(tmp, 0, defl.deflate(tmp))
    defl.end()
    def be32(v: Int) = Array[Byte]((v >>> 24).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val crc = new java.util.zip.CRC32()
      val t = typ.getBytes("US-ASCII")
      crc.update(t); crc.update(data)
      be32(data.length) ++ t ++ data ++ be32(crc.getValue.toInt)
    }
    val ihdr = be32(w) ++ be32(h) ++
      Array[Byte](8, colorType.toByte, 0, 0, 0)
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", zbuf.toByteArray) ++
      chunk("IEND", Array.emptyByteArray)
  }

  /** Test-scaffolding WAV builder (the corpus side of qmm3) — the
    * engine-side parse never sees this code. Sample payload bytes are
    * omitted (the data chunk declares its size; header sniffing never
    * reads samples).
    */
  private[graft] def wavBytes(id: Long): Array[Byte] = {
    val ch = (1 + id % 2).toInt
    val rate = (8000 * (1 + id % 5)).toInt
    val bits = (8 * (1 + id % 3)).toInt
    val n = (100 + id % 900).toInt
    val align = ch * bits / 8
    val byteRate = rate * align
    val dataSize = n * align
    def le16(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >>> 24) & 0xff).toByte)
    // odd-sized junk chunk (5 bytes + 1 pad) — the parser must hop the pad
    val junk = if (id % 4 == 0)
      "LIST".getBytes("US-ASCII") ++ le32(5) ++ Array[Byte](1, 2, 3, 4, 5, 0)
    else Array.emptyByteArray
    val fmt = "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++
      le16(ch) ++ le32(rate) ++ le32(byteRate) ++ le16(align) ++ le16(bits)
    val dataHdr = "data".getBytes("US-ASCII") ++ le32(dataSize)
    val riffSize = 4 + junk.length + fmt.length + dataHdr.length + dataSize
    "RIFF".getBytes("US-ASCII") ++ le32(riffSize) ++
      "WAVE".getBytes("US-ASCII") ++ junk ++ fmt ++ dataHdr
  }

  /** Test-scaffolding image builder (the corpus side of qmm2) — the
    * engine-side parse never sees this code. BMP ids ≡ 2 (mod 8) store a
    * NEGATIVE height (top-down row order) which the parser must abs.
    */
  private[graft] def imageBytes(id: Long): Array[Byte] = {
    val w = (100 + id % 900).toInt
    val h = (50 + id % 500).toInt
    def be16(v: Int) = Array[Byte](((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def be32(v: Int) = Array[Byte]((v >>> 24).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def le16(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >>> 24) & 0xff).toByte)
    (id % 4) match {
      case 0 => // PNG: signature + IHDR(w BE32, h BE32) + fake CRC
        Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
          be32(13) ++ "IHDR".getBytes("US-ASCII") ++ be32(w) ++ be32(h) ++
          Array[Byte](8, 2, 0, 0, 0) ++ be32(0)
      case 1 => // GIF89a logical screen descriptor (LE16)
        "GIF89a".getBytes("US-ASCII") ++ le16(w) ++ le16(h) ++
          Array[Byte](0, 0, 0)
      case 2 => // BMP with BITMAPINFOHEADER (int32 LE dims)
        val storedH = if (id % 8 == 2) -h else h
        "BM".getBytes("US-ASCII") ++ le32(58) ++ le32(0) ++ le32(54) ++
          le32(40) ++ le32(w) ++ le32(storedH) ++ le16(1) ++ le16(24) ++ le32(0)
      case _ => // JPEG: SOI + APP0(JFIF) + SOF0(h BE16, w BE16) + EOI
        Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte) ++
          be16(16) ++ "JFIF".getBytes("US-ASCII") ++
          Array[Byte](0, 1, 1, 0) ++ be16(1) ++ be16(1) ++ Array[Byte](0, 0) ++
          Array[Byte](0xff.toByte, 0xc0.toByte) ++ be16(17) ++ Array[Byte](8) ++
          be16(h) ++ be16(w) ++
          Array[Byte](3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1) ++
          Array[Byte](0xff.toByte, 0xd9.toByte)
    }
  }
}
