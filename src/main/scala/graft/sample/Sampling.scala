package graft.sample

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data mixing. Both operators are
  * pure functions of row CONTENT (never of partitioning, task order or
  * an RNG), so a sample is reproducible run-to-run, engine-to-engine,
  * and under repartitioning — the property that makes dataset mixes
  * auditable and incremental (a re-run over yesterday's corpus keeps
  * yesterday's rows; `rand(seed)` keeps them only under identical
  * partitioning, which no 100 TB pipeline can promise).
  */
object Sampling {

  /** Bernoulli-by-content-hash: keep a row iff the first 8 hex digits of
    * md5(key) fall below rate·2³². Implemented as a lexicographic
    * compare against an 8-hex-digit threshold — portable to any engine
    * with md5(varchar) and string compare, no integer parsing needed.
    * At scale: a pure map (no shuffle, no state); the kept fraction
    * converges to `rate` by md5 uniformity.
    */
  def hashSample(df: DataFrame, key: Column, rate: Double): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    // rate 1.0 must keep EVERYTHING: the clamped strict-< compare would
    // drop rows whose md5 prefix is exactly "ffffffff" (~1 per 2³²)
    if (rate == 1.0) return df
    val threshold = f"${math.min(math.round(rate * 4294967296.0), 0xffffffffL)}%08x"
    df.filter(substring(md5(key.cast("string")), 1, 8) < lit(threshold))
  }

  /** Per-stratum rate sampling — the "temperature mixing" primitive of
    * dataset curation (upsample rare sources, downsample dominant
    * ones): every stratum gets its own deterministic content-hash
    * Bernoulli rate — [[hashSample]]'s threshold compare with a
    * per-stratum threshold. Strata ABSENT from `rates` are dropped —
    * declared allowlist semantics (a mixing spec names every source it
    * wants; silently keeping unnamed ones would un-curate the mix).
    * Pure map over a broadcast rate table: no shuffle, reproducible
    * under repartitioning and corpus growth like the other samplers.
    */
  def mixByRates(df: DataFrame, stratum: String, key: String,
                 rates: Map[String, Double]): DataFrame = {
    require(rates.nonEmpty, "mixByRates needs at least one stratum rate")
    require(rates.values.forall(r => r >= 0.0 && r <= 1.0),
      s"rates must be in [0,1], got $rates")
    val spark = df.sparkSession
    import spark.implicits._
    val thresholds = rates.toSeq.map { case (s, r) =>
      // rate 1.0 ⇒ threshold "ffffffff"+sentinel above every md5 prefix
      // (strict < keeps all); others ⇒ 8-hex-digit floor(rate·2³²)
      val t = if (r == 1.0) "ffffffffx"
              else f"${math.min(math.round(r * 4294967296.0), 0xffffffffL)}%08x"
      (s, t)
    }.toDF(stratum, "_threshold")
    df.join(broadcast(thresholds), stratum)
      .filter(substring(md5(col(key).cast("string")), 1, 8) < col("_threshold"))
      .drop("_threshold")
  }

  /** Deterministic train/val/test split assignment — the dataset-
    * curation primitive every training pipeline needs: each row's split
    * is a pure function of md5(key), so splits are disjoint,
    * exhaustive, reproducible under repartitioning, and STABLE under
    * corpus growth (adding documents never moves an existing document
    * across splits — the property a row_number-based split lacks).
    * `fractions` are (name, fraction) in priority order; fractions must
    * sum to 1. Thresholds are cumulative floor(frac·2³²) as 8-hex
    * digits compared lexicographically, the same arithmetic as
    * [[hashSample]]. Shuffle-free narrow map.
    */
  def assignSplits(df: DataFrame, key: String,
                   fractions: Seq[(String, Double)]): DataFrame = {
    require(fractions.size >= 2, "need at least two splits")
    require(fractions.forall(_._2 > 0), s"fractions must be positive: $fractions")
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must sum to 1, got $fractions")
    val prefix = substring(md5(col(key).cast("string")), 1, 8)
    val cum = fractions.scanLeft(0.0)(_ + _._2).tail
    // the last threshold is forced to the all-keys sentinel so float
    // rounding can never leave a key unassigned
    val thresholds = fractions.map(_._1).zip(cum).zipWithIndex.map {
      case ((name, c), i) =>
        val t = if (i == fractions.size - 1) "ffffffffx"
                else f"${math.min(math.round(c * 4294967296.0), 0xffffffffL)}%08x"
        (name, t)
    }
    val assigned = thresholds.init.foldRight(
        lit(thresholds.last._1): org.apache.spark.sql.Column) {
      case ((name, t), rest) => when(prefix < lit(t), name).otherwise(rest)
    }
    df.withColumn("split", assigned)
  }

  /** Stratified fixed quota: the `n` rows of each stratum with the
    * smallest md5(key) (key as the tiebreak). Hash order is a stable,
    * content-defined "random" order, so quotas are reproducible and a
    * grown corpus only ever *replaces* quota members, never reshuffles
    * the whole sample. One shuffle (hash partition by stratum); each
    * stratum's top-n is a bounded heap per partition under codegen.
    */
  def stratifiedQuota(df: DataFrame, stratum: Column, key: Column,
                      n: Int): DataFrame = {
    require(n > 0, s"quota must be positive, got $n")
    val w = Window.partitionBy(stratum)
      .orderBy(md5(key.cast("string")), key.cast("string"))
    df.withColumn("sample_rank", row_number().over(w).cast("bigint"))
      .filter(col("sample_rank") <= n)
  }

  /** Deterministic weighted sampling WITHOUT replacement (Efraimidis–
    * Spirakis A-Res): each row draws u = (first 32 md5 bits of key + 1)
    * / 2³², gets priority ln(u)/weight, and the k highest priorities win
    * — inclusion probability rises with weight, and the draw is pure
    * content hash (reproducible across runs/partitionings, stable under
    * corpus growth — the same properties [[hashSample]] gives the
    * unweighted case). Rows with weight ≤ 0 are excluded (their
    * priority would be +∞-like and would always win — not a sample).
    *
    * Bit-reproducible across engines: ln(u) = lnOfInt(h+1) − 32·ln2 via
    * [[graft.functions.ExactMath.lnOfInt]] — libm logs are NOT
    * bit-portable (Spark's StrictMath vs DuckDB's glibc differ in the
    * last bit on ~2% of inputs, measured), so the documented draw is the
    * explicit polynomial, reproducible everywhere; its <1e-11 absolute
    * error is statistically irrelevant to the sample.
    *
    * Scale: a narrow codegen map + TakeOrdered(k) — per-partition
    * bounded heaps, no global sort, no shuffle beyond the k-row final.
    */
  def weightedSample(df: DataFrame, key: Column, weight: Column,
                     k: Int): DataFrame = {
    require(k > 0, s"sample size must be positive, got $k")
    val h = conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
      .cast("bigint")
    val lnU = graft.functions.ExactMath.lnOfInt(h + 1L) -
      lit(32.0) * graft.functions.ExactMath.Ln2
    df.filter(weight > 0.0)
      .withColumn("sample_priority", lnU / weight)
      .orderBy(col("sample_priority").desc, key)
      .limit(k)
  }

  /** Deterministic hash negative sampling for contrastive training: for
    * every positive (anchor, positive) pair, `k` pseudo-random negatives
    * from [0, space) — draw j = first 32 md5 bits of
    * "j:anchor:positive" mod space, the engine-reproducible spelling the
    * sketch operators use. A draw that happens to BE a true positive of
    * its anchor is removed by an exact anti-join rather than resampled
    * (the standard simplification: a fixed hash draw cannot depend on
    * the rejection outcome without losing reproducibility).
    *
    * Scale: the draw is a narrow codegen map (k structs exploded); the
    * accidental-positive filter is one anti-join hash-partitioned on
    * (anchor, negative) — co-partitioned with the positives table it
    * probes, and broadcastable when the positive set is dimension-sized.
    */
  def hashNegatives(positives: DataFrame, anchor: String, positive: String,
                    space: Long, k: Int): DataFrame = {
    require(space >= 1 && k >= 1, s"bad negative shape k=$k space=$space")
    val draws = positives.select(col(anchor), col(positive),
      explode(array((0 until k).map { j =>
        struct(lit(j.toLong).as("draw"),
          (conv(substring(md5(concat(lit(s"$j:"), col(anchor).cast("string"),
            lit(":"), col(positive).cast("string"))), 1, 8), 16, 10)
            .cast("bigint") % space).as("negative"))
      }: _*)).as("d"))
      .select(col(anchor), col(positive), col("d.draw").as("draw"),
        col("d.negative").as("negative"))
    draws.join(
      positives.select(col(anchor), col(positive).as("negative")).distinct(),
      Seq(anchor, "negative"), "left_anti")
      // using-columns joins move the keys to the front; restore the
      // (anchor, positive, draw, negative) contract
      .select(col(anchor), col(positive), col("draw"), col("negative"))
  }

  /** Token-budget mixture sampling — the LLM data-recipe primitive:
    * each stratum gets a TOKEN budget (not a doc count or rate), and
    * the sampler keeps its documents in deterministic content-hash
    * order until the budget is reached (the boundary doc — the first
    * whose preceding cumulative tokens are still under budget — is
    * included, so every stratum overshoots by less than one document).
    * Strata absent from the budget map are DROPPED ([[mixByRates]]'s
    * allowlist semantics); a budget above the stratum's total keeps it
    * whole. Unlike [[hashSample]], the kept set is budget-exact rather
    * than growth-stable — the trade a mixture recipe wants.
    *
    * Scale shape — a two-level distributed prefix sum, because a naive
    * per-stratum running total would sort a corpus-sized stratum on one
    * reducer: docs shard by their first hash byte (256 shards per
    * stratum); within-shard prefix sums run in parallel (reducer state
    * = one shard); shard TOTALS (≤ 256 rows per stratum) take a tiny
    * second-level prefix; global position = shard prefix + within-shard
    * prefix, under the total order (shard, hash, key).
    */
  def tokenBudgetSample(docs: DataFrame, stratum: String, key: Column,
                        tokens: Column,
                        budgets: Map[String, Long]): DataFrame = {
    require(budgets.nonEmpty, "empty budget map")
    val spark = docs.sparkSession
    import spark.implicits._
    val h = md5(concat(col(stratum), lit(":"), key.cast("string")))
    val base = docs
      .select(col(stratum).as("s"), key.as("k"),
        tokens.cast("long").as("n"), h.as("h"))
      .withColumn("shard",
        conv(substring(col("h"), 1, 2), 16, 10).cast("bigint"))
      .join(broadcast(budgets.toSeq.toDF("s", "budget")), Seq("s"))
    val wIn = Window.partitionBy("s", "shard").orderBy(col("h"), col("k"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val within = base.withColumn("cum_in_shard",
      coalesce(sum(col("n")).over(wIn), lit(0L)))
    val wShard = Window.partitionBy("s").orderBy("shard")
      .rowsBetween(Window.unboundedPreceding, -1)
    val shardPrefix = base.groupBy("s", "shard")
      .agg(sum(col("n")).as("t"))
      .withColumn("pfx", coalesce(sum(col("t")).over(wShard), lit(0L)))
      .select(col("s"), col("shard"), col("pfx"))
    within.join(shardPrefix, Seq("s", "shard"))
      .withColumn("cum_before", col("pfx") + col("cum_in_shard"))
      .filter(col("cum_before") < col("budget"))
      .select(col("s").as(stratum), col("k"), col("n").as("n_tokens"),
        col("cum_before"))
  }

  /** Deterministic per-epoch shuffling — the training-data ordering
    * pass: each epoch gets its OWN pseudorandom permutation of the
    * corpus, reproducible under any partitioning and independent across
    * epochs — rerunning epoch 3 on a different cluster replays
    * byte-identical batch order, which is what makes training curves
    * comparable. The permutation is sharded the way shuffled-shard
    * writers actually lay data out: shard = first md5 byte of
    * "epoch:key" (256 shards per epoch), `ord` ranks within the shard
    * by (hash, key), and the epoch's total order is (shard, ord)
    * lexicographically — so the rank window partitions by
    * (epoch, shard) and per-reducer state is ONE shard, never the
    * corpus (a bare per-epoch ordinal would be a single-reducer sort).
    */
  def epochOrder(df: DataFrame, key: Column, epochs: Int): DataFrame = {
    require(epochs >= 1, s"epochs must be >= 1, got $epochs")
    val spark = df.sparkSession
    import spark.implicits._
    val e = df.select(key.as("k"))
      .crossJoin(broadcast((0 until epochs).toDF("epoch")))
      .withColumn("h", md5(concat(col("epoch").cast("string"), lit(":"),
        col("k").cast("string"))))
      .withColumn("shard",
        conv(substring(col("h"), 1, 2), 16, 10).cast("bigint"))
    e.withColumn("ord", row_number().over(
        Window.partitionBy("epoch", "shard").orderBy(col("h"), col("k"))))
      .select(col("epoch"), col("shard"), col("k"), col("ord"))
  }
}
