package graft.events

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch analytics over the event stream beyond sessionization:
  * cohort retention, ordered funnel conversion, and exact rank-based
  * quantiles. Everything is integer-or-input-value exact — counts,
  * epoch-microsecond mins, integer day arithmetic, and quantile values
  * SELECTED from the input rather than interpolated — so every operator
  * is value-checkable against an independent SQL engine.
  */
object EventAnalytics {

  private val UsPerDay = 86400L * 1000000L

  /** Cohort retention — the product-analytics staple: bucket each user
    * into the cohort of their FIRST active day, then count, for every
    * (cohort day, day offset), how many of that cohort's users were
    * active `offset` days after joining. Day = floor(epoch micros /
    * one day) — pure integer arithmetic.
    *
    * Scale shape: distinct (user, day) activity (one shuffle), per-user
    * min for the cohort (map-side-combinable agg on the same key), a
    * user-keyed join back, and the final (cohort, offset) count. No
    * windows, no driver state; the widest intermediate is the distinct
    * activity table, corpus-bounded.
    */
  def retention(ev: DataFrame): DataFrame = {
    val act = ev.select(col("user_id"),
        // integral div, not `/` (long / long is a DOUBLE divide in the
        // Column algebra; the truncating cast happens to agree for
        // positive epochs but the integral form is exact by contract)
        expr(s"unix_micros(ts) div $UsPerDay").as("day"))
      .distinct()
    val cohort = act.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
    act.join(cohort, "user_id")
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy("cohort_day", "day_offset")
  }

  /** Ordered funnel conversion over `steps` event types: a user reaches
    * step k when an event of type steps(k) occurs STRICTLY after their
    * step-(k-1) time (first-touch semantics: each step anchors at its
    * earliest qualifying occurrence, the standard product-funnel rule).
    * Returns one row per step with the step's 1-based index, its event
    * type, and how many users reached it — monotonically non-increasing
    * down the funnel.
    *
    * Scale shape: one filtered min-aggregation per step (map-side
    * combinable, keyed on user) plus a user-keyed join per step to
    * thread the anchor time; step count is a small constant, users
    * shard evenly. Timestamps stay epoch-microsecond integers
    * throughout, so cross-engine value equality is exact.
    */
  def funnel(ev: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val spark = ev.sparkSession
    import spark.implicits._
    val typed = ev.select(col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("us"))
    var anchored: DataFrame = null
    val counts = steps.zipWithIndex.map { case (step, i) =>
      anchored =
        if (i == 0)
          typed.filter(col("event_type") === step)
            .groupBy("user_id").agg(min(col("us")).as("anchor"))
        else
          typed.filter(col("event_type") === step)
            .join(anchored.select(col("user_id"), col("anchor").as("prev")),
              "user_id")
            .filter(col("us") > col("prev"))
            .groupBy("user_id").agg(min(col("us")).as("anchor"))
      (i + 1L, step, anchored.count())
    }
    counts.toDF("step", "event_type", "n_users")
      .orderBy("step")
  }

  /** Exact per-group quantiles by RANK SELECTION: for each percentile p
    * in `pcts` (integer percent), the element at 1-based rank
    * ceil(p·n/100) of the group's values ordered by (value, tiebreak).
    * The result is an INPUT value, never an interpolation — so doubles
    * pass cross-engine value checks bit-for-bit, unlike
    * percentile_approx (sketch-dependent) or linear-interpolation
    * percentiles (arithmetic-order-dependent). Rank arithmetic is pure
    * integer ceil-division; the tiebreak column makes duplicated values
    * deterministic.
    *
    * Scale shape: one shuffle partitioned by the group for the
    * row_number window (per-reducer state: one group's rows), a
    * group-keyed count join, and a constant-width rank filter. For a
    * single giant group the window sort dominates — the standard
    * remedy (range-partition by value, offset ranks per range) applies
    * but is not needed while groups shard.
    */
  def quantiles(ev: DataFrame, group: String, value: String,
                tiebreak: String, pcts: Seq[Int]): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      s"percentiles must be in [1,100], got $pcts")
    val w = Window.partitionBy(group).orderBy(col(value), col(tiebreak))
    val ranked = ev.select(col(group), col(value), col(tiebreak))
      .withColumn("rn", row_number().over(w).cast("bigint"))
    val counts = ranked.groupBy(group).agg(count(lit(1)).as("n"))
    // integer ceil division: (p*n + 99) div 100 — a float divide here
    // would reintroduce engine-dependent rounding
    val wanted = counts.select(col(group), col("n"),
        explode(array(pcts.map(p => lit(p.toLong)): _*)).as("pct"))
      .withColumn("target_rn", expr("(pct * n + 99) div 100"))
    wanted.join(ranked,
        wanted(group) === ranked(group) && col("target_rn") === col("rn"))
      .select(wanted(group), col("pct"), col(value))
      .orderBy(group, "pct")
  }

  /** As-of join (temporal point lookup — last-touch attribution, price
    * snapshots, config-in-effect): for each left row, the single right
    * row with the same `key` and the LARGEST `rightTime` at-or-before
    * (`strict=false`, the default) / strictly-before (`strict=true`) the
    * left row's `leftTime`. Unmatched left rows are dropped (inner
    * as-of). Ties among right rows at the same instant resolve to the
    * largest `rightTie` — stated, so the result is engine-reproducible
    * (a bare ASOF JOIN leaves that case undefined).
    *
    * NOT implemented as a `l.time >= r.time` range join — that shape is
    * O(|L|·|R|) per key and collapses at scale. Instead both inputs are
    * tagged and UNIONed, and one user-keyed window pass carries the most
    * recent right payload forward onto each left row (the standard
    * merge-join formulation of ASOF): one shuffle on `key`, per-reducer
    * state is one key's merged stream, cost O((|L|+|R|) log) for the
    * sort. At equal times the right row sorts before the left row iff
    * `strict=false`, which is exactly the ≤ / < boundary.
    *
    * Returns the left columns unchanged plus each right payload column
    * as `asof_<name>`.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               leftTie: String, rightTie: String,
               rightPayload: Seq[String], strict: Boolean = false): DataFrame = {
    require(rightPayload.nonEmpty, "asofJoin needs at least one right payload column")
    require(left.schema(leftTime).dataType == right.schema(rightTime).dataType,
      s"time columns must share a type: $leftTime vs $rightTime")
    require(left.schema(leftTie).dataType == right.schema(rightTie).dataType,
      s"tiebreak columns must share a type: $leftTie vs $rightTie")
    val lCols = left.columns.toSeq
    val rvType = right.select(struct(rightPayload.map(col): _*)).schema.head.dataType
    val lvType = left.select(struct(lCols.map(col): _*)).schema.head.dataType
    // at equal times: right-before-left gives ≤ (left sees it), left-
    // before-right gives < (left does not)
    val (sideRight, sideLeft) = if (strict) (1, 0) else (0, 1)
    val r = right.select(col(key).as("_k"), col(rightTime).as("_t"),
      lit(sideRight).as("_side"), col(rightTie).as("_tb"),
      struct(rightPayload.map(col): _*).as("_rv"),
      lit(null).cast(lvType).as("_lv"))
    val l = left.select(col(key).as("_k"), col(leftTime).as("_t"),
      lit(sideLeft).as("_side"), col(leftTie).as("_tb"),
      lit(null).cast(rvType).as("_rv"),
      struct(lCols.map(col): _*).as("_lv"))
    val w = Window.partitionBy("_k")
      .orderBy(col("_t"), col("_side"), col("_tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val projected: Seq[Column] =
      lCols.map(c => col(s"_lv.$c").as(c)) ++
        rightPayload.map(c => col(s"_carry.$c").as(s"asof_$c"))
    r.unionByName(l)
      .withColumn("_carry", last(col("_rv"), ignoreNulls = true).over(w))
      .filter(col("_side") === sideLeft && col("_carry").isNotNull)
      .select(projected: _*)
  }

  /** Event-type transition counts — the Markov-chain support table for
    * next-event modeling: for every ordered pair of CONSECUTIVE events
    * by the same user (ordered by time, event_id tiebreak), count the
    * (from_type, to_type) transitions and state each from-type's
    * outgoing total. `prob` is the single double division of those two
    * exact integers — bit-reproducible, like the other ratio columns.
    *
    * Scale shape: one user-keyed shuffle for the `lead` window (per-
    * reducer state: one user's stream), then a map-side-combinable
    * count over a (|types|²)-bounded key space, and a broadcast-sized
    * join for the denominators.
    */
  def transitions(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("us"), col("event_id"))
    val pairs = ev.select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("event_type"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .select(col("event_type").as("from_type"), col("to_type"))
    val counts = pairs.groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy("from_type")
      .agg(sum(col("n")).cast("long").as("from_total"))
    counts.join(broadcast(totals), "from_type")
      .withColumn("prob",
        col("n").cast("double") / col("from_total").cast("double"))
      .select(col("from_type"), col("to_type"), col("n"),
        col("from_total"), col("prob"))
      .orderBy("from_type", "to_type")
  }

  /** Daily last-observation-carried-forward (LOCF gap fill) — the
    * time-series regularization step: for each user, one row per
    * calendar day from their first to their last active day, carrying
    * the day's LAST observed `value` (ties at the same microsecond break
    * on event_id) forward across inactive days. Day = floor(epoch
    * micros / one day); values pass through unchanged (input doubles,
    * no arithmetic), so rows compare bit-for-bit across engines.
    *
    * Shuffle shape mirrors [[rollingActiveUsers]]: the per-day last
    * value is a `max` over a (us, event_id, value) struct — an argmax
    * that partially aggregates map-side, where a row_number window
    * could not — then ONE user-keyed aggregation collects the (day,
    * value) pairs (state bounded by the calendar span, not event
    * volume) and the disjoint gap intervals `[a, next-1]` explode
    * directly to the filled grid.
    */
  def dailyLocf(ev: DataFrame): DataFrame = {
    val lastPerDay = ev.select(col("user_id"),
        expr(s"unix_micros(ts) div $UsPerDay").as("day"),
        struct(unix_micros(col("ts")).as("us"), col("event_id"),
          col("value")).as("obs"))
      .groupBy("user_id", "day").agg(max(col("obs")).as("obs"))
      .select(col("user_id"), col("day"), col("obs.value").as("value"))
    lastPerDay.groupBy("user_id")
      .agg(sort_array(collect_list(struct(col("day"), col("value")))).as("dv"))
      .select(col("user_id"), col("dv"),
        posexplode(col("dv")).as(Seq("i", "x")))
      .withColumn("next_day", expr("try_element_at(dv, cast(i + 2 as int)).day"))
      .select(col("user_id"),
        explode(sequence(col("x.day"),
          coalesce(col("next_day") - 1L, col("x.day")))).as("day"),
        col("x.value").as("value"))
      .orderBy("user_id", "day")
  }

  /** Trailing `windowDays`-day rolling DISTINCT active users per day —
    * for every calendar day the window covers, how many users had at
    * least one event in the `windowDays` days ending at it. Day = floor
    * (epoch micros / one day), pure integer arithmetic; only days with
    * a non-zero count are emitted.
    *
    * The naive shapes both fail at scale: `COUNT(DISTINCT user)` over a
    * RANGE window frame keeps a per-frame hash set and cannot partially
    * aggregate, and a day×activity range self-join fans every activity
    * row out to every candidate day AND still needs a distinct. This
    * uses the interval-disjointness trick instead: per user, each
    * activity day `a` (with next activity day `na`) covers exactly the
    * window-end days `[a, min(na-1, a+windowDays-1)]` — those per-user
    * intervals are DISJOINT, so after exploding them the per-day row
    * count IS the distinct user count, and a plain `count` partially
    * aggregates map-side.
    *
    * Shuffle shape: ONE user-keyed shuffle (a `sort_array(collect_set)`
    * aggregation that both dedups the activity days and yields each
    * day's successor by array position — a separate `distinct` + `lead`
    * window would shuffle twice because they key differently), the
    * ≤windowDays-fan-out narrow explode, and one count shuffle keyed on
    * day. Per-user aggregation state is the DISTINCT-day set, bounded
    * by the calendar span (≤3.7k entries over a decade) regardless of
    * event volume — the 10⁹-events bot user costs the same as anyone.
    */
  def rollingActiveUsers(ev: DataFrame, windowDays: Int): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    ev.select(col("user_id"),
        expr(s"unix_micros(ts) div $UsPerDay").as("day"))
      .groupBy("user_id")
      .agg(sort_array(collect_set(col("day"))).as("days"))
      .select(col("days"), posexplode(col("days")).as(Seq("i", "day")))
      // 1-based indexing, i is 0-based, so i+2 is the successor;
      // try_element_at (not element_at) so the last day yields NULL
      // instead of an ANSI out-of-bounds error
      .withColumn("next_day",
        expr("try_element_at(days, cast(i + 2 as int))"))
      .withColumn("hi", col("day") + lit((windowDays - 1).toLong))
      .withColumn("day_end",
        when(col("next_day").isNull, col("hi"))
          .otherwise(least(col("next_day") - 1L, col("hi"))))
      .select(explode(sequence(col("day"), col("day_end"))).as("day"))
      .groupBy("day").agg(count(lit(1)).as("n_users"))
      .orderBy("day")
  }

  /** Time-to-convert: for every user whose first `toType` event comes
    * at-or-after their first `fromType` event, the microsecond gap
    * between the two firsts — the funnel-latency companion to
    * [[funnel]] (which counts conversions; this measures them). One
    * user-keyed aggregate of two conditional MINs; integer-exact.
    */
  def timeToConvert(ev: DataFrame, fromType: String,
                    toType: String): DataFrame = {
    val us = unix_micros(col("ts"))
    ev.groupBy("user_id")
      .agg(min(when(col("event_type") === fromType, us)).as("first_from_us"),
        min(when(col("event_type") === toType, us)).as("first_to_us"))
      .filter(col("first_from_us").isNotNull &&
        col("first_to_us") >= col("first_from_us"))
      .withColumn("ttc_us", col("first_to_us") - col("first_from_us"))
      .orderBy("user_id")
  }

  /** RFM behavioral scoring — the classic user-value segmentation:
    * per user, Recency (whole days since their last event, measured
    * from the corpus's own max timestamp so the result is input-
    * determined), Frequency (event count) and Monetary (value sum
    * through decimal(18,6) — exact, order-independent — then double),
    * each quintile-ranked by NTILE(5) with the user id as the
    * deterministic tie-break (r: recent first; f/m: largest first).
    *
    * Scale shape: one user-keyed aggregate (map-side combinable,
    * localCheckpointed once); each quintile is a
    * [[graft.sample.DistOrder]] two-level global rank — range shards
    * of the metric from a quantile pass, per-shard ROW_NUMBER
    * (partitioned window: one shard per reducer, never the user
    * table), driver-prefixed shard counts — turned into the
    * SQL-standard NTILE split by pure rank arithmetic, bit-identical
    * to `ntile(5) OVER (ORDER BY metric, user_id)` without the
    * single-partition sort an unpartitioned window would force. The
    * three score columns join back on user_id (user-keyed shuffles,
    * the same exchange class the three window sorts cost). If one
    * metric value dominates (e.g. near-constant frequency), its ties
    * collapse into one shard — correct, just as unbalanced as any
    * global sort of that data.
    */
  def rfm(ev: DataFrame): DataFrame = {
    val us = unix_micros(col("ts"))
    val maxUs = ev.agg(max(us)).head().getLong(0)
    val perUser = ev.groupBy("user_id").agg(
      ((lit(maxUs) - max(us)) / lit(86400000000L)).cast("bigint")
        .as("recency_days"),
      count(lit(1)).as("frequency"),
      sum(col("value").cast("decimal(18,6)")).cast("double").as("monetary"))
      .localCheckpoint()
    def score(metric: Column, asc: Boolean, name: String): DataFrame = {
      val (ranked, n) = graft.sample.DistOrder.rankBy(
        perUser, metric, asc, col("user_id"), "__rank")
      ranked.select(col("user_id"),
        graft.sample.DistOrder.ntileFromRank(col("__rank"), n, 5)
          .cast("bigint").as(name))
    }
    perUser
      .join(score(col("recency_days"), asc = true, "r_score"), "user_id")
      .join(score(col("frequency"), asc = false, "f_score"), "user_id")
      .join(score(col("monetary"), asc = false, "m_score"), "user_id")
      .orderBy("user_id")
  }

  /** SCD Type-2 interval build — turn a change log (key, timestamp,
    * payload columns) into validity intervals: each change is valid
    * [its instant, the key's next change), the latest change per key is
    * open-ended (`valid_to_us` null) and flagged `is_current` — the
    * dimension-history layout warehouses keep, and the relational twin
    * of the graph tables' firstseen/lastupdated freshness model (a
    * node's property history IS this table). Equal-instant changes
    * order by `tiebreak` (a unique id), so intervals are deterministic;
    * zero-length intervals (superseded within the same microsecond) are
    * real rows with valid_from = valid_to — auditable, never silently
    * merged.
    *
    * Scale shape: one shuffle keyed on `key`, one window pass; per-
    * reducer state is one key's change list. Payload columns pass
    * through untouched.
    */
  def scd2(changes: DataFrame, key: String, tsCol: String,
           tiebreak: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col("valid_from_us"),
      col(tiebreak))
    changes
      .withColumn("valid_from_us", unix_micros(col(tsCol)))
      .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(w))
      .withColumn("is_current", col("valid_to_us").isNull)
      .drop(tsCol)
  }

}
