package graft.events

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpecBase

class EventAnalyticsSpec extends SparkSpecBase {
  import spark.implicits._

  private val day = 86400L
  private def ts(sec: Long) = new Timestamp(sec * 1000L)
  private def ev(rows: Seq[(Long, Long, Long, String)]) =
    rows.map { case (eid, sec, uid, t) => (eid, ts(sec), uid, t) }
      .toDF("event_id", "ts", "user_id", "event_type")

  test("retention: cohorts anchor at the first active day") {
    // u1 joins day 0, active days 0,1,3; u2 joins day 1, active 1,2;
    // u3 joins day 0, active 0 only (two events same day -> one row)
    val rows = Seq(
      (1L, 0L, 1L, "view"), (2L, day + 5, 1L, "view"), (3L, 3 * day, 1L, "view"),
      (4L, day, 2L, "view"), (5L, 2 * day, 2L, "view"),
      (6L, 10L, 3L, "view"), (7L, 20L, 3L, "view"))
    val got = EventAnalytics.retention(ev(rows)).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === Map(
      (0L, 0L) -> 2L, (0L, 1L) -> 1L, (0L, 3L) -> 1L,
      (1L, 0L) -> 1L, (1L, 1L) -> 1L))
  }

  test("funnel: strict ordering, first-touch anchors, monotone counts") {
    // u1 completes view->click->purchase in order;
    // u2 clicks BEFORE viewing (click must not count) then never again;
    // u3 views only; u4 has purchase before click (stops at click)
    val rows = Seq(
      (1L, 10L, 1L, "view"), (2L, 20L, 1L, "click"), (3L, 30L, 1L, "purchase"),
      (4L, 10L, 2L, "click"), (5L, 20L, 2L, "view"),
      (6L, 10L, 3L, "view"),
      (7L, 10L, 4L, "view"), (8L, 15L, 4L, "purchase"), (9L, 20L, 4L, "click"))
    val got = EventAnalytics.funnel(ev(rows), Seq("view", "click", "purchase"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq === Seq(
      (1L, "view", 4L), (2L, "click", 2L), (3L, "purchase", 1L)))
  }

  test("funnel: simultaneous events do not satisfy STRICTLY-after") {
    val rows = Seq((1L, 10L, 1L, "view"), (2L, 10L, 1L, "click"))
    val got = EventAnalytics.funnel(ev(rows), Seq("view", "click"))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(got === Map(1L -> 1L, 2L -> 0L))
  }

  test("quantiles: rank selection picks input values, ceil-div ranks") {
    // group 'a': values 1..4 -> n=4; p25 rank ceil(1)=1, p50 rank 2,
    // p75 rank 3; group 'b': single value -> every pct selects it
    val df = Seq(
      (1L, "a", 10.5), (2L, "a", 20.5), (3L, "a", 30.5), (4L, "a", 40.5),
      (5L, "b", 7.25))
      .toDF("event_id", "event_type", "value")
    val got = EventAnalytics.quantiles(df, "event_type", "value", "event_id",
        Seq(25, 50, 75))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got === Map(
      ("a", 25L) -> 10.5, ("a", 50L) -> 20.5, ("a", 75L) -> 30.5,
      ("b", 25L) -> 7.25, ("b", 50L) -> 7.25, ("b", 75L) -> 7.25))
  }

  test("quantiles: duplicated values resolve deterministically by tiebreak") {
    val df = Seq((1L, "a", 5.0), (2L, "a", 5.0), (3L, "a", 5.0), (4L, "a", 9.0))
      .toDF("event_id", "event_type", "value")
    val got = EventAnalytics.quantiles(df, "event_type", "value", "event_id",
        Seq(100)).collect()
    assert(got.length === 1 && got(0).getDouble(2) === 9.0)
  }

  test("asofJoin: latest at-or-before match, ties to largest id, inner semantics") {
    // purchases at t=20 (u1), t=5 (u2, before any view -> dropped),
    // t=10 (u3, equal-time views 7 and 8 -> ties to id 8)
    val purchases = Seq((100L, 20L, 1L), (101L, 5L, 2L), (102L, 10L, 3L))
      .toDF("purchase_id", "purchase_us", "user_id")
    val views = Seq(
      (1L, 10L, 1L), (2L, 15L, 1L), (3L, 25L, 1L), // u1: latest <= 20 is id 2
      (4L, 6L, 2L),                                // u2: after its purchase
      (7L, 10L, 3L), (8L, 10L, 3L))                // u3: equal-time tie
      .toDF("view_id", "view_us", "user_id")
    val got = EventAnalytics.asofJoin(purchases, views, "user_id",
        "purchase_us", "view_us", "purchase_id", "view_id",
        Seq("view_id", "view_us"))
      .collect().map(r => r.getAs[Long]("purchase_id") ->
        (r.getAs[Long]("asof_view_id"), r.getAs[Long]("asof_view_us"))).toMap
    assert(got === Map(100L -> (2L, 15L), 102L -> (8L, 10L)))
  }

  test("asofJoin: strict=true excludes equal-time right rows") {
    val purchases = Seq((100L, 10L, 1L)).toDF("purchase_id", "purchase_us", "user_id")
    val views = Seq((1L, 10L, 1L), (2L, 9L, 1L)).toDF("view_id", "view_us", "user_id")
    val lax = EventAnalytics.asofJoin(purchases, views, "user_id",
      "purchase_us", "view_us", "purchase_id", "view_id", Seq("view_id"))
      .collect().map(_.getAs[Long]("asof_view_id"))
    val strict = EventAnalytics.asofJoin(purchases, views, "user_id",
      "purchase_us", "view_us", "purchase_id", "view_id", Seq("view_id"),
      strict = true)
      .collect().map(_.getAs[Long]("asof_view_id"))
    assert(lax.toSeq === Seq(1L) && strict.toSeq === Seq(2L))
  }

  test("rollingActiveUsers: disjoint intervals count distinct users exactly") {
    // u1 active days 0 and 10; u2 active day 3; u3 active days 0 and 2
    // (interval split [0,1]+[2,8] must still count u3 once per day)
    val rows = Seq(
      (1L, 0L, 1L, "view"), (2L, 10 * day, 1L, "view"),
      (3L, 3 * day + 7, 2L, "view"),
      (4L, 5L, 3L, "view"), (5L, 2 * day, 3L, "view"))
    val got = EventAnalytics.rollingActiveUsers(ev(rows), windowDays = 7)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = (0L to 16L).map { d =>
      val users = Seq(1L -> Seq(0L, 10L), 2L -> Seq(3L), 3L -> Seq(0L, 2L))
        .count { case (_, days) => days.exists(a => a <= d && d - a <= 6) }
      d -> users.toLong
    }.filter(_._2 > 0).toMap
    assert(got === want)
  }

  test("transitions: consecutive pairs per user, exact ratio denominators") {
    // u1: view->click->view; u2: click->view. Transitions:
    // view->click 1, click->view 2, view->view 0 (non-consecutive
    // across users never pair)
    val rows = Seq(
      (1L, 10L, 1L, "view"), (2L, 20L, 1L, "click"), (3L, 30L, 1L, "view"),
      (4L, 10L, 2L, "click"), (5L, 20L, 2L, "view"))
    val got = EventAnalytics.transitions(ev(rows)).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got === Map(
      ("view", "click") -> (1L, 1L, 1.0),
      ("click", "view") -> (2L, 2L, 1.0)))
  }

  test("transitions: same-timestamp order resolves by event_id") {
    val rows = Seq((2L, 10L, 1L, "click"), (1L, 10L, 1L, "view"))
    val got = EventAnalytics.transitions(ev(rows)).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(got.toSeq === Seq(("view", "click")))
  }

  test("dailyLocf: per-day last value carried across gaps, per-user span") {
    // u1: day 0 has two events (the later one, value 2.5, wins), then a
    // gap to day 3 -> days 1,2 carry 2.5; u2: one event on day 5 only
    val df = Seq(
      (1L, ts(10L), 1L, 1.5), (2L, ts(20L), 1L, 2.5),
      (3L, ts(3 * day + 1), 1L, 9.0),
      (4L, ts(5 * day + 2), 2L, 4.25))
      .toDF("event_id", "ts", "user_id", "value")
    val got = EventAnalytics.dailyLocf(df).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got === Map(
      (1L, 0L) -> 2.5, (1L, 1L) -> 2.5, (1L, 2L) -> 2.5, (1L, 3L) -> 9.0,
      (2L, 5L) -> 4.25))
  }

  test("dailyLocf: same-microsecond ties break on event_id") {
    val df = Seq((7L, ts(10L), 1L, 1.0), (9L, ts(10L), 1L, 3.0),
        (8L, ts(10L), 1L, 2.0))
      .toDF("event_id", "ts", "user_id", "value")
    val got = EventAnalytics.dailyLocf(df).collect()
    assert(got.length === 1 && got(0).getDouble(2) === 3.0)
  }

  test("mixByRates: allowlist drops unnamed strata; rates govern kept fractions") {
    val df = (0 until 4000).map(i =>
      (i.toLong, Seq("en", "de", "es", "fr")(i % 4))).toDF("doc_id", "lang")
    val kept = graft.sample.Sampling.mixByRates(df, "lang", "doc_id",
        Map("en" -> 0.5, "de" -> 0.25, "es" -> 1.0))
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!kept.contains("fr")) // absent stratum dropped
    assert(kept("es") === 1000L) // rate 1.0 keeps everything
    assert(math.abs(kept("en") - 500L) < 80, s"en=${kept("en")}")
    assert(math.abs(kept("de") - 250L) < 60, s"de=${kept("de")}")
    // nested thresholds: the de sample at 0.25 is a subset of what a
    // 0.5 rate would keep (same md5 order)
    val de50 = graft.sample.Sampling.mixByRates(df, "lang", "doc_id",
        Map("de" -> 0.5)).select("doc_id").as[Long].collect().toSet
    val de25 = graft.sample.Sampling.mixByRates(df, "lang", "doc_id",
        Map("de" -> 0.25)).select("doc_id").as[Long].collect().toSet
    assert(de25.subsetOf(de50))
  }

  test("timeToConvert: firsts only, purchase-before-view and non-converting users excluded, same-instant counts as 0") {
    val rows = Seq(
      (1L, 100L, 1L, "view"), (2L, 50L, 1L, "view"),    // first view at 50
      (3L, 300L, 1L, "purchase"), (4L, 400L, 1L, "purchase"),
      (5L, 200L, 2L, "purchase"), (6L, 250L, 2L, "view"), // converted BEFORE first view
      (7L, 10L, 3L, "view"),                             // never converts
      (8L, 70L, 4L, "view"), (9L, 70L, 4L, "purchase"))  // same instant
    val got = EventAnalytics.timeToConvert(ev(rows), "view", "purchase")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got === Map(1L -> 250000000L, 4L -> 0L))
  }

  test("rfm: recency anchors at the corpus max, monetary is decimal-exact, quintiles split 2-2-1-1-1 over 7 users") {
    // user u's last event at day (7-u); values make monetary rank = id
    val rows = (1L to 7L).flatMap { u =>
      Seq((u * 10, (7 - u) * day, u, "view", u * 1.5),
        (u * 10 + 1, (7 - u) * day + 100, u, "view", 0.25))
    }
    val ev = rows.map { case (eid, sec, uid, t, v) =>
      (eid, ts(sec), uid, t, v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = EventAnalytics.rfm(ev).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    // corpus max ts = u1's 6*day+100; u7's last = 0*day+100 → 6 days ago
    assert(got(7L)._1 === 6L)
    assert(got(1L)._1 === 0L)
    assert(got.values.forall(_._2 === 2L)) // frequency 2 each
    assert(got(3L)._3 === 3 * 1.5 + 0.25)
    // r_score: recency asc + user tie → u1,u2 in q1 … u7 alone in q5
    assert(got(1L)._4 === 1L && got(2L)._4 === 1L && got(3L)._4 === 2L)
    assert(got(7L)._4 === 5L)
    // m_score: monetary desc → u7,u6 in q1; u1 alone in q5
    assert(got(7L)._6 === 1L && got(6L)._6 === 1L && got(1L)._6 === 5L)
    // f_score: all tie on frequency → pure user-id order 2-2-1-1-1
    assert((1L to 7L).map(got(_)._5) === Seq(1L, 1L, 2L, 2L, 3L, 4L, 5L))
  }

  test("scd2: intervals chain per key, last is open and current, same-instant ties order by id") {
    val changes = Seq(
      (1L, ts(100), 1L, 10.0), (2L, ts(200), 1L, 20.0),
      // u2: two changes in the SAME microsecond — event 3 is superseded
      // by event 4 within the instant (zero-length interval, kept)
      (3L, ts(50), 2L, 1.0), (4L, ts(50), 2L, 2.0), (5L, ts(60), 2L, 3.0))
      .toDF("event_id", "ts", "user_id", "value")
    val got = EventAnalytics.scd2(changes, "user_id", "ts", "event_id")
      .select("event_id", "valid_from_us", "valid_to_us", "is_current")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]), r.getBoolean(3)))).toMap
    assert(got(1L) === ((100000000L, Some(200000000L), false)))
    assert(got(2L) === ((200000000L, None, true)))
    // zero-length interval: from == to, not merged away
    assert(got(3L) === ((50000000L, Some(50000000L), false)))
    assert(got(4L) === ((50000000L, Some(60000000L), false)))
    assert(got(5L) === ((60000000L, None, true)))
    // exactly one current row per key
    val current = got.values.count(_._3)
    assert(current === 2)
  }
}
