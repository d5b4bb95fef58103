package graft.events

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpecBase

class SessionizeSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  private def run(rows: Seq[(Long, Long, Long)], gapSec: Long) =
    Sessionize.sessions(
      rows.map { case (eid, sec, uid) => (eid, ts(sec), uid, "t") }
        .toDF("event_id", "ts", "user_id", "event_type"), gapSec)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap

  test("gap strictly over the timeout splits; exactly-at stays in-session") {
    // user 1: events at 0, 100 (gap 100 = timeout -> same session),
    // then 201 (gap 101 > 100 -> new session)
    val got = run(Seq((1L, 0L, 1L), (2L, 100L, 1L), (3L, 201L, 1L)), 100L)
    assert(got === Map(
      (1L, 0L) -> ((2L, 0L, 100000000L)),
      (1L, 1L) -> ((1L, 201000000L, 201000000L))))
  }

  test("sessions partition each user's events; idx contiguous from 0") {
    // deterministic pseudo-random stream over 3 users
    val rows = (0 until 300).map { i =>
      (i.toLong, (i * 7919L) % 100000L, (i % 3).toLong)
    }
    val got = run(rows, 600L)
    val byUser = got.groupBy(_._1._1)
    byUser.foreach { case (u, ss) =>
      val idxs = ss.keys.map(_._2).toSeq.sorted
      assert(idxs === (0L until idxs.size.toLong), s"user $u idx gap")
      // counts add up to the user's events
      assert(ss.values.map(_._1).sum === rows.count(_._3 == u), s"user $u")
      // sessions are disjoint, ordered, separated by > gap
      val spans = ss.toSeq.sortBy(_._1._2).map(_._2)
      spans.foreach { case (_, s, e) => assert(s <= e) }
      spans.sliding(2).foreach {
        case Seq((_, _, e1), (_, s2, _)) =>
          assert(s2 - e1 > 600L * 1000000L, s"user $u merge gap")
        case _ =>
      }
    }
  }

  test("timestamp ties break by event_id (split is reproducible)") {
    // two events at the SAME second; the break flag orders by event_id
    val a = run(Seq((2L, 50L, 9L), (1L, 50L, 9L), (3L, 500L, 9L)), 100L)
    assert(a((9L, 0L))._1 === 2L) // both tied events in session 0
    assert(a((9L, 1L))._1 === 1L)
  }
}
