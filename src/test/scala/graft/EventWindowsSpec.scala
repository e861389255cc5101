package graft

import graft.stream.EventWindows
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Watermark semantics end-to-end: windows finalize (append) only once
  * the watermark passes their end, and too-late events are dropped —
  * the behavior that replaces the reference's arrival-order
  * reprocessing. */
class EventWindowsSpec extends SparkSpec {

  private def ts(hour: Int, minute: Int = 0): Timestamp =
    Timestamp.valueOf(f"2026-01-01 $hour%02d:$minute%02d:00")

  test("append mode: window emits once watermark passes; late events dropped") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val input = MemoryStream[(Timestamp, String)]
    val counts = EventWindows.windowedTypeCounts(
      input.toDF().toDF("ts", "event_type"))
    val q = counts.writeStream.format("memory")
      .queryName("win_counts").outputMode("append").start()
    try {
      // three events in the 10:00 window, one in 11:00
      input.addData((ts(10, 5), "click"), (ts(10, 20), "click"),
        (ts(10, 40), "view"), (ts(11, 10), "click"))
      q.processAllAvailable()
      // nothing finalized yet: watermark = max(11:10) - 2h < 11:00
      assert(spark.table("win_counts").count() == 0)

      // far-future event pushes the watermark past the 10:00 window…
      input.addData((ts(15, 0), "click"))
      q.processAllAvailable()
      // …and the NEXT batch emits the finalized windows
      input.addData((ts(15, 30), "view"))
      q.processAllAvailable()
      val emitted = spark.table("win_counts").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(emitted.contains((ts(10), "click", 2L)))
      assert(emitted.contains((ts(10), "view", 1L)))

      // an event 5 hours late (watermark ~13:30) is DROPPED: the 10:00
      // window never re-emits with count 3
      input.addData((ts(10, 50), "click"))
      q.processAllAvailable()
      input.addData((ts(15, 45), "view"))
      q.processAllAvailable()
      val after = spark.table("win_counts").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(after.count(e => e._1 == ts(10) && e._2 == "click") == 1)
      assert(after.contains((ts(10), "click", 2L)))
    } finally q.stop()
  }

  test("sessionStats batch: gaps ≤ 30min merge (boundary INCLUSIVE), above splits, end = last + gap") {
    val s = spark
    import s.implicits._
    // user 1: 10:00, 10:29 merge (gap 29min); 10:59 is EXACTLY 30min
    //         after 10:29 — touching windows MERGE (session_window's
    //         closed merge rule, pinned here because the oracle must
    //         break on strictly-greater gaps); 11:30 is 31min after
    //         10:59 → new session
    // user 2: one event → singleton session
    val events = Seq(
      (1L, ts(10, 0), 1.0), (1L, ts(10, 29), 2.0), (1L, ts(10, 59), 3.0),
      (1L, ts(11, 30), 4.0),
      (2L, ts(12, 0), 5.0)
    ).toDF("user_id", "ts", "value")
    val got = EventWindows.sessionStats(events).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3), r.getDouble(4))).toSet
    assert(got == Set(
      (1L, ts(10, 0), ts(11, 29), 3L, 6.0),   // end = 10:59 + 30min
      (1L, ts(11, 30), ts(12, 0), 1L, 4.0),
      (2L, ts(12, 0), ts(12, 30), 1L, 5.0)))
  }

  test("sessionStats randomized parity: session_window agrees with a gaps-and-islands reference") {
    val s = spark
    import s.implicits._
    // seeded: the sample is fixed, failures reproduce. Minute-granular
    // timestamps make EXACT-gap collisions (the merge-rule boundary)
    // common instead of measure-zero.
    val rnd = new scala.util.Random(20260812L)
    val events = Seq.fill(400) {
      (rnd.nextInt(5).toLong + 1L,
        ts(rnd.nextInt(13) + 8, rnd.nextInt(60)),
        (rnd.nextInt(500) + 1) / 100.0)
    }.distinct
    val got = EventWindows.sessionStats(events.toDF("user_id", "ts", "value"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
      .toSet

    // reference: break strictly-greater-than-30min gaps (touching
    // windows merge), end = last + 30min — the oracle's exact rule
    val expected = events.groupBy(_._1).flatMap { case (uid, evs) =>
      val sorted = evs.map(_._2).sorted(Ordering.by((t: Timestamp) => t.getTime))
      val sessions = sorted.foldLeft(List.empty[List[Timestamp]]) {
        case (acc, t) => acc match {
          case cur :: rest if t.getTime - cur.head.getTime <= 30 * 60 * 1000 =>
            (t :: cur) :: rest // cur.head = last event of the open session
          case _ => List(t) :: acc
        }
      }
      sessions.map { ses =>
        val startT = ses.last
        val endT = new Timestamp(ses.head.getTime + 30 * 60 * 1000)
        (uid, startT, endT, ses.size.toLong)
      }
    }.toSet
    assert(got == expected)
  }

  test("sessionStats streaming append: session emits once watermark passes its end") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val input = MemoryStream[(Long, Timestamp, Double)]
    val sessions = EventWindows.sessionStatsStreaming(
      input.toDF().toDF("user_id", "ts", "value"))
    val q = sessions.writeStream.format("memory")
      .queryName("sess_stats").outputMode("append").start()
    try {
      input.addData((1L, ts(10, 0), 1.0), (1L, ts(10, 20), 2.0))
      q.processAllAvailable()
      // watermark = 10:20 - 2h — session [10:00, 10:50) still open
      assert(spark.table("sess_stats").count() == 0)

      // late-but-in-bounds event EXTENDS the open session…
      input.addData((1L, ts(10, 40), 3.0))
      q.processAllAvailable()
      // …then a far-future event closes it (watermark 13:00 > end 11:10)
      input.addData((2L, ts(15, 0), 9.0))
      q.processAllAvailable()
      input.addData((2L, ts(15, 10), 1.0))
      q.processAllAvailable()
      val emitted = spark.table("sess_stats").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getLong(3), r.getDouble(4))).toSet
      assert(emitted == Set((1L, ts(10, 0), ts(11, 10), 3L, 6.0)))
    } finally q.stop()
  }
}
