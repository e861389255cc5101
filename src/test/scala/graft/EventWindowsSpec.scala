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
}
