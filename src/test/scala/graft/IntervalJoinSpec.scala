package graft

import graft.stream.IntervalJoin
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Stream-stream interval join end-to-end: in-window pairs match
  * across micro-batches (both arrival orders), out-of-window pairs
  * never appear, and results agree with the batch form of the same
  * join. */
class IntervalJoinSpec extends SparkSpec {

  private def ts(h: Int, m: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")

  test("interval join matches in-window pairs across batches; out-of-window never match") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val views = MemoryStream[(Long, Long, Timestamp)]
    val joined = IntervalJoin.clickViewConversions(
      clicks.toDF().toDF("user_id", "click_id", "click_ts"),
      views.toDF().toDF("user_id", "view_id", "view_ts"))
    val q = joined.writeStream.format("memory")
      .queryName("conv").outputMode("append").start()
    try {
      // view AFTER click in-window; view BEFORE click (never matches);
      // view exactly at click_ts (strict lower bound — no match)
      clicks.addData((1L, 100L, ts(10, 0)), (2L, 101L, ts(10, 0)), (3L, 102L, ts(10, 0)))
      views.addData((1L, 200L, ts(10, 5)), (2L, 201L, ts(9, 55)), (3L, 202L, ts(10, 0)))
      q.processAllAvailable()
      val r1 = spark.table("conv").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(r1 == Set((1L, 100L, 200L)))

      // the OTHER arrival order: the view arrives a batch before its
      // click — the buffered view still matches when the click lands
      views.addData((4L, 203L, ts(11, 8)))
      q.processAllAvailable()
      clicks.addData((4L, 103L, ts(11, 0)))
      q.processAllAvailable()
      // and a view past the 10-minute window never matches
      views.addData((4L, 204L, ts(11, 11)))
      q.processAllAvailable()
      val r2 = spark.table("conv").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(r2 == Set((1L, 100L, 200L), (4L, 103L, 203L)))
    } finally q.stop()

    // batch twin: the same helper over static frames yields the same
    // pairs (plus proves the join itself is mode-agnostic)
    val bc = Seq((1L, 100L, ts(10, 0)), (4L, 103L, ts(11, 0)))
      .toDF("user_id", "click_id", "click_ts")
    val bv = Seq((1L, 200L, ts(10, 5)), (4L, 203L, ts(11, 8)), (4L, 204L, ts(11, 11)))
      .toDF("user_id", "view_id", "view_ts")
    val batch = IntervalJoin.clickViewConversions(bc, bv).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(batch == Set((1L, 100L, 200L), (4L, 103L, 203L)))
  }
}
