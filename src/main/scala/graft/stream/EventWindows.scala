package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation with a watermark — the streaming
  * capability the reference lacks entirely (SURVEY §2.8: arrival-order
  * processing, "no event-time, no watermark"). Our engine's documented
  * improvement: late events are bounded by the watermark instead of
  * silently reordering state.
  *
  * Scale: tumbling-window counts are the canonical partial-agg
  * streaming shape — state per (window, key) only, map-side combine
  * per micro-batch, eviction once the watermark passes a window's end
  * (bounded state regardless of stream length).
  */
object EventWindows {

  /** Tumbling event-time window counts per event type. `events` needs
    * an event-time `ts` timestamp column (batch or streaming). In
    * append mode a window emits exactly once — when the watermark
    * passes its end — and events later than `lateness` are dropped. */
  def windowedTypeCounts(events: DataFrame,
                         windowLen: String = "1 hour",
                         lateness: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"))

  /** q30 — the batch twin over the `events` table (identical window
    * semantics, DuckDB-oracle-certified; `window()` on a batch frame
    * needs no watermark). Tumbling windows floor to the hour in UTC on
    * both engines. */
  def windowedTypeCountsBatch(spark: org.apache.spark.sql.SparkSession,
                              dir: String): DataFrame =
    graft.ops.Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"))
      .orderBy(col("window_start"), col("event_type"))
}
