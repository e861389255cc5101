package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Temporal join operators over the `events` table — the two
  * time-series join classes the north star names explicitly (range
  * join, as-of join), composed from Spark built-ins (the brief's
  * option (a): no custom operator needed — the semantics fit an
  * equi+range join and a window replay).
  *
  * Scale design:
  *  - the RANGE join keeps `user_id` as a real equi-key, so the
  *    planner shuffles/broadcasts on user and evaluates only the time
  *    range inside each key group — never a cartesian over time. Per
  *    user the cost is clicks × views of that user (the operator's
  *    true output bound).
  *  - the AS-OF join never joins at all: it is ONE window pass over
  *    the union of both event streams, partitioned by user, ordered
  *    by time — the running-max formulation every columnar engine's
  *    ASOF JOIN compiles to when the probe side dominates. One
  *    shuffle on user_id, state = one running value per partition
  *    stream, no pair blowup on bursty users.
  */
object Temporal {

  /** q52 — range join (conversion attribution): every (click, view)
    * pair of the same user where the view lands in the window
    * `(click.ts, click.ts + windowMicros]`. Emits the micros gap —
    * exact integer arithmetic on both engines. */
  def rangeJoinConversions(spark: SparkSession, dir: String,
                           windowMicros: Long = 10L * 60 * 1000000): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("us").as("click_us"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), col("us").as("view_us"))
    clicks.join(views,
        clicks("user_id") === views("user_id") &&
          col("view_us") > col("click_us") &&
          col("view_us") <= col("click_us") + windowMicros)
      .select(clicks("user_id"), col("click_id"), col("view_id"),
        (col("view_us") - col("click_us")).as("gap_us"))
      .orderBy(col("click_id"), col("view_id"))
  }

  /** q53 — as-of join (last-touch attribution): for every `purchase`
    * event, the timestamp of the SAME USER's most recent `click`
    * STRICTLY BEFORE it (ties on ts broken by event order — the
    * preceding-rows frame sees earlier-id same-ts clicks), plus the
    * micros gap; purchases with no prior click keep a null. The
    * running-max window replay is the scalable as-of form (DuckDB's
    * `ASOF JOIN` is the same semantics; the oracle replays the
    * identical window so both engines execute one definition). */
  def asofLastClick(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    Tables.events(spark, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("last_click_us",
        max(when(col("event_type") === "click", col("us"))).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"),
        timestamp_micros(col("us")).as("ts"),
        timestamp_micros(col("last_click_us")).as("last_click_ts"),
        (col("us") - col("last_click_us")).as("gap_us"))
      .orderBy(col("event_id"))
  }

  /** q64 — window NAVIGATION functions (§2.5 completeness beyond
    * ranking/dedup): per-user event-stream context — previous event
    * type, inter-event gaps backward and forward (`lag`/`lead`), and
    * time since the user's first event (`first_value` under the
    * default running frame) — the sequence features behind funnel and
    * churn analyses. The window order key (us, event_id) is total, so
    * every offset function is deterministic; gaps are exact integer
    * micros on both engines.
    *
    * Plan shape at 100 TB: all four navigation functions ride ONE
    * per-user window pass — one shuffle keyed on user_id, per-user
    * state a single row of look-back/look-ahead, no self-join (the
    * naive formulation joins the stream to itself offset by one). */
  def eventNavigation(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .withColumn("gap_us", col("us") - lag(col("us"), 1).over(w))
      .withColumn("next_gap_us", lead(col("us"), 1).over(w) - col("us"))
      .withColumn("since_first_us", col("us") - first(col("us")).over(w))
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("prev_type"), col("gap_us"), col("next_gap_us"), col("since_first_us"))
      .orderBy(col("user_id"), col("event_id"))
  }
}
