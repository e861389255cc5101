package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * One parquet file per table under `sfDir`. All access goes through
  * here so column pruning / filter pushdown is controlled at one
  * place and queries stay declarative (Catalyst prunes the scan from
  * the downstream `select`s).
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `events.ts` has shipped in two physical encodings across driver
    * testdata generations: parquet TIMESTAMP(NANOS) (reads as a raw
    * long under `spark.sql.legacy.parquet.nanosAsLong=true`, set by
    * every session builder here) and parquet TIMESTAMP(MICROS) (reads
    * as TIMESTAMP_NTZ). Normalize both to the same logical shape:
    * `ts` = session-local TimestampType (micros) and `ts_ns` = exact
    * nanos-since-epoch long (the ordering key — integer arithmetic,
    * no double rounding at 1e18 magnitudes). */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case _ =>
        // TIMESTAMP_NTZ (or LTZ): the NTZ→LTZ cast interprets the
        // wall clock in the SESSION time zone, so a non-UTC session
        // would silently shift every ts_ns by the zone offset and
        // diverge from the oracle (which reads the raw micros). All
        // project sessions pin UTC; for library callers, fail LOUDLY
        // instead of shifting. Column order matches the nanos branch
        // (ts_ns mid-schema, ts last) so consumers never see an
        // encoding-dependent layout.
        require(s.conf.get("spark.sql.session.timeZone") == "UTC",
          "events' TIMESTAMP_NTZ encoding requires " +
            "spark.sql.session.timeZone=UTC (a non-UTC session would " +
            "shift ts_ns by the zone offset)")
        val ts = col("ts").cast(org.apache.spark.sql.types.TimestampType)
        raw.select(col("event_id"),
          (unix_micros(ts) * lit(1000L)).as("ts_ns"),
          col("user_id"), col("event_type"), col("value"), col("props"),
          ts.as("ts"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
