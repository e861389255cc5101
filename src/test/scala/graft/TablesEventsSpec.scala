package graft

import graft.ops.Tables
import org.apache.spark.sql.functions._

/** Tables.events' dual physical encoding (TESTDATA drift between
  * rounds): TIMESTAMP(NANOS)-as-long and TIMESTAMP(MICROS)/NTZ must
  * normalize to the SAME logical relation — (ts_ns: exact nanos long,
  * ts: session TimestampType micros) in the same column order — or
  * every events query silently depends on which generation of
  * testdata it runs against. */
class TablesEventsSpec extends SparkSpec {
  import spark.implicits._

  // one logical row set; micros chosen so the nanos are micro-aligned
  // (the only values both encodings can represent exactly)
  private val rowsUs = Seq(
    (1L, 1700000000000000L, 10L, "click", 1.5, """{"k":"1"}"""),
    (2L, 1700000000123456L, 11L, "purchase", 2.5, """{"k":"x"}"""),
    (3L, 1690000000000001L, 10L, "signup", 0.0, """{"k":"7"}"""))

  private def writeBoth(): (String, String) = {
    val base = java.nio.file.Files.createTempDirectory("events-enc").toString
    val nanosDir = s"$base/nanos"; val microsDir = s"$base/micros"
    // nanos-as-long generation (the pre-r7 physical schema)
    rowsUs.map { case (id, us, u, t, v, p) => (id, us * 1000L, u, t, v, p) }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$nanosDir/events.parquet")
    // timestamp[us] generation (the r7+ physical schema): NTZ column
    rowsUs.map { case (id, us, u, t, v, p) =>
      (id, java.time.LocalDateTime.ofEpochSecond(
        us / 1000000L, (us % 1000000L).toInt * 1000, java.time.ZoneOffset.UTC),
        u, t, v, p)
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$microsDir/events.parquet")
    (nanosDir, microsDir)
  }

  test("both physical encodings normalize to the identical relation") {
    val (nanosDir, microsDir) = writeBoth()
    // precondition: the fixtures really exercise BOTH branches
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    assert(spark.read.parquet(s"$nanosDir/events.parquet")
      .schema("ts").dataType == LongType)
    assert(spark.read.parquet(s"$microsDir/events.parquet")
      .schema("ts").dataType == TimestampNTZType)

    val a = Tables.events(spark, nanosDir)
    val b = Tables.events(spark, microsDir)
    // same column ORDER (a positional consumer must not see an
    // encoding-dependent layout)
    assert(a.columns.toSeq == b.columns.toSeq)
    assert(a.schema == b.schema)
    val collect = (df: org.apache.spark.sql.DataFrame) =>
      df.orderBy(col("event_id")).collect().map(_.toSeq).toSeq
    assert(collect(a) == collect(b))
    // ts_ns is the exact nanos and ts the micros instant
    val m = collect(a).map(r => r.head -> r).toMap
    assert(m(1L)(1) == 1700000000000000000L)
    assert(m(2L)(1) == 1700000000123456000L)
    assert(m(2L).last.asInstanceOf[java.sql.Timestamp].getTime == 1700000000123L)
  }

  test("micros encoding fails loudly on a shifted session; zero-offset aliases pass") {
    val (_, microsDir) = writeBoth()
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val e = intercept[IllegalArgumentException](
        Tables.events(spark, microsDir))
      assert(e.getMessage.contains("zero-offset"))
      // equivalent zero-offset zone ids are NOT rejected (the guard
      // targets shifted sessions, not spelling)
      for (tz <- Seq("Etc/UTC", "GMT", "+00:00")) {
        spark.conf.set("spark.sql.session.timeZone", tz)
        assert(Tables.events(spark, microsDir).count() == 3, s"zone $tz")
      }
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("a third unrecognized ts encoding fails at load, not silently casts") {
    // a future testdata generation shipping ts as STRING (or int32,
    // date, ...) must surface as a loud load error — the r7 bench
    // lost a whole round to silent schema drift (ADVICE r8)
    val base = java.nio.file.Files.createTempDirectory("events-str").toString
    rowsUs.map { case (id, us, u, t, v, p) => (id, us.toString, u, t, v, p) }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$base/events.parquet")
    val e = intercept[IllegalStateException](Tables.events(spark, base))
    assert(e.getMessage.contains("unrecognized physical type"))
  }
}
