package graft

import graft.stream.StreamingIngest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** The composed streaming ingest filter: quality gate → PII redaction
  * → watermarked exact dedup, end-to-end over MemoryStream. */
class StreamingIngestSpec extends SparkSpec {

  test("ingestStream: gate drops short docs, PII scrubs, dedup keys on redacted text") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    def ts(m: Int): Timestamp = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")

    val input = MemoryStream[(Timestamp, Long, String)]
    val out = StreamingIngest.ingestStream(
      input.toDF().toDF("ts", "doc_id", "text"),
      minTokens = 3, horizon = "10 minutes")
    val q = out.writeStream.format("memory").queryName("ingest_out")
      .outputMode("append").start()
    try {
      input.addData(
        // survives: 5 tokens, one email scrubbed
        (ts(0), 1L, "contact us at bob@example.com today"),
        // dropped by the quality gate: 2 tokens
        (ts(1), 2L, "too short"))
      q.processAllAvailable()
      // SECOND micro-batch: within one batch, which of two
      // redaction-identical docs reaches the dedup state first is
      // partition order, not arrival order — the batch boundary makes
      // doc 1 the deterministic first arrival (SkewAndStreamDedupSpec
      // pattern)
      input.addData(
        // PII-only difference from doc 1 → SAME text after redaction →
        // deduped against doc 1 (hash must key on the REDACTED text)
        (ts(2), 3L, "contact us at alice@example.org today"),
        // distinct content, no PII → survives untouched
        (ts(3), 4L, "a completely different clean document here"))
      q.processAllAvailable()
      val rows = spark.table("ingest_out").collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[String]("clean_text"), r.getAs[Long]("n_redacted")))).toMap
      assert(rows.keySet == Set(1L, 4L))
      assert(rows(1L)._1 == "contact us at <EMAIL> today")
      assert(rows(1L)._2 == 1L)
      assert(rows(4L)._2 == 0L)
    } finally q.stop()
  }
}
