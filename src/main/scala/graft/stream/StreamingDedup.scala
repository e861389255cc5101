package graft.stream

import graft.ops.LlmOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the continuous-ingest form of q19
  * (LLM-pipeline north star: dedup must ALSO run on the firehose, not
  * just the batch corpus).
  *
  * First-occurrence-wins per normalized-content hash within the
  * watermark horizon: `dropDuplicatesWithinWatermark` keeps one state
  * row per distinct hash and evicts it once the watermark passes, so
  * state is bounded by the dedup horizon instead of stream history —
  * the property that keeps this viable on an unbounded 100 TB/day
  * ingest. (Batch q19 keeps min-doc_id per hash; a stream has no
  * global min, so first-arrival is the streaming-correct survivor
  * rule.)
  */
object StreamingDedup {

  /** `docs` needs (ts: timestamp, doc_id, text). Emits only the first
    * document seen for each content hash within `horizon`. */
  def dedupStream(docs: DataFrame, horizon: String = "1 hour"): DataFrame =
    docs
      .withColumn("content_hash", sha2(LlmOps.normText(col("text")), 256))
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("content_hash")
}
