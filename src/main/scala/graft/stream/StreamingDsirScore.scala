package graft.stream

import graft.ops.{Caches, Dsir}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming DSIR importance weighting — the serving half of the
  * [[graft.ops.Dsir]] train/save split (the [[StreamingLmScore]]
  * shape): both hashed-n-gram models are loaded ONCE from their
  * persisted artifacts, and every micro-batch of incoming documents
  * — a crawl drop, an ingest queue — gets its log importance weights
  * through the exact batch plan the DsirSpec brute force certifies.
  * A selection service weighs documents as they arrive; the
  * resampling CUT stays a batch decision (Gumbel-top-k needs the
  * whole pool's keys — a stream can only weigh).
  *
  * At 100 TB of stream: the model tables are nBuckets-bounded and
  * persisted once; each batch ships only its own feature rows. Result
  * delivery is the caller's `onBatch` (weight store, threshold
  * filter), the caller-owned-sink rule. */
object StreamingDsirScore {

  /** Start the weighting loop: load both artifacts, persist their
    * bounded bucket tables ([[Caches]] releaseAll contract), then
    * hand each micro-batch's (doc_id, n_feats, log_weight) result to
    * `onBatch`. `docs` is a STREAMING DataFrame with (doc_id: long,
    * text: string). */
  def run(spark: SparkSession, docs: DataFrame, targetPath: String,
          rawPath: String, checkpointDir: String)
         (onBatch: DataFrame => Unit): StreamingQuery = {
    val t0 = Dsir.dsirLoad(spark, targetPath)
    val r0 = Dsir.dsirLoad(spark, rawPath)
    val target = t0.copy(buckets = Caches.persist(t0.buckets))
    val raw = r0.copy(buckets = Caches.persist(r0.buckets))
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        onBatch(Dsir.dsirLogWeights(batch, target, raw))
      }
      .start()
  }
}
