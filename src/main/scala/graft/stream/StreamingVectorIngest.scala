package graft.stream

import graft.ops.{Embeddings, Sq, Storage}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming rolling ingest into a ROUTED SQ8 index — the continuous
  * form of q87, and the write half of the serving loop
  * [[StreamingIvfSqServe]] reads: a deployment trains ONCE on the
  * corpus as of the last rebuild ([[graft.ops.Sq.trainFrozenIvfSq8]]),
  * persists the frozen artifact pair (coarse quantizer + residual
  * bounds), publishes the base tranche's codes as a snapshot — and
  * then every micro-batch of NEW vectors is encoded against the
  * frozen artifacts ([[graft.ops.Sq.ivfSq8EncodeBatch]]: nearest
  * frozen cell, residual vs the cell's mean grid, clamped byte codes)
  * and UPSERTED as the next snapshot version. Readers resolve the
  * newest committed version between batches and never see a partial
  * ingest (the upsert protocol's atomic-publish contract, StorageSpec).
  *
  * At 100 TB: the per-batch work is batch-sized — one broadcast
  * mean-grid join plus row-local projections — and the upsert
  * rewrites only the merged relation it must (copy-on-write on the
  * 64 B/vec tier, NEVER the raw corpus). Drifted delta components
  * saturate to the frozen grid's edge; when drift accumulates past
  * usefulness, the deployment re-runs the BUILD stage (new tranche,
  * new artifacts, fresh snapshot root) — retraining never happens on
  * the ingest path, exactly FAISS's train()/add() split.
  *
  * StreamingVectorIngestSpec proves the loop end-to-end: base publish
  * + two streamed delta batches, then a serve off the resolved
  * snapshot is bit-identical to q87's one-pass encode of the same
  * corpus. */
object StreamingVectorIngest {

  /** Start the ingest loop: load the frozen artifact pair and upsert
    * each micro-batch of `vectors` — a STREAMING DataFrame with
    * (vec_id: long, embedding: array<float>) — into the codes
    * snapshot at `snapshotRoot`. Batches are keyed by vec_id, so a
    * re-delivered vector UPDATES its codes rather than duplicating
    * them (the upsert merge contract). */
  def run(spark: SparkSession, vectors: DataFrame,
          snapshotRoot: String, quantizerPath: String, boundsPath: String,
          checkpointDir: String): StreamingQuery = {
    val cents = Embeddings.loadQuantizer(spark, quantizerPath)
    val (mins, maxs) = Sq.loadBounds(spark, boundsPath)
    vectors.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Storage.upsertSnapshot(spark, snapshotRoot,
          Sq.ivfSq8EncodeBatch(batch, cents, mins, maxs), "vec_id")
        ()
      }
      .start()
  }
}
