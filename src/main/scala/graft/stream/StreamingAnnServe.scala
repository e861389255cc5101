package graft.stream

import graft.ops.Embeddings
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming ANN serving — the deployment shape the q31 train/serve
  * split exists for (north-star extension; the reference has no vector
  * surface): a retrieval service trains the IVF quantizer ONCE
  * ([[graft.ops.Embeddings.trainQuantizer]] → `saveQuantizer`), then
  * every serving job loads the exact-integer artifact and scores an
  * unbounded STREAM of incoming query vectors against the corpus
  * without ever re-paying the training scans.
  *
  * Shape: stream-static via foreachBatch. The static side — the
  * [[graft.ops.Embeddings.serveIndex]] cell-assigned corpus — is built
  * once at start-up and persisted; each micro-batch of (q_id,
  * embedding) rows runs the SAME batch plan the q31 oracle certifies
  * ([[graft.ops.Embeddings.serveQueryBatch]]: quantize, probe `nprobe`
  * nearest cells, broadcast the probe rows into the cell equi-join,
  * shared top-k tail). foreachBatch rather than a streaming join
  * because the per-query top-k window is a batch-only operator — and
  * because it makes batch/stream agreement a spec-checkable identity
  * (StreamingAnnServeSpec pins it against [[graft.ops.Embeddings
  * .ivfTopKServe]]).
  *
  * At 100 TB: the index is the big relation and NEVER moves — it is
  * persisted partitioned by cell; each batch ships only its probe rows
  * (batch_size × nprobe, broadcast-sized by construction). Result
  * delivery is the caller's `onBatch` (score sink, feature store
  * write, RPC reply) — side-effect sinks are caller-owned, matching
  * the K4/K5 store pattern in [[ReviewStateMachine]]. */
object StreamingAnnServe {

  /** Start the serving loop: load the persisted quantizer, build and
    * persist the serving index, then score each micro-batch of
    * `queries` — a STREAMING DataFrame with (q_id: long, embedding:
    * array<float>) — and hand the ranked result to `onBatch`.
    *
    * The returned query owns the persisted index: stopping it leaves
    * the cache to the session's LRU (call `spark.catalog.clearCache()`
    * or unpersist via [[graft.ops.Caches.releaseAll]] when tearing
    * down, same contract as the batch operators).
    *
    * `excludeSelf`: pass true only when the stream's q_ids ARE corpus
    * vec_ids (see [[graft.ops.Embeddings.serveQueryBatch]]) — the
    * default keeps id-colliding external queries correct.
    *
    * `nSuperProbe ≥ 1` routes each micro-batch's probing two-level
    * (round 10): per-probe cost drops from nCells to ~nSuper +
    * nSuperProbe·(nCells/nSuper) distance evals — the lever that
    * matters when a standing query stream faces an O(10³+)-cell
    * quantizer, where exact probing pays per BATCH what two-level
    * assignment saved per corpus row. Recall consequence measured in
    * bench/SCALING_r10.md; a saturating setting is bit-identical to
    * the exact serve (spec-pinned), so the switch carries no
    * correctness risk at the degenerate end. */
  def run(spark: SparkSession, queries: DataFrame,
          corpusDir: String, quantizerPath: String,
          checkpointDir: String,
          k: Int = 5, nprobe: Int = 1, excludeSelf: Boolean = false,
          nSuper: Int = 0, nSuperProbe: Int = 0)
         (onBatch: DataFrame => Unit): StreamingQuery = {
    val cents = Embeddings.loadQuantizer(spark, quantizerPath)
    val index = graft.ops.Caches.persist(Embeddings.serveIndex(spark, corpusDir, cents))
    queries.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        onBatch(Embeddings.serveQueryBatch(index, cents, batch, k, nprobe, excludeSelf,
          nSuper, nSuperProbe))
      }
      .start()
  }
}
