package graft.stream

import graft.ops.{Embeddings, Pq, Sq}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming IVFADC + SQ8-refine serving — the deployment shape of
  * q85, and the END STATE of the serving-seam family: a service that
  * keeps NO raw vectors at all. It persists three training artifacts
  * (coarse quantizer [[graft.ops.Embeddings.saveQuantizer]], residual
  * PQ codebooks [[graft.ops.Pq.saveCodebooks]], residual SQ8 bounds
  * [[graft.ops.Sq.saveBounds]]), builds BOTH compressed tiers once —
  * the routed 4 B/vec ADC codes and the 64 B/vec SQ8 refine codes —
  * and scores an unbounded query stream in two stages per micro-batch.
  *
  * Shape: stream-static via foreachBatch, the [[StreamingAnnServe]]
  * rationale; each micro-batch runs the SAME
  * [[graft.ops.Sq.ivfPqSq8RefineServe]] the q85 oracle certifies, so
  * batch/stream agreement is an identity (StreamingRefineServeSpec).
  *
  * At 100 TB: neither tier ever moves — each micro-batch broadcasts
  * probe rows that equi-join only their nprobe cells' rows in BOTH
  * tiers (persist both partitioned by cell and the probed cells prune
  * at listing time — StorageSpec proves it through this composed
  * serve path), and the refine join stays candidate-sized
  * (nProbes·r rows). The raw 256 B/vec corpus is read ONCE at
  * startup — both tiers encode off one shared, cached residual pass
  * over it ([[graft.ops.Sq.buildRefineTiers]]) — and never again: no
  * micro-batch touches raw vectors, so the steady-state working set
  * is the two compressed tiers alone. */
object StreamingRefineServe {

  /** Start the serving loop: load the three persisted artifacts,
    * build and persist both compressed tiers, then score each
    * micro-batch of `queries` — a STREAMING DataFrame with (q_id:
    * long, embedding: array<float>) — and hand the ranked result to
    * `onBatch`.
    *
    * `excludeSelf`: pass true only when the stream's q_ids ARE corpus
    * vec_ids (see [[graft.ops.Sq.ivfPqSq8RefineServe]]). */
  def run(spark: SparkSession, queries: DataFrame,
          corpusDir: String, quantizerPath: String, codebooksPath: String,
          boundsPath: String, checkpointDir: String,
          k: Int = 5, r: Int = Pq.RefineR, nprobe: Int = 2,
          excludeSelf: Boolean = false)
         (onBatch: DataFrame => Unit): StreamingQuery = {
    val cents = Embeddings.loadQuantizer(spark, quantizerPath)
    val books = Pq.loadCodebooks(spark, codebooksPath)
    val (mins, maxs) = Sq.loadBounds(spark, boundsPath)
    val (pqTier, sqTier) = Sq.buildRefineTiers(spark, corpusDir, cents, books, mins, maxs)
    val pqCodes = graft.ops.Caches.persist(pqTier)
    val sqCodes = graft.ops.Caches.persist(sqTier)
    queries.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        onBatch(Sq.ivfPqSq8RefineServe(pqCodes, sqCodes, cents, books, mins, maxs,
          Pq.quantizeQueries(batch), k, r, nprobe, excludeSelf))
      }
      .start()
  }
}
