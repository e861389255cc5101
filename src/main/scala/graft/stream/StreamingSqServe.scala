package graft.stream

import graft.ops.{Embeddings, Pq, Sq}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming SQ8 serving — the deployment seam of q81, keeping the
  * serving-seam family total (ANN/IVF, BM25, LM, DSIR, PQ, IVFADC,
  * Dedup, NearDedup, Ingest, and now SQ8): the per-dim bounds persist
  * as a 64-row artifact ([[graft.ops.Sq.saveBounds]]), the
  * 4×-compressed codes relation builds once, and each micro-batch
  * runs the SAME [[graft.ops.Sq.sq8Serve]] the q81 oracle certifies,
  * so batch/stream agreement is an identity (StreamingSqServeSpec).
  *
  * At 100 TB: the codes relation never moves; each micro-batch
  * broadcasts only its probe rows (the q45/q77 serve shape over a
  * relation 4× smaller than the raw vectors). */
object StreamingSqServe {

  /** Start the serving loop: load the bounds artifact, build and
    * persist the codes relation, then score each micro-batch of
    * `queries` — a STREAMING DataFrame with (q_id: long, embedding:
    * array<float>) — and hand the ranked result to `onBatch`.
    *
    * Stale-bounds contract: nothing forces `boundsPath` to have been
    * learned from `corpusDir`'s CURRENT snapshot. If the corpus has
    * drifted past the artifact's per-dim [min, max], encoding
    * SATURATES those values to the grid edge ([[graft.ops.Sq.encode]]
    * clamps to [0, 255] — the FAISS SQ8 behavior, spec-pinned), so
    * the byte-code invariant holds unconditionally; what degrades is
    * recall at the drifted edges, which is the operational signal to
    * re-learn the bounds (ADVICE r10).
    *
    * `excludeSelf`: pass true only when the stream's q_ids ARE corpus
    * vec_ids (see [[graft.ops.Sq.sq8Serve]]). */
  def run(spark: SparkSession, queries: DataFrame,
          corpusDir: String, boundsPath: String, checkpointDir: String,
          k: Int = 5, excludeSelf: Boolean = false)
         (onBatch: DataFrame => Unit): StreamingQuery = {
    val (mins, maxs) = Sq.loadBounds(spark, boundsPath)
    val codes = graft.ops.Caches.persist(
      Sq.encode(Embeddings.quantized(spark, corpusDir), mins, maxs))
    queries.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        onBatch(Sq.sq8Serve(codes, mins, maxs, Pq.quantizeQueries(batch), k, excludeSelf))
      }
      .start()
  }
}
