package graft.stream

import graft.ops.{Embeddings, Pq}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming IVFADC serving — the deployment shape of q79, closing
  * the serving-seam family (ANN/IVF, BM25, LM, DSIR, PQ, and now
  * IVFADC each have a train-once / serve-a-stream seam): a service
  * persists the coarse quantizer ([[graft.ops.Embeddings
  * .saveQuantizer]]) and the residual codebooks ([[graft.ops.Pq
  * .saveCodebooks]]), builds the routed 64×-compressed codes
  * relation once, and scores an unbounded query stream against it.
  *
  * Shape: stream-static via foreachBatch, the [[StreamingAnnServe]]
  * rationale; each micro-batch runs the SAME [[graft.ops.Pq
  * .ivfPqServe]] the q79 oracle certifies, so batch/stream agreement
  * is an identity (StreamingPqServeSpec, the IVFADC e2e + restart tests).
  *
  * At 100 TB: the codes relation never moves and is both compressed
  * (4 B/vector of code + the cell id) and ROUTED — each micro-batch
  * broadcasts probe rows that join only their nprobe cells' codes
  * (persist the codes partitioned by cell and the probed cells prune
  * at listing time, the Storage.partitionBy argument). */
object StreamingIvfPqServe {

  /** Start the serving loop: load both persisted artifacts, build and
    * persist the codes relation, then score each micro-batch of
    * `queries` — a STREAMING DataFrame with (q_id: long, embedding:
    * array<float>) — and hand the ranked result to `onBatch`.
    *
    * `excludeSelf`: pass true only when the stream's q_ids ARE corpus
    * vec_ids (see [[graft.ops.Pq.ivfPqServe]]). */
  def run(spark: SparkSession, queries: DataFrame,
          corpusDir: String, quantizerPath: String, codebooksPath: String,
          checkpointDir: String,
          k: Int = 5, nprobe: Int = 2, excludeSelf: Boolean = false)
         (onBatch: DataFrame => Unit): StreamingQuery = {
    val cents = Embeddings.loadQuantizer(spark, quantizerPath)
    val books = Pq.loadCodebooks(spark, codebooksPath)
    val codes = graft.ops.Caches.persist(Pq.ivfPqCodes(spark, corpusDir, cents, books))
    queries.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        onBatch(Pq.ivfPqServe(codes, cents, books,
          Pq.quantizeQueries(batch), k, nprobe, excludeSelf))
      }
      .start()
  }
}
