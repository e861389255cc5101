package graft.stream

import graft.ops.Pq
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming PQ serving — the deployment shape of the q77 ADC path
  * (north-star extension; the reference has no vector surface), the
  * memory-constrained sibling of [[StreamingAnnServe]]: a service
  * trains the [[graft.ops.Pq]] codebooks ONCE
  * ([[graft.ops.Pq.trainCodebooks]] → `saveCodebooks`), and every
  * serving job loads the M·K-row exact-integer artifact plus the
  * 64×-compressed CODES relation — never the raw vectors — then
  * scores an unbounded STREAM of query vectors against it.
  *
  * Shape: stream-static via foreachBatch, exactly the
  * [[StreamingAnnServe]] rationale (per-query top-k windows are
  * batch-only operators, and foreachBatch makes batch/stream
  * agreement a spec-checkable identity — StreamingPqServeSpec pins
  * each micro-batch's output against [[graft.ops.Pq.adcServe]]'s
  * batch result, which the q77 oracle certifies).
  *
  * At 100 TB: the codes relation is the big side and never moves
  * (persisted once at start-up; 64× smaller than the raw corpus —
  * the reason PQ serves from RAM when raw vectors cannot); each
  * micro-batch broadcasts only its probe rows, each carrying M
  * K-entry lookup arrays. Result delivery is the caller's `onBatch`
  * (score sink, RPC reply) — side-effect sinks stay caller-owned. */
object StreamingPqServe {

  /** Start the serving loop: load the persisted codebooks, build and
    * persist the codes relation, then score each micro-batch of
    * `queries` — a STREAMING DataFrame with (q_id: long, embedding:
    * array<float>) — and hand the ranked result to `onBatch`.
    *
    * `excludeSelf`: pass true only when the stream's q_ids ARE corpus
    * vec_ids (see [[graft.ops.Pq.adcServe]]). */
  def run(spark: SparkSession, queries: DataFrame,
          corpusDir: String, codebooksPath: String,
          checkpointDir: String,
          k: Int = 5, excludeSelf: Boolean = false)
         (onBatch: DataFrame => Unit): StreamingQuery = {
    val books = Pq.loadCodebooks(spark, codebooksPath)
    val codes = graft.ops.Caches.persist(Pq.buildCodes(spark, corpusDir, books))
    queries.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        onBatch(Pq.adcServe(codes, books, Pq.quantizeQueries(batch), k, excludeSelf))
      }
      .start()
  }
}
