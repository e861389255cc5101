package graft.stream

import graft.ops.{Caches, Embeddings, Pq, Retrieval, Sq}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming HYBRID retrieval — the deployment shape of q88, and the
  * seam where the two serving families this engine built meet: a
  * hybrid search service persists the BM25 index
  * ([[graft.ops.Retrieval.bm25Save]]) AND the routed IVF+SQ8
  * artifact pair ([[graft.ops.Embeddings.saveQuantizer]] +
  * [[graft.ops.Sq.saveBounds]]), builds the routed codes relation
  * once, and answers an unbounded stream of (text, vector) queries —
  * each micro-batch runs BOTH legs through the exact batch serves
  * the q71/q82 oracles certify and fuses them with the same
  * exact-integer [[graft.ops.Retrieval.rrfFuse]] the q88 oracle
  * replays, so batch/stream agreement is an identity
  * (StreamingHybridServeSpec, across micro-batch boundaries — RRF is
  * per-query, so batch splits cannot change any answer).
  *
  * At 100 TB: the postings and the 4×-compressed routed codes stay
  * persisted across batches; per batch the BM25 leg broadcasts only
  * its own distinct query terms and the ANN leg equi-joins only its
  * probed cells; the fusion is candidate-sized (≤ 2·perList rows per
  * query) and never touches either corpus-sized relation. */
object StreamingHybridServe {

  /** Start the serving loop: load all three artifacts, persist the
    * static sides, then answer each micro-batch of `queries` — a
    * STREAMING DataFrame with (query_id: long, query: string,
    * embedding: array<float>) — with the fused per-query top-`k`
    * (query_id, rank, doc_id, rrf_score) via `onBatch`.
    *
    * `excludeSelf`: pass true only when the stream's query_ids ARE
    * corpus ids (the q88 conformance situation); an external id
    * matches nothing on either leg and is unaffected. */
  def run(spark: SparkSession, queries: DataFrame,
          corpusDir: String, indexPath: String,
          quantizerPath: String, boundsPath: String,
          checkpointDir: String,
          k: Int = 10, perList: Int = 10, nprobe: Int = 2,
          excludeSelf: Boolean = false)
         (onBatch: DataFrame => Unit): StreamingQuery = {
    val ix0 = Retrieval.bm25Load(spark, indexPath)
    val ix = ix0.copy(postings = Caches.persist(ix0.postings))
    val cents = Embeddings.loadQuantizer(spark, quantizerPath)
    val (mins, maxs) = Sq.loadBounds(spark, boundsPath)
    val codes = Caches.persist(Sq.ivfSq8Codes(spark, corpusDir, cents, mins, maxs))
    queries.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val lex = Retrieval.bm25TopK(ix,
            batch.select(col("query_id"), col("query")), perList, excludeSelf)
          .select(col("query_id"), col("rank"), col("doc_id"))
        val sem = Sq.ivfSq8Serve(codes, cents, mins, maxs,
            Pq.quantizeQueries(
              batch.select(col("query_id").as("q_id"), col("embedding"))),
            perList, nprobe, excludeSelf)
          .select(col("q_id").as("query_id"), col("rank"),
            col("neighbor_id").as("doc_id"))
        onBatch(Retrieval.rrfFuse(lex, sem, k))
      }
      .start()
  }
}
