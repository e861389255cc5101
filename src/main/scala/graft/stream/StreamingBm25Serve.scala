package graft.stream

import graft.ops.{Caches, Retrieval}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming BM25 query serving — the search-service shape over the
  * [[graft.ops.Retrieval]] index artifact: the inverted index is
  * built and persisted ONCE (`bm25Build` → `bm25Save`), then an
  * unbounded STREAM of queries — an interactive search box, a
  * decontamination probe feed — is answered per micro-batch through
  * the exact batch plan RetrievalSpec certifies. The mirror image of
  * [[StreamingLmScore]]/[[StreamingDsirScore]]: there the corpus
  * streams against a static model; here the corpus IS the static
  * side and the queries stream.
  *
  * At scale: the postings stay persisted across batches; each batch
  * broadcasts only its own distinct query terms, so per-batch cost
  * is proportional to the matched postings, never the corpus. Result
  * delivery is the caller's `onBatch` (response sink, results
  * cache), the caller-owned-sink rule. */
object StreamingBm25Serve {

  /** Start the serving loop: load the index artifact, persist its
    * postings ([[Caches]] releaseAll contract), then answer each
    * micro-batch of `queries` — a STREAMING DataFrame with
    * (query_id: long, query: string) — with the per-query top-`k`
    * (query_id, rank, doc_id, score) relation via `onBatch`. */
  def run(spark: SparkSession, queries: DataFrame, indexPath: String,
          k: Int, checkpointDir: String)
         (onBatch: DataFrame => Unit): StreamingQuery = {
    val ix0 = Retrieval.bm25Load(spark, indexPath)
    val ix = ix0.copy(postings = Caches.persist(ix0.postings))
    queries.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        onBatch(Retrieval.bm25TopK(ix, batch, k))
      }
      .start()
  }
}
