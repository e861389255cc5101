package graft.stream

import graft.ops.{Caches, Embeddings, Mmr, Pq, Sq}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming MMR serving — the deployment shape of q92: a RAG-style
  * retrieval service answers an unbounded query stream with a
  * DIVERSIFIED top-k — per micro-batch, the routed IVF+SQ8 serve
  * generates r candidates per query (the q82 artifact pair: coarse
  * quantizer + residual bounds, codes built once and persisted) and
  * the greedy MMR selection re-ranks them on the exact integer grid
  * (the persisted raw qv tier — the q83/q92 refine contract).
  *
  * Shape: stream-static via foreachBatch (the [[StreamingAnnServe]]
  * rationale); each micro-batch runs the SAME [[graft.ops.Sq
  * .ivfSq8Serve]] → [[graft.ops.Mmr.mmrSelectWith]] chain the q92
  * oracle certifies — the query relation is the batch's own
  * quantized vectors, so external query ids never need corpus rows.
  * Batch/stream agreement is an identity (StreamingMmrServeSpec,
  * across micro-batch boundaries — MMR is per-query, so batch splits
  * cannot change any answer).
  *
  * At 100 TB: the codes and the exact tier stay persisted across
  * batches; per batch the candidate stage equi-joins only the probed
  * cells and the MMR stage is ONE grouped exchange of ≤ nQueries·r
  * candidate rows, the k greedy rounds running inside each query's
  * group buffer (the [[graft.ops.Mmr.mmrSelect]] scaladoc) — no
  * per-batch checkpoint blocks, no per-round barriers, so micro-batch
  * latency is the serve join plus a single shuffle. */
object StreamingMmrServe {

  /** Start the serving loop: load the q82 artifact pair, build and
    * persist the routed codes AND the exact qv tier, then answer each
    * micro-batch of `queries` — a STREAMING DataFrame with (q_id:
    * long, embedding: array<float>) — with the MMR-diversified
    * per-query top-`k` via `onBatch`.
    *
    * `excludeSelf`: pass true only when the stream's q_ids ARE corpus
    * vec_ids (the q92 conformance situation). */
  def run(spark: SparkSession, queries: DataFrame,
          corpusDir: String, quantizerPath: String, boundsPath: String,
          checkpointDir: String,
          k: Int = 5, r: Int = Pq.RefineR, nprobe: Int = 2,
          excludeSelf: Boolean = false)
         (onBatch: DataFrame => Unit): StreamingQuery = {
    val cents = Embeddings.loadQuantizer(spark, quantizerPath)
    val (mins, maxs) = Sq.loadBounds(spark, boundsPath)
    val codes = Caches.persist(Sq.ivfSq8Codes(spark, corpusDir, cents, mins, maxs))
    val exact = Caches.persist(
      Embeddings.quantized(spark, corpusDir).select(col("vec_id"), col("qv")))
    queries.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val probes = Pq.quantizeQueries(batch)
        val cands = Sq.ivfSq8Serve(codes, cents, mins, maxs, probes,
            k = r, nprobe = nprobe, excludeSelf = excludeSelf)
          .select(col("q_id"), col("neighbor_id"))
        onBatch(Mmr.mmrSelectWith(
          probes.select(col("q_id"), col("qv").as("q_v")), exact, cands, k))
      }
      .start()
  }
}
