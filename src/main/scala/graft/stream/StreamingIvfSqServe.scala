package graft.stream

import graft.ops.{Embeddings, Pq, Sq}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming IVF+SQ8 serving — the deployment shape of q82, the
  * routed twin of [[StreamingSqServe]] exactly as
  * [[StreamingIvfPqServe]] is the routed twin of [[StreamingPqServe]]:
  * a service persists the coarse quantizer
  * ([[graft.ops.Embeddings.saveQuantizer]]) and the RESIDUAL bounds
  * ([[graft.ops.Sq.saveBounds]] over the residual relation), builds
  * the routed 4×-compressed codes relation once, and scores an
  * unbounded query stream against it.
  *
  * Shape: stream-static via foreachBatch, the [[StreamingAnnServe]]
  * rationale; each micro-batch runs the SAME
  * [[graft.ops.Sq.ivfSq8Serve]] the q82 oracle certifies, so
  * batch/stream agreement is an identity (StreamingIvfSqServeSpec).
  *
  * At 100 TB: the codes relation never moves, is 4×-compressed AND
  * routed — each micro-batch broadcasts probe rows that equi-join
  * only their nprobe cells' codes (persist the codes partitioned by
  * cell and the probed cells prune at listing time — StorageSpec
  * proves it through this serve path). The stale-bounds saturation
  * contract of [[StreamingSqServe]] applies to the residual grid
  * identically. */
object StreamingIvfSqServe {

  /** Start the serving loop: load both persisted artifacts, build and
    * persist the routed codes relation, then score each micro-batch
    * of `queries` — a STREAMING DataFrame with (q_id: long,
    * embedding: array<float>) — and hand the ranked result to
    * `onBatch`.
    *
    * `excludeSelf`: pass true only when the stream's q_ids ARE corpus
    * vec_ids (see [[graft.ops.Sq.ivfSq8Serve]]).
    *
    * `selector`: an optional metadata predicate over the tier's
    * columns (the q86 filtered-search contract — build the tier with
    * [[graft.ops.Sq.ivfSq8CodesWithLabel]] so the filterable payload
    * rides it): candidates failing it drop at serve time, per
    * micro-batch, with training/routing untouched. A service-level
    * selector (e.g. a tenant filter); per-REQUEST selectors call
    * [[graft.ops.Sq.ivfSq8Serve]] on a filtered view directly. */
  def run(spark: SparkSession, queries: DataFrame,
          corpusDir: String, quantizerPath: String, boundsPath: String,
          checkpointDir: String,
          k: Int = 5, nprobe: Int = 2, excludeSelf: Boolean = false,
          selector: Option[org.apache.spark.sql.Column] = None)
         (onBatch: DataFrame => Unit): StreamingQuery = {
    val cents = Embeddings.loadQuantizer(spark, quantizerPath)
    val (mins, maxs) = Sq.loadBounds(spark, boundsPath)
    val tier = if (selector.isDefined) Sq.ivfSq8CodesWithLabel(spark, corpusDir, cents, mins, maxs)
               else Sq.ivfSq8Codes(spark, corpusDir, cents, mins, maxs)
    val codes = graft.ops.Caches.persist(selector.map(tier.filter).getOrElse(tier))
    queries.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        onBatch(Sq.ivfSq8Serve(codes, cents, mins, maxs,
          Pq.quantizeQueries(batch), k, nprobe, excludeSelf))
      }
      .start()
  }
}
