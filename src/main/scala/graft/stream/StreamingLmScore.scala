package graft.stream

import graft.ops.{Caches, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming perplexity scoring — the deployment shape the bigram-LM
  * train/save split exists for (the CCNet-style curation service,
  * north-star extension): the quality model is trained ONCE
  * ([[graft.ops.TextOps.lmTrain]] → `lmSave`), then every serving job
  * loads the artifact and scores an unbounded STREAM of incoming
  * documents — a crawl drop, an ingest queue — without ever re-paying
  * the two training corpus passes.
  *
  * Shape: stream-static via foreachBatch, the [[StreamingAnnServe]]
  * pattern: the static side — the three VOCABULARY-sized model tables
  * — is loaded once and persisted; each micro-batch of (doc_id, text)
  * rows runs the SAME batch plan the TextOpsSpec brute force
  * certifies ([[graft.ops.TextOps.lmScore]]: row-local bigram
  * explode, unk-map, model left-joins, per-doc cross-entropy).
  * foreachBatch rather than a streaming aggregation because each doc
  * scores exactly once from its own rows — there is no cross-batch
  * state, no watermark semantics wanted, and batch/stream agreement
  * becomes a spec-checkable identity (StreamingLmScoreSpec).
  *
  * At 100 TB: the model never moves (vocabulary-sized sides that AQE
  * broadcasts; the [[graft.ops.LlmOps.dropList]] no-forced-hint
  * rule); each batch ships only its own bigram rows. Result delivery
  * is the caller's `onBatch` (quality-score sink, keep/drop filter,
  * feature store) — side-effect sinks are caller-owned, matching the
  * K4/K5 store pattern in [[ReviewStateMachine]]. */
object StreamingLmScore {

  /** Start the scoring loop: load the persisted model, persist its
    * tables, then score each micro-batch of `docs` — a STREAMING
    * DataFrame with (doc_id: long, text: string) — and hand the
    * per-doc (n_tokens, cross_entropy, perplexity) result to
    * `onBatch`. The persisted model tables follow the [[Caches]]
    * releaseAll contract on teardown. */
  def run(spark: SparkSession, docs: DataFrame, modelPath: String,
          checkpointDir: String)(onBatch: DataFrame => Unit): StreamingQuery = {
    val m = TextOps.lmLoad(spark, modelPath)
    val lm = m.copy(
      vocab = Caches.persist(m.vocab),
      bigrams = Caches.persist(m.bigrams),
      contexts = Caches.persist(m.contexts))
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        onBatch(TextOps.lmScore(batch, lm))
      }
      .start()
  }
}
