package graft.ops

import org.apache.spark.sql.DataFrame

/** Session-cache registry — the one place that documents the cache
  * contract for every `persist()` in the query builders.
  *
  * Query builders (q20/q21/q27/q29/q31) persist subtrees that feed
  * multiple consumers inside ONE query (self-joins, re-joins); the
  * returned DataFrame is lazy, so the builder itself can never
  * unpersist — the cache must outlive the builder call and is only
  * releasable after the caller has fully evaluated the result.
  *
  * Contract: every SESSION-LIVED `persist()` in graft.ops goes
  * through [[persist]], and harnesses (Bench, Verify, specs) call
  * [[releaseAll]] once the results are materialized. A long-lived
  * session that runs many queries therefore holds at most one query's
  * caches at a time instead of accumulating all of them (VERDICT r3
  * hygiene item). The one sanctioned exception is a persist whose
  * lifetime is a single method call and whose release sits in that
  * method's `finally` (LlmOps.connectedComponents' edge table) — a
  * registry entry would outlive it, not protect it.
  */
object Caches {
  private val live = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Persist `df` and register it for a later [[releaseAll]]. */
  def persist(df: DataFrame): DataFrame = synchronized {
    val p = df.persist()
    live += p
    p
  }

  /** Unpersist every registered cache (blocking=false: eviction is
    * async, callers don't wait on executor cleanup). */
  def releaseAll(): Unit = synchronized {
    live.foreach(df => scala.util.Try(df.unpersist()))
    live.clear()
  }
}
