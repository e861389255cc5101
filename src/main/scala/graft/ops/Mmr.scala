package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MAXIMAL MARGINAL RELEVANCE re-ranking (Carbonell & Goldstein,
  * SIGIR 1998) — the standard production DIVERSITY stage of a
  * retrieval serve: plain top-k over a corpus with near-duplicates
  * returns k copies of one answer; MMR greedily selects the next
  * result by relevance MINUS similarity to what is already selected,
  * so the emitted list covers the query's neighborhood instead of
  * re-stating its nearest cluster. RAG serving pipelines run exactly
  * this between retrieval and the context window.
  *
  * This engine's composition (q92) mirrors q83's two-stage shape with
  * diversity instead of accuracy as the stage-2 objective: stage 1
  * generates `r` ≫ k candidates per probe through the ROUTED IVF+SQ8
  * serve (q82 — the 64 B/vec tier, probed-cell pruning and all);
  * stage 2 is CANDIDATE-SIZED — candidates join back to the exact
  * integer grid once, and the greedy selection runs k rounds of
  * candidate-bounded joins. The corpus is touched only by stage 1.
  *
  * Exactness: with the conventional λ = 1/2 the MMR objective
  * argmax_d [λ·sim(q,d) − (1−λ)·max_{s∈S} sim(d,s)] is, on the
  * distance domain and scaled by 2 (a positive constant — argmax
  * unchanged), argmin_d [dist(q,d) − min_{s∈S} dist(d,s)] — with
  * dist the exact-integer squared L2 on the q45 grid, every score in
  * the greedy loop is an exact BIGINT and the whole selection replays
  * bit-for-bit in DuckDB (the q92 oracle unrolls the same k rounds as
  * CTEs). Ties break by neighbor_id at every step, so the selection
  * is a total order.
  */
object Mmr {

  /** q92 — MMR-diversified top-k over routed IVF+SQ8 candidates:
    * stage 1 = [[Sq.ivfSq8TopK]] at k = `r` (train coarse quantizer,
    * encode residuals on the SQ8 grid, serve the probe set
    * `vec_id % queryMod = 0` under the ProbeCap with nprobe-cell
    * pruning, self excluded); stage 2 = [[mmrSelect]] over those
    * candidates on the exact integer grid.
    *
    * Output (q_id, rank, neighbor_id, est): rank = MMR selection
    * order (1 = nearest candidate — the first pick has no diversity
    * term), est = the EXACT squared L2 distance to the query (not
    * the SQ8 estimate), so downstream consumers read true distances.
    *
    * At 100 TB: stage 1's cost is the audited q82 serve
    * (nprobe/nCells of the 4 B+64 B tiers); stage 2 costs k rounds of
    * joins over ≤ nProbes·r rows. Diversity quality is bounded by the
    * candidate pool — raise `r` when the corpus is duplicate-heavy
    * (the q83 recall-vs-r dial, applied to coverage; MEASURED by
    * [[graft.tools.DiversityReport.coverageVsR]] — coverage-vs-r
    * tables per geometry in bench/SCALING_r12.md). */
  def mmrRerankTopK(spark: SparkSession, dir: String,
                    k: Int = 5, r: Int = Pq.RefineR, queryMod: Int = 50,
                    nprobe: Int = 2,
                    nCells: Int = Embeddings.OracleCells,
                    iters: Int = Embeddings.OracleIters): DataFrame = {
    require(r >= k, s"MMR candidate budget r=$r must cover k=$k")
    val cands = Sq.ivfSq8TopK(spark, dir, k = r, queryMod = queryMod,
        nprobe = nprobe, nCells = nCells, iters = iters)
      .select(col("q_id"), col("neighbor_id"))
    mmrSelect(Embeddings.quantized(spark, dir), cands, k)
  }

  /** Exact squared L2 between two qv-grid vector COLUMNS (by name) —
    * ‖a‖² − 2⟨a,b⟩ + ‖b‖², each term an exact integer via the codegen
    * vec_dot. */
  private def sqDist(a: String, b: String): Column =
    expr(s"vec_dot($a, $a)") - lit(2L) * expr(s"vec_dot($a, $b)") +
      expr(s"vec_dot($b, $b)")

  /** The greedy MMR selection: `vecs` is the exact grid relation
    * (vec_id, qv) the candidates re-score against (the SAME relation
    * stage 1 encoded from — the q83 refine contract); `cands` carries
    * (q_id, neighbor_id), ≤ r rows per query BY CONTRACT (a stage-1
    * top list). Returns (q_id, rank, neighbor_id, est), ≤ k rows per
    * query — fewer when a query has fewer candidates (the selection
    * never invents candidates stage 1 didn't produce).
    *
    * Round structure: pick 1 is the relevance argmin; each later
    * round anti-joins the selected set off the pool, attaches
    * div(d) = min_{s∈S} dist(d,s) via one candidate-sized
    * join+min-aggregate against the (persisted) pairwise-distance
    * relation, and takes the (rel − div, neighbor_id) argmin per
    * query. The growing selected set is localCheckpoint'ed (lazy)
    * each round — the [[LlmOps.connectedComponents]] discipline — so
    * the logical plan stays O(1) deep per round instead of nesting
    * 3^k candidate subtrees; the checkpointed rows are ≤ nProbes·k,
    * trivially executor-resident at any corpus size (the blocks are
    * unreplicated, the right trade for a k-round candidate-sized
    * loop — see the connectedComponents scaladoc for the reliable
    * alternative). */
  def mmrSelect(vecs: DataFrame, cands: DataFrame, k: Int): DataFrame =
    mmrSelectWith(vecs.select(col("vec_id").as("q_id"), col("qv").as("q_v")),
      vecs, cands, k)

  /** [[mmrSelect]] with an EXPLICIT query relation (q_id, q_v) — the
    * external-query seam ([[graft.stream.StreamingMmrServe]] feeds
    * each micro-batch's own vectors here; the batch q92 derives the
    * relation from the corpus because its probes ARE corpus rows). */
  def mmrSelectWith(queries: DataFrame, vecs: DataFrame,
                    cands: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    val spark = vecs.sparkSession
    graft.functions.VecDot.register(spark)
    // candidates join back to the exact grid ONCE (broadcast: the
    // candidate list is top-list-bounded); rel = exact dist(q, d)
    val qs = queries.select(col("q_id"), col("q_v"))
    val nb = vecs.select(col("vec_id").as("neighbor_id"), col("qv").as("n_v"))
    val cand = Caches.persist(
      nb.join(broadcast(cands), Seq("neighbor_id"))
        .join(broadcast(qs), Seq("q_id"))
        .withColumn("rel", sqDist("q_v", "n_v"))
        .select(col("q_id"), col("neighbor_id"), col("n_v"), col("rel")))
    // pairwise candidate-candidate distances per query: ≤ r² rows per
    // query, computed once, read by every round
    val pair = Caches.persist(
      cand.select(col("q_id"), col("neighbor_id").as("a"), col("n_v").as("va"))
        .join(cand.select(col("q_id"), col("neighbor_id").as("b"), col("n_v").as("vb")),
          Seq("q_id"))
        .filter(col("a") =!= col("b"))
        .withColumn("d_ab", sqDist("va", "vb"))
        .select(col("q_id"), col("a"), col("b"), col("d_ab")))
    val w1 = Window.partitionBy(col("q_id")).orderBy(col("rel"), col("neighbor_id"))
    var sel = cand
      .withColumn("rn", row_number().over(w1)).filter(col("rn") === 1)
      .select(col("q_id"), col("neighbor_id"), col("rel"), lit(1L).as("rank"))
      .localCheckpoint(eager = false)
    for (i <- 2 to k) {
      val selected = sel.select(col("q_id"), col("neighbor_id"))
      val div = pair
        .join(selected.withColumnRenamed("neighbor_id", "b"), Seq("q_id", "b"))
        .groupBy(col("q_id"), col("a").as("neighbor_id"))
        .agg(min(col("d_ab")).as("div"))
      val wi = Window.partitionBy(col("q_id"))
        .orderBy((col("rel") - col("div")).as("obj"), col("neighbor_id"))
      val pick = cand
        .join(selected, Seq("q_id", "neighbor_id"), "left_anti")
        .join(div, Seq("q_id", "neighbor_id"))
        .withColumn("rn", row_number().over(wi)).filter(col("rn") === 1)
        .select(col("q_id"), col("neighbor_id"), col("rel"), lit(i.toLong).as("rank"))
      sel = sel.unionByName(pick).localCheckpoint(eager = false)
    }
    sel.select(col("q_id"), col("rank"), col("neighbor_id"), col("rel").as("est"))
      .orderBy(col("q_id"), col("rank"))
  }
}
