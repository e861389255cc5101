package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalar quantization (SQ8) — the MIDDLE point of the ANN memory
  * axis, between raw vectors (q45: 256 B/vec at Dim = 64 float) and
  * product quantization (q77/q80: 4 code bytes): one byte PER
  * DIMENSION against a per-dim [min, max] grid learned from the
  * corpus — 64 B/vec, 4× smaller than raw with far higher fidelity
  * than PQ (256 levels per dim vs 16-256 levels per 16-dim
  * subspace). The standard FAISS `SQ8` production shape; the right
  * default when memory pressure is real but recall must stay near
  * exact (the measured recall@5 floor here is far above q77's).
  *
  * Exact-replayable construction (the q81 oracle replays every step):
  *  - per-dim bounds: min_d / max_d over the quantized integer grid
  *    (floor(x·10³) — [[Embeddings.quantized]]'s contract), one
  *    64-group aggregate with map-side partials;
  *  - code: c_d = (qv_d − min_d)·255 `div` (max_d − min_d) — all
  *    Longs, integer division (operands non-negative, so Spark `div`
  *    ≡ DuckDB `//`), degenerate dims (max = min) code to 0;
  *  - decode: r_d = min_d + (c_d·(max_d − min_d)) `div` 255 — the
  *    pinned reconstruction every engine derives identically;
  *  - serve: est = Σ(qv_d − r_d)² — an exact-integer BIGINT (no
  *    division anywhere), so ranking is partition/engine-invariant;
  *    ties (est ASC, neighbor_id ASC); probes capped by the
  *    [[Pq.ProbeCap]] pattern.
  *
  * Plan shape at 100 TB: bounds are ONE 64-group aggregate (the
  * shuffle carries 64 rows); encoding and decoding are scan-riding
  * projections over dim-bounded literal arrays (128 literals — fixed
  * by Dim, not by corpus or level count); the serve is the q45/q77
  * broadcast-cross-join shape over the 4×-smaller codes relation,
  * per-pair work one codegen `vec_dot` cross term (the q·q and r·r
  * norms precompute per side). */
object Sq {

  /** Quantization levels — byte codes, FAISS SQ8. */
  val Levels = 256

  /** Per-dim (min, max) over the quantized corpus: ONE distributed
    * 64-group aggregate (posexplode → groupBy pos, map-side partials
    * — the q62 label-centroid shape), 64 rows collected. */
  private[graft] def gridBounds(vecs: DataFrame): (IndexedSeq[Long], IndexedSeq[Long]) = {
    val rows = vecs
      .select(posexplode(col("qv")).as(Seq("pos", "x")))
      .groupBy(col("pos"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .collect()
    require(rows.length == Embeddings.Dim,
      s"per-dim bounds aggregated ${rows.length} dims (want ${Embeddings.Dim})")
    val byPos = rows.map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    val dims = (0 until Embeddings.Dim).map(d => byPos(d))
    (dims.map(_._1), dims.map(_._2))
  }

  private def sqlArr(a: Seq[Long]): String = a.map(v => s"${v}L").mkString("array(", ",", ")")

  /** The SQ8 CODES relation (vec_id, codes: array<bigint> of 0..255)
    * — a scan-riding projection over the dim-bounded literal bounds
    * arrays; zero shuffle. Codes CLAMP to [0, Levels−1]: with bounds
    * learned from this corpus the clamp is an identity (qv_d ∈
    * [min_d, max_d] by construction — SqSpec pins it), and with a
    * STALE persisted bounds artifact whose grid the corpus has
    * drifted past, saturation IS the staleness semantics (the FAISS
    * SQ8 encode behavior): drifted values code to the nearest grid
    * edge instead of emitting out-of-range bytes that silently break
    * the byte-code invariant (ADVICE r10). Inside the clamp, `div` is
    * the INTEGRAL division operator; operands are non-negative on the
    * covered grid, so Spark's truncating `div` and DuckDB's flooring
    * `//` coincide — and off-grid (stale bounds) the clamp itself
    * restores engine agreement (both sides saturate to the same
    * edge). */
  private[graft] def encode(vecs: DataFrame,
                            mins: Seq[Long], maxs: Seq[Long]): DataFrame = {
    val rng = mins.zip(maxs).map { case (mn, mx) => mx - mn }
    vecs.select(col("vec_id"), expr(
      s"""transform(qv, (x, i) ->
            CASE WHEN element_at(${sqlArr(rng)}, i + 1) = 0L THEN 0L
                 ELSE least(${Levels - 1}L, greatest(0L,
                      ((x - element_at(${sqlArr(mins)}, i + 1)) * ${Levels - 1}L)
                      div element_at(${sqlArr(rng)}, i + 1))) END)""").as("codes"))
  }

  /** Pinned reconstruction onto the integer grid:
    * r_d = min_d + (c_d·range_d) div 255 (same non-negative-operand
    * `div` contract as [[encode]]). */
  private[graft] def decodeCol(mins: Seq[Long], maxs: Seq[Long]): Column = {
    val rng = mins.zip(maxs).map { case (mn, mx) => mx - mn }
    expr(
      s"""transform(codes, (c, i) ->
            element_at(${sqlArr(mins)}, i + 1) +
            (c * element_at(${sqlArr(rng)}, i + 1)) div ${Levels - 1}L)""")
  }

  /** q81 — SQ8 top-k: for every probe (vec_id % queryMod = 0, capped
    * by the [[Pq.ProbeCap]] pattern), the k nearest corpus vectors by
    * exact-integer distance to the RECONSTRUCTED vector (est ASC,
    * ties to the smaller neighbor_id, self excluded). Recall vs the
    * exact ranking is measured in SqSpec against q45's brute-force
    * baseline. */
  def sq8TopK(spark: SparkSession, dir: String,
              k: Int = 5, queryMod: Int = 50): DataFrame = {
    val vecs = Caches.persist(Embeddings.quantized(spark, dir))
    val (mins, maxs) = gridBounds(vecs)
    val codes = encode(vecs, mins, maxs)
    val probes = vecs
      .filter(col("vec_id") % queryMod === 0 && col("vec_id") < Pq.ProbeCap)
      .select(col("vec_id").as("q_id"), col("qv"))
    sq8Serve(codes, mins, maxs, probes, k, excludeSelf = true)
  }

  /** The SQ8 serve: decode rides the codes scan (row-local), the
    * probe batch broadcasts into the cross join (the q45/q77 shape),
    * per-pair work is ONE codegen `vec_dot` cross term. ONE
    * definition shared by q81 and [[graft.stream.StreamingSqServe]]
    * so batch/stream agreement is an identity. */
  def sq8Serve(codes: DataFrame, mins: Seq[Long], maxs: Seq[Long],
               probes: DataFrame, k: Int = 5,
               excludeSelf: Boolean = false): DataFrame = {
    val spark = probes.sparkSession
    graft.functions.VecDot.register(spark)
    val corpus = codes
      .withColumn("rv", decodeCol(mins, maxs))
      .select(col("vec_id").as("neighbor_id"), col("rv"),
        expr("vec_dot(rv, rv)").as("r_n"))
    val qs = probes
      .select(col("q_id"), col("qv").as("q_v"))
      .withColumn("q_n", expr("vec_dot(q_v, q_v)"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("est"), col("neighbor_id"))
    (if (excludeSelf) corpus.crossJoin(broadcast(qs)).filter(col("neighbor_id") =!= col("q_id"))
     else corpus.crossJoin(broadcast(qs)))
      .withColumn("est", col("q_n") - lit(2L) * expr("vec_dot(q_v, rv)") + col("r_n"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("est"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** Persist the learned bounds as a parquet artifact (d, mn, mx) —
    * the SQ8 counterpart of [[Embeddings.saveQuantizer]]. */
  def saveBounds(spark: SparkSession, mins: Seq[Long], maxs: Seq[Long], path: String): Unit = {
    import spark.implicits._
    mins.indices.map(d => (d, mins(d), maxs(d)))
      .toDF("d", "mn", "mx")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a [[saveBounds]] artifact in dim order. */
  def loadBounds(spark: SparkSession, path: String): (IndexedSeq[Long], IndexedSeq[Long]) = {
    val rows = spark.read.parquet(path).collect()
      .map(r => (r.getAs[Int]("d"), r.getAs[Long]("mn"), r.getAs[Long]("mx")))
      .sortBy(_._1)
    require(rows.map(_._1).toSeq == (0 until Embeddings.Dim),
      s"bounds artifact at $path does not cover dims 0 until ${Embeddings.Dim}")
    (rows.map(_._2).toIndexedSeq, rows.map(_._3).toIndexedSeq)
  }
}
