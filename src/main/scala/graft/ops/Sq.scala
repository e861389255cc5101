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
                            mins: Seq[Long], maxs: Seq[Long],
                            keep: Seq[String] = Nil): DataFrame = {
    val rng = mins.zip(maxs).map { case (mn, mx) => mx - mn }
    vecs.select(col("vec_id") +: keep.map(col) :+ expr(
      s"""transform(qv, (x, i) ->
            CASE WHEN element_at(${sqlArr(rng)}, i + 1) = 0L THEN 0L
                 ELSE least(${Levels - 1}L, greatest(0L,
                      ((x - element_at(${sqlArr(mins)}, i + 1)) * ${Levels - 1}L)
                      div element_at(${sqlArr(rng)}, i + 1))) END)""").as("codes"): _*)
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

  /** q82 — IVF+SQ8: the near-exact-recall memory point ROUTED (the
    * FAISS `IVFx,SQ8` production shape), completing the serving axis
    * q79 opened for PQ: q81's serve must scan every SQ8 code per
    * probe; this routes the corpus into the trained IVF cells,
    * SQ8-encodes each vector's RESIDUAL from its home cell's integer
    * mean grid (per-dim bounds learned over the residual relation —
    * residuals concentrate near 0, so the same 256 levels land on a
    * tighter grid than raw SQ8's), and serves by probing only each
    * query's `nprobe` nearest cells through the SAME cell equi-join +
    * static probed-cell pruning as [[Pq.ivfPqServe]].
    *
    * Exact-replayable construction (the q82 oracle replays it all):
    * the [[Embeddings.trainQuantizer]] pinned coarse trajectory, the
    * [[Embeddings.meanGrid]] exact-integer residuals (shared with q79
    * via [[Pq.residualsOf]]), the [[encode]]/[[decodeCol]] pinned
    * byte grid over residual bounds, and est = Σ(qres_d − r_d)² — an
    * exact-integer BIGINT where qres is the query's residual against
    * the PROBED cell.
    *
    * Plan shape at 100 TB: identical to q79's — the probe side
    * (nprobe rows per query, each carrying its per-cell residual)
    * broadcasts into a cell equi-join against the codes scan, the
    * probed-cell set rides the scan as a static filter (partitioned
    * by cell ⇒ listing-time pruning through the serve path,
    * StorageSpec's IVFADC proof shape) — per-probe work is
    * nprobe/nCells of the corpus at 64 B/vector. */
  def ivfSq8TopK(spark: SparkSession, dir: String,
                 k: Int = 5, queryMod: Int = 50, nprobe: Int = 2,
                 nCells: Int = Embeddings.OracleCells,
                 iters: Int = Embeddings.OracleIters): DataFrame = {
    val vecs = Caches.persist(Embeddings.quantized(spark, dir))
    val cents = Embeddings.trainQuantizer(spark, dir, nCells, iters).sortBy(_.j)
    val residuals = Caches.persist(Pq.residualsOf(spark, dir, cents))
    val (mins, maxs) = gridBounds(residuals)
    val codes = encode(residuals, mins, maxs, keep = Seq("cell"))
    val probes = vecs
      .filter(col("vec_id") % queryMod === 0 && col("vec_id") < Pq.ProbeCap)
      .select(col("vec_id").as("q_id"), col("qv"))
    ivfSq8Serve(codes, cents, mins, maxs, probes, k, nprobe, excludeSelf = true)
  }

  /** The q82 BUILD stage alone: coarse quantizer + residual bounds —
    * the artifact pair a deployment persists ([[Embeddings
    * .saveQuantizer]] + [[saveBounds]]) so serving jobs never re-pay
    * the training scans ([[graft.stream.StreamingIvfSqServe]]). */
  def trainIvfSq8(spark: SparkSession, dir: String,
                  nCells: Int = Embeddings.OracleCells,
                  iters: Int = Embeddings.OracleIters)
      : (Seq[Embeddings.Centroid], IndexedSeq[Long], IndexedSeq[Long]) = {
    val cents = Embeddings.trainQuantizer(spark, dir, nCells, iters).sortBy(_.j)
    val (mins, maxs) = gridBounds(Caches.persist(Pq.residualsOf(spark, dir, cents)))
    (cents, mins, maxs)
  }

  /** The routed SQ8 index relation (vec_id, cell, codes): home cell +
    * residual byte codes — persist partitioned by cell at scale so
    * probed cells prune at listing time. The residual relation is NOT
    * cached here: this builder scans it exactly once (the caller
    * caches the CODES, not their input — review r11); the train path
    * ([[trainIvfSq8]]/[[ivfSq8TopK]]) owns its own residual cache
    * where two passes genuinely read it. */
  def ivfSq8Codes(spark: SparkSession, dir: String,
                  cents: Seq[Embeddings.Centroid],
                  mins: Seq[Long], maxs: Seq[Long]): DataFrame =
    encode(Pq.residualsOf(spark, dir, cents), mins, maxs, keep = Seq("cell"))

  /** The q82 SERVE stage: probe each query's `nprobe` nearest cells
    * (fused [[graft.functions.ProbeCells]] ranking via
    * [[Pq.probeCellsRelation]] — ONE definition with q79, so the
    * probed set cannot drift between the compressions), build the
    * query's per-probed-cell RESIDUAL, and resolve est through the
    * cell equi-join against `codes` with the probed-cell set riding
    * the codes scan as a static filter. `queries` carries (q_id, qv)
    * on the corpus integer grid ([[Pq.quantizeQueries]] for external
    * embeddings). ONE definition shared by batch q82 and the
    * streaming seam, so their agreement is an identity. */
  def ivfSq8Serve(codes: DataFrame, cents: Seq[Embeddings.Centroid],
                  mins: Seq[Long], maxs: Seq[Long],
                  queries: DataFrame, k: Int = 5, nprobe: Int = 2,
                  excludeSelf: Boolean = false): DataFrame = {
    val spark = queries.sparkSession
    graft.functions.VecDot.register(spark)
    val sorted = cents.sortBy(_.j)
    // ONE evaluation of the probe ranking (the q79 rationale): the
    // probe relation is broadcast-sized by contract, so collect it
    // once and derive both the probed-cell static filter and the
    // query side from the local rows.
    val probesPlan = Pq.probeCellsRelation(queries, sorted, nprobe)
    val probeRows = probesPlan.collect()
    val probes = spark.createDataFrame(
      java.util.Arrays.asList(probeRows: _*), probesPlan.schema)
    val probedCells = probeRows.map(_.getAs[Long]("cell")).distinct.toSeq
    val qres = probes.join(broadcast(Pq.gridDfOf(spark, sorted)), "cell")
      .select(col("q_id"), col("cell"),
        zip_with(col("qv"), col("grid"), (a, b) => a - b).as("q_v"))
      .withColumn("q_n", expr("vec_dot(q_v, q_v)"))
    val corpus = codes.filter(col("cell").isin(probedCells: _*))
      .withColumn("rv", decodeCol(mins, maxs))
      .select(col("vec_id").as("neighbor_id"), col("cell"), col("rv"),
        expr("vec_dot(rv, rv)").as("r_n"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("est"), col("neighbor_id"))
    (if (excludeSelf) corpus.join(broadcast(qres), Seq("cell"))
        .filter(col("neighbor_id") =!= col("q_id"))
     else corpus.join(broadcast(qres), Seq("cell")))
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
