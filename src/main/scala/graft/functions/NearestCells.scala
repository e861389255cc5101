package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused nearest-centroid assignment over a REFERENCE-DATA centroid
  * table — the plan-size fix for the IVF family past O(10²) cells.
  *
  * [[graft.ops.Embeddings]]' original `nearestCell` inlines every
  * centroid as a separate expression subtree (array of nCells
  * scaled-distance expressions + argmin), which is the right shape up
  * to tens of cells but grows the PLAN linearly with the quantizer:
  * at the 625 cells a 20k-vector corpus trains under the pinned
  * `targetCell`, analysis/codegen of the ~650-subtree expression
  * dominated q70/q76 wall-clock (≈25-36 s at sf1, bench r9) and the
  * generated method blows past JIT limits, so rows were evaluated by
  * INTERPRETED expression trees — per row, per centroid.
  *
  * This expression instead carries the centroid matrix as one
  * broadcast-serialized reference object ([[CellTable]], flat
  * primitive arrays) and does the whole argmin — optionally two-level:
  * super-centroid routing then only the chosen group's members — in
  * one compiled loop: O(1) plan size at any cell count, whole-stage
  * codegen keeps working, per-row cost is (nSuper + group) fused
  * dot products. The arithmetic is BIT-IDENTICAL to the expression
  * form it replaces (exact-integer numerator, one IEEE division per
  * member distance, Long super distances, first-minimum ties) —
  * NearestCellsProperties pins equality against the old formulation
  * and the q31/q68/q70/q76 oracles replay the same trajectories
  * unchanged. */
case class NearestCells(qv: Expression, nrm: Expression, table: CellTable)
  extends BinaryExpression {

  override def left: Expression = qv
  override def right: Expression = nrm

  override def checkInputDataTypes(): TypeCheckResult = (qv.dataType, nrm.dataType) match {
    case (ArrayType(LongType, _), LongType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"nearest_cells needs (array<bigint>, bigint), got ${l.catalogString} and ${r.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "nearest_cells"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    table.assign(a.asInstanceOf[ArrayData], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cellTable", table, classOf[CellTable].getName)
    defineCodeGen(ctx, ev, (a, b) => s"$ref.assign($a, $b)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): NearestCells =
    copy(qv = newLeft, nrm = newRight)
}

/** [[NearestCells]]' sibling for the SERVING path: the `nprobe`
  * nearest cell ids, ordered (dist ASC, id ASC) — the fused form of
  * the probe-cells expression (array_sort over nCells struct
  * subtrees), with the same O(1)-plan-size rationale. Exact mode
  * only: probing ranks ALL cells, which is what the q31 serve oracle
  * pins. */
case class ProbeCells(qv: Expression, nrm: Expression, table: CellTable, nprobe: Int)
  extends BinaryExpression {

  require(nprobe >= 1, "nprobe must be positive")
  require(table.groupStart.isEmpty, "ProbeCells ranks all cells (exact mode only)")

  override def left: Expression = qv
  override def right: Expression = nrm

  override def checkInputDataTypes(): TypeCheckResult = (qv.dataType, nrm.dataType) match {
    case (ArrayType(LongType, _), LongType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"probe_cells needs (array<bigint>, bigint), got ${l.catalogString} and ${r.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "probe_cells"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    table.probe(a.asInstanceOf[ArrayData], b.asInstanceOf[Long], nprobe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cellTable", table, classOf[CellTable].getName)
    defineCodeGen(ctx, ev, (a, b) => s"$ref.probe($a, $b, $nprobe)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): ProbeCells =
    copy(qv = newLeft, nrm = newRight)
}

/** The flattened centroid matrix a [[NearestCells]] expression carries.
  *
  * Cells live in EVALUATION ORDER (the tie-break order: sorted by id
  * for the exact form; group-concatenated, in-group id-sorted for the
  * two-level form). `groupStart` is empty for the exact form; for the
  * two-level form it holds G+1 offsets into the cell arrays and
  * `superS`/`superSumS2` hold the G integer super-centroid grids.
  *
  * Arithmetic contract (must never drift from the expression form the
  * oracles replay):
  *  - member distance: (n²·‖q‖² − 2n·(q·s) + Σs²) exact in Long, ONE
  *    IEEE division by n·n (as double·double), first minimum wins;
  *  - super distance: ‖q‖² − 2(q·s) + Σs² compared as exact Longs
  *    (the n = 1 scaled distance without its ÷1), first minimum wins.
  * Member counts must respect [[graft.ops.Embeddings.MaxCellMembers]]
  * (checked at construction sites) or the Long numerator wraps. */
final class CellTable(val dim: Int,
                      val cellJ: Array[Long], val cellN: Array[Long],
                      val cellS: Array[Long], val cellSumS2: Array[Long],
                      val superS: Array[Long], val superSumS2: Array[Long],
                      val groupStart: Array[Int]) extends Serializable {

  require(cellJ.length == cellN.length && cellJ.length == cellSumS2.length &&
    cellS.length == cellJ.length * dim, "ragged cell arrays")
  require(superS.length == superSumS2.length * dim, "ragged super arrays")
  require(groupStart.isEmpty ||
    (groupStart.length == superSumS2.length + 1 &&
      groupStart.head == 0 && groupStart.last == cellJ.length),
    "groupStart must cover the cell range with one offset per super group")
  require(cellJ.nonEmpty, "empty centroid table")

  /** Content-derived registration key: md5 over every array, so two
    * tables built from the same centroid matrix (e.g. one per
    * micro-batch in a serving loop) register under ONE session
    * function name instead of leaking an entry per call — the
    * registry grows with DISTINCT quantizers, not with invocations. */
  lazy val contentKey: String = {
    val h = java.security.MessageDigest.getInstance("MD5")
    val bb = java.nio.ByteBuffer.allocate(8)
    def addL(a: Array[Long]): Unit = a.foreach { v =>
      bb.clear(); bb.putLong(v); h.update(bb.array())
    }
    bb.putLong(dim.toLong); h.update(bb.array()); bb.clear()
    addL(cellJ); addL(cellN); addL(cellS); addL(cellSumS2)
    addL(superS); addL(superSumS2); addL(groupStart.map(_.toLong))
    h.digest().take(8).map("%02x".format(_)).mkString
  }

  private def dot(qv: ArrayData, flat: Array[Long], base: Int): Long = {
    var s = 0L
    var d = 0
    while (d < dim) { s += qv.getLong(d) * flat(base + d); d += 1 }
    s
  }

  /** Nearest member cell id in [from, until) — exact scaled distance,
    * first minimum (cells arrive in tie-break order). */
  private def nearestMember(qv: ArrayData, nrm: Long, from: Int, until: Int): Long = {
    var best = Double.PositiveInfinity
    var bestI = from
    var i = from
    while (i < until) {
      val n = cellN(i)
      val num = n * n * nrm - 2L * n * dot(qv, cellS, i * dim) + cellSumS2(i)
      val d = num.toDouble / (n.toDouble * n.toDouble)
      if (d < best) { best = d; bestI = i }
      i += 1
    }
    cellJ(bestI)
  }

  /** The `nprobe` nearest cell ids ordered (dist ASC, id ASC) — the
    * semantics of lexicographic array_sort over (dist, j) structs
    * followed by a head slice, as one insertion pass (nprobe is
    * small by contract). Cells arrive id-sorted, so among equal
    * distances the earlier index IS the smaller id. */
  def probe(qv: ArrayData, nrm: Long, nprobe: Int): ArrayData = {
    val kk = math.min(nprobe, cellJ.length)
    val topD = new Array[Double](kk)
    val topI = new Array[Int](kk)
    var filled = 0
    var i = 0
    while (i < cellJ.length) {
      val n = cellN(i)
      val num = n * n * nrm - 2L * n * dot(qv, cellS, i * dim) + cellSumS2(i)
      val d = num.toDouble / (n.toDouble * n.toDouble)
      // shift only STRICTLY worse entries, so a later candidate with
      // an equal distance lands after (larger index = larger id), and
      // never evicts an equal-distance incumbent — array_sort's
      // (dist, id) lexicographic order exactly
      if (filled < kk) {
        var p = filled
        while (p > 0 && topD(p - 1) > d) {
          topD(p) = topD(p - 1); topI(p) = topI(p - 1); p -= 1
        }
        topD(p) = d; topI(p) = i
        filled += 1
      } else if (d < topD(kk - 1)) {
        var p = kk - 1
        while (p > 0 && topD(p - 1) > d) {
          topD(p) = topD(p - 1); topI(p) = topI(p - 1); p -= 1
        }
        topD(p) = d; topI(p) = i
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      topI.take(filled).map(cellJ(_)))
  }

  def assign(qv: ArrayData, nrm: Long): Long =
    if (groupStart.isEmpty) nearestMember(qv, nrm, 0, cellJ.length)
    else {
      var best = Long.MaxValue
      var bestG = 0
      var g = 0
      while (g < superSumS2.length) {
        val d = nrm - 2L * dot(qv, superS, g * dim) + superSumS2(g)
        if (d < best) { best = d; bestG = g }
        g += 1
      }
      nearestMember(qv, nrm, groupStart(bestG), groupStart(bestG + 1))
    }
}
