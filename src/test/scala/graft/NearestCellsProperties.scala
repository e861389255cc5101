package graft

import graft.functions.{CellTable, NearestCells}
import org.apache.spark.sql.functions.{col, expr}
import org.scalatest.funsuite.AnyFunSuite

/** The fused [[NearestCells]] assignment must reproduce the literal
  * expression formulation it replaced bit-for-bit: exact-integer
  * numerator, one IEEE division per member distance (num as double ÷
  * n·n as double·double), exact-Long super distances, first-minimum
  * ties in evaluation order. Pinned here against an independent
  * plain-Scala model over seeded-random corpora INCLUDING engineered
  * exact ties; the q31/q68/q70/q76 oracles gate the same arithmetic
  * end-to-end at sf0.01. */
class NearestCellsProperties extends SparkSpec {

  private val Dim = 64
  private val rnd = new scala.util.Random(20260814)

  private def randVec(bound: Int): IndexedSeq[Long] =
    IndexedSeq.fill(Dim)((rnd.nextInt(2 * bound + 1) - bound).toLong)

  private case class C(j: Long, s: IndexedSeq[Long], n: Long)

  private def modelDist(qv: IndexedSeq[Long], nrm: Long, c: C): Double = {
    var dot = 0L
    var d = 0
    while (d < Dim) { dot += qv(d) * c.s(d); d += 1 }
    val num = c.n * c.n * nrm - 2L * c.n * dot + c.s.map(v => v * v).sum
    num.toDouble / (c.n.toDouble * c.n.toDouble)
  }

  private def modelAssign(qv: IndexedSeq[Long], cents: Seq[C],
                          supers: Seq[C], groups: Seq[Seq[C]]): Long = {
    val nrm = qv.map(v => v * v).sum
    def first(cs: Seq[C]): Long = {
      var best = Double.PositiveInfinity; var bj = cs.head.j
      cs.foreach { c =>
        val d = modelDist(qv, nrm, c)
        if (d < best) { best = d; bj = c.j }
      }
      bj
    }
    if (supers.isEmpty) first(cents)
    else {
      var best = Long.MaxValue; var bg = 0
      supers.zipWithIndex.foreach { case (g, i) =>
        var dot = 0L
        var d = 0
        while (d < Dim) { dot += qv(d) * g.s(d); d += 1 }
        val dist = nrm - 2L * dot + g.s.map(v => v * v).sum
        if (dist < best) { best = dist; bg = i }
      }
      first(groups(bg))
    }
  }

  private def tableOf(cents: Seq[C], supers: Seq[C], groups: Seq[Seq[C]]): CellTable = {
    val ordered = if (groups.isEmpty) cents else groups.flatten
    new CellTable(Dim,
      ordered.map(_.j).toArray, ordered.map(_.n).toArray,
      ordered.flatMap(_.s).toArray,
      ordered.map(c => c.s.map(v => v * v).sum).toArray,
      supers.flatMap(_.s).toArray,
      supers.map(c => c.s.map(v => v * v).sum).toArray,
      if (groups.isEmpty) Array.emptyIntArray
      else groups.scanLeft(0)(_ + _.size).toArray)
  }

  private def run(vecs: Seq[IndexedSeq[Long]], table: CellTable): Seq[Long] = {
    val s = spark
    import s.implicits._
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nc_test", { case Seq(a, b) => NearestCells(a, b, table) }, "built-in")
    vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "qv")
      .withColumn("nrm", expr("vec_dot(qv, qv)"))
      .select(col("id"), expr("nc_test(qv, nrm)").as("cell"))
      .collect().sortBy(_.getLong(0)).map(_.getLong(1)).toSeq
  }

  test("exact form matches the model on random corpora (varying n, 200 rounds of rows)") {
    graft.functions.VecDot.register(spark)
    val cents = (0 until 40).map(i =>
      C(i * 7L, randVec(1000), 1L + rnd.nextInt(100))).sortBy(_.j)
    val vecs = Seq.fill(200)(randVec(1000))
    val got = run(vecs, tableOf(cents, Nil, Nil))
    val want = vecs.map(v => modelAssign(v, cents, Nil, Nil))
    assert(got == want)
  }

  test("exact ties break to the first (smallest-id) centroid") {
    graft.functions.VecDot.register(spark)
    // duplicated centroid vectors => exactly equal distances
    val shared = randVec(50)
    val cents = Seq(C(3L, shared, 5L), C(9L, shared, 5L), C(11L, randVec(50), 2L))
    val vecs = Seq.fill(50)(randVec(50))
    val got = run(vecs, tableOf(cents, Nil, Nil))
    val want = vecs.map(v => modelAssign(v, cents, Nil, Nil))
    assert(got == want)
    assert(!got.contains(9L), "a tie resolved away from the first minimum")
  }

  test("ProbeCells returns the nprobe (dist, id)-lexicographic head, incl. ties") {
    graft.functions.VecDot.register(spark)
    val s = spark
    import s.implicits._
    val shared = randVec(200)
    // duplicate centroid vectors with different n so several DISTINCT
    // cells produce exactly equal distances
    val cents = (Seq(C(5L, shared, 3L), C(12L, shared, 3L), C(20L, shared, 3L)) ++
      (0 until 20).map(i => C(30L + i, randVec(200), 1L + rnd.nextInt(40)))).sortBy(_.j)
    val vecs = Seq.fill(120)(randVec(200))
    for (nprobe <- Seq(1, 2, 4, 30)) {
      val table = tableOf(cents, Nil, Nil)
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "pc_test", { case Seq(a, b) => graft.functions.ProbeCells(a, b, table, nprobe) },
        "built-in")
      val got = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "qv")
        .withColumn("nrm", expr("vec_dot(qv, qv)"))
        .select(col("id"), expr("pc_test(qv, nrm)").as("cells"))
        .collect().sortBy(_.getLong(0))
        .map(_.getSeq[Long](1).toList)
      val want = vecs.map { v =>
        val nrm = v.map(x => x * x).sum
        cents.map(c => (modelDist(v, nrm, c), c.j)).sorted.take(nprobe).map(_._2).toList
      }
      assert(got.toSeq == want, s"probe head diverged at nprobe=$nprobe")
    }
  }

  test("two-level form matches the model (supers route, members resolve, ties first)") {
    graft.functions.VecDot.register(spark)
    val groups = (0 until 5).map { g =>
      val base = randVec(800)
      (0 until 8).map(i => C(g * 100L + i, base.map(_ + rnd.nextInt(21) - 10), 1L + rnd.nextInt(50)))
    }
    // super centroid = any representative grid; the CONTRACT under test
    // is routing arithmetic, not how supers were derived
    val supers = groups.zipWithIndex.map { case (ms, g) => C(g.toLong, ms.head.s, 1L) }
    val cents = groups.flatten
    val vecs = Seq.fill(200)(randVec(800))
    val got = run(vecs, tableOf(cents, supers, groups))
    val want = vecs.map(v => modelAssign(v, cents, supers, groups))
    assert(got == want)
  }
}
