package graft.tools

import graft.ops.{Caches, Embeddings, Mmr, Sq}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Diversity-consequence measurement for the MMR re-rank (q92) —
  * the SCALING companion of GeometryRecall: on a corpus with real
  * cluster structure, a plain distance top-k concentrates in the
  * anchor's own cluster; MMR's marginal objective should trade a
  * little relevance for COVERAGE. This tool measures exactly that,
  * per geometry:
  *
  *   - cluster coverage: mean over probes of |distinct labels| among
  *     the top-5 (labels = ground-truth clusters on
  *     [[ClusteredEmbeddings]] corpora);
  *   - metric spread: mean over probes of the MIN pairwise exact
  *     integer distance inside the returned set (the quantity MMR's
  *     penalty term maximizes greedily).
  *
  * `runMain graft.tools.DiversityReport <dir-with-embeddings.parquet>`
  * NOT part of the query surface — a measurement tool like
  * GeometryRecall; both serves run at the SAME probe set and
  * candidate budget, so the comparison isolates the re-rank. */
object DiversityReport {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: DiversityReport <dir-with-embeddings.parquet>")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try println(report(spark, args(0)))
    finally spark.stop()
  }

  def report(spark: SparkSession, dir: String): String = {
    val labels = graft.ops.Tables.embeddings(spark, dir)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getAs[Number](1).longValue).toMap
    val vecs = Embeddings.quantized(spark, dir)
      .select("vec_id", "qv").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toIndexedSeq).toMap
    def sq(a: IndexedSeq[Long], b: IndexedSeq[Long]): Long =
      a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    def stats(sets: Map[Long, Seq[Long]]): (Double, Double) = {
      val cov = sets.values.map(s => s.map(labels).distinct.size.toDouble).sum / sets.size
      val spread = sets.values.collect { case s if s.size >= 2 =>
        (for (a <- s; b <- s if a < b) yield sq(vecs(a), vecs(b))).min.toDouble
      }
      (cov, if (spread.isEmpty) 0.0 else spread.sum / spread.size)
    }
    val plain = Sq.ivfSq8TopK(spark, dir, k = 5).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id")))
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSeq }
    Caches.releaseAll(spark)
    val mmr = Mmr.mmrRerankTopK(spark, dir, k = 5).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id")))
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSeq }
    Caches.releaseAll(spark)
    val (pc, ps) = stats(plain)
    val (mc, ms) = stats(mmr)
    f"""{"dir":"$dir","probes":${plain.size},""" +
      f""""plain_coverage":$pc%.3f,"mmr_coverage":$mc%.3f,""" +
      f""""plain_min_spread":$ps%.3g,"mmr_min_spread":$ms%.3g}"""
  }
}
