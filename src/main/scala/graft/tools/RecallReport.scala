package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Recall-consequence report for the two-level IVF routing (VERDICT r8
  * #6): at a given scale factor, run the semantic-dedup drop-list with
  * EXACT cell assignment (q70, `Embeddings.semanticDedupScaled`) and
  * with the two-level-routed assignment (q76,
  * `Embeddings.semanticDedupTwoLevel`) and report how much the
  * drop-lists agree — the number a production owner needs before
  * flipping the routing switch on a real corpus. Routing agreement on
  * a fixture (EmbeddingsSpec's 0.80-0.84) bounds where POINTS land;
  * this measures what that does to the DECISION surface (which docs
  * get dropped), which is what the pipeline actually acts on.
  *
  * `runMain graft.tools.RecallReport <sfDir>` prints one JSON line:
  * drop counts on both paths, intersection, Jaccard, and full
  * keep-decision agreement over the corpus.
  *
  * NOT part of the query surface — a measurement tool like ScaleUp;
  * results land in bench/SCALING_r{N}.md. */
object RecallReport {

  def main(args: Array[String]): Unit = {
    require(args.length == 1 || args.length == 2,
      "usage: RecallReport <sfDir> [targetCell]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try println(report(spark, args(0),
      if (args.length == 2) args(1).toInt
      else graft.ops.Embeddings.OracleTargetCell))
    finally spark.stop()
  }

  /** One JSON line of overlap stats (pure function of the two
    * drop-lists; RecallReportSpec certifies the arithmetic on a
    * fixture corpus where the expected sets are known). */
  def report(spark: SparkSession, dir: String,
             targetCell: Int = graft.ops.Embeddings.OracleTargetCell): String = {
    val exact = graft.ops.Embeddings.semanticDedupScaled(spark, dir, targetCell = targetCell)
      .select(col("vec_id"), col("keep").as("keep_exact"))
    // both paths recompute from the raw table; materialize the exact
    // side before releasing its lineage caches so the two runs don't
    // share (and double-count) cached subtrees
    val exactRows = exact.collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    graft.ops.Caches.releaseAll(spark)
    val two = graft.ops.Embeddings.semanticDedupTwoLevel(spark, dir, targetCell = targetCell)
      .select(col("vec_id"), col("keep").as("keep_two"))
    val twoRows = two.collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    graft.ops.Caches.releaseAll(spark)
    require(exactRows.keySet == twoRows.keySet,
      "exact and two-level drop-lists cover different vec_id sets")
    val n = exactRows.size
    val dropE = exactRows.collect { case (id, false) => id }.toSet
    val dropT = twoRows.collect { case (id, false) => id }.toSet
    val inter = (dropE & dropT).size
    val union = (dropE | dropT).size
    val agree = exactRows.count { case (id, k) => twoRows(id) == k }
    val jaccard = if (union == 0) 1.0 else inter.toDouble / union
    import graft.BenchFormat.num
    s"""{"n":$n,"drop_exact":${dropE.size},"drop_twolevel":${dropT.size},""" +
      s""""drop_intersection":$inter,"drop_union":$union,""" +
      s""""drop_jaccard":${num(jaccard, 4)},""" +
      s""""keep_agreement":${num(agree.toDouble / n, 4)}}"""
  }
}
