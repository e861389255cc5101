package graft.tools

import graft.ops.LlmOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The q94 recall dial, measured (VERDICT r12 #6): the fuzzy-dedup
  * docs promise "recall 0.67 at τ=18, bought back by lowering τ or
  * adding passes" — this tool turns that guidance into numbers, the
  * DiversityReport pattern. Against the UNBLOCKED truth (all-pairs
  * threshold-bounded Levenshtein on the normalized keys, computed
  * distributedly — n²/2 bounded-DP comparisons, fine at report SFs),
  * it measures 2-pass (prefix+suffix, the graded default) vs 3-pass
  * (+ middle 4-gram, `midBlock = true`) blocking: candidates
  * generated (the cost), pairs found and recall (the value), per
  * τ ∈ {6, 12, 18}.
  *
  * Candidate count = the pair count at τ = [[LlmOps.FuzzyKeyLen]]:
  * τ bounds only the scoring stage, and key distances never exceed
  * the key length, so the unbounded run returns every scored
  * candidate.
  *
  * Run: `runMain graft.tools.FuzzyDial [sfDir]`; table lands in
  * bench/SCALING_r13.md. */
object FuzzyDial {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
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
    try println(report(spark, dir))
    finally spark.stop()
  }

  def report(spark: SparkSession, dir: String): String = {
    val taus = Seq(6, 12, 18)
    val docs = graft.ops.Tables.documents(spark, dir)
    val keys = graft.ops.Caches.persist(docs.select(col("doc_id"),
      substring(regexp_replace(lower(col("text")), "\\s+", " "), 1,
        LlmOps.FuzzyKeyLen).as("key")))
    val nDocs = keys.count()
    // unblocked truth per tau: ONE all-pairs pass at the largest tau
    // keeps the exact distances, then each threshold is a filter
    val truth = keys.select(col("doc_id").as("d1"), col("key").as("k1"))
      .join(keys.select(col("doc_id").as("d2"), col("key").as("k2")),
        col("d1") < col("d2"))
      .select(levenshtein(col("k1"), col("k2"), taus.max).cast("long").as("dist"))
      .filter(col("dist") >= 0)
      .groupBy(col("dist")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def truthAt(tau: Int): Long = truth.filter(_._1 <= tau).values.sum
    graft.ops.Caches.releaseAll(spark)

    def timedCount(tau: Int, mid: Boolean): (Long, Double) = {
      val t0 = System.nanoTime()
      val n = LlmOps.fuzzyDupPairsOf(docs, tau = tau, midBlock = mid).count()
      val sec = (System.nanoTime() - t0) / 1e9
      graft.ops.Caches.releaseAll(spark)
      (n, sec)
    }

    val rows = for (mid <- Seq(false, true)) yield {
      val passes = if (mid) "3-pass (+mid)" else "2-pass (default)"
      val (cand, candSec) = timedCount(LlmOps.FuzzyKeyLen, mid)
      val perTau = taus.map { tau =>
        val (n, sec) = timedCount(tau, mid)
        val t = truthAt(tau)
        f"τ=$tau: $n/$t (recall ${if (t == 0) 1.0 else n.toDouble / t}%.2f, $sec%.1fs)"
      }
      f"  $passes%-17s candidates $cand%6d ($candSec%.1fs)  ${perTau.mkString("  ")}"
    }
    (s"fuzzy-dedup dial @ $dir ($nDocs docs; truth = unblocked bounded-DP all-pairs)\n"
      + rows.mkString("\n") + "\n")
  }
}
