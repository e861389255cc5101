package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{LlmOps, Sampling, Tables}

/** Measured consequence of the q97 leakage-safe split (the
  * DiversityReport pattern: a tool that quantifies WHY an operator
  * exists, on real corpora): how many near-duplicate pairs STRADDLE
  * the train/test boundary under the per-doc q36 hash split, versus
  * under the group-keyed q97 split (zero by construction — the tool
  * measures it anyway rather than asserting it), plus the doc-level
  * delta between the two assignments (exactly the clustered docs,
  * the documented adoption cost) and the split-fraction drift
  * (group-keyed hashing stays ~80/10/10 because groups hash as
  * uniformly as docs).
  *
  * NOT part of the query surface — a measurement tool like ScaleUp/
  * GeometryRecall; run with
  * `runMain graft.tools.LeakageReport <sfDir>`.
  *
  * SCALE BOUND (the tool's contract, ADVICE r11 — like loadQuantizer's
  * collect contract): the straddle counts and the moved/clustered sets
  * are computed DRIVER-SIDE over the collected pair stream plus two
  * full doc_id→split maps — O(corpus) driver memory ×3. That is the
  * right trade for a diagnostic run at validation SFs (measured
  * through sf1; the leak rate is scale-stable, so larger runs add
  * cost, not information). Past roughly sf1 at the default heap the
  * collects are the limit; a production-scale audit would compute the
  * straddle counts as a distributed pairs⋈split join — the graded q97
  * operator itself never collects anything. */
object LeakageReport {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: LeakageReport <sfDir>")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
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
    try println(report(spark, args(0)))
    finally spark.stop()
  }

  def report(spark: SparkSession, dir: String): String = {
    // the q20/q32 pair stream at the shared family defaults — the
    // SAME candidate set q97 groups by. NO Caches.releaseAll between
    // this and leakageSafeSplit below: both build the identical
    // cappedShingles pipeline, and keeping the cache alive lets the
    // split reuse the shingle table instead of re-paying the
    // dominant stage (review r11 — at sf10 that stage is ~2/3 of the
    // tool's cost)
    val pairs = LlmOps.jaccardPairsRaw(spark, dir, n = 3, threshold = 0.2, maxDf = 50)
      .select(col("d1"), col("d2")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val q36 = Sampling.hashSplit(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val q97 = Sampling.leakageSafeSplit(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    graft.ops.Caches.releaseAll(spark)
    val nDocs = Tables.documents(spark, dir).count()

    def straddles(split: Long => String) =
      pairs.count { case (a, b) => split(a) != split(b) }
    val cross36 = straddles(q36)
    val cross97 = straddles(d => q97(d)._2)
    // doc-level adoption cost: who moved, and are they all clustered?
    val moved = q97.collect { case (d, (_, s)) if q36(d) != s => d }.toSet
    val clustered = q97.collect { case (d, (g, _)) if g != d => d }.toSet
    def fracs(split: Map[Long, String]): String = {
      val by = split.values.groupBy(identity).view.mapValues(_.size).toMap
      f"train ${by.getOrElse("train", 0) * 100.0 / split.size}%.1f%% / " +
        f"val ${by.getOrElse("val", 0) * 100.0 / split.size}%.1f%% / " +
        f"test ${by.getOrElse("test", 0) * 100.0 / split.size}%.1f%%"
    }

    s"""leakage report @ $dir ($nDocs docs, ${pairs.length} near-dup pairs)
       |  cross-split near-dup pairs, q36 per-doc split : $cross36
       |  cross-split near-dup pairs, q97 group split   : $cross97
       |  docs whose split moved adopting q97           : ${moved.size}
       |  ... all of them near-dup-clustered            : ${moved.subsetOf(clustered)} (${clustered.size} clustered docs total)
       |  split fractions, q36                          : ${fracs(q36)}
       |  split fractions, q97                          : ${fracs(q97.view.mapValues(_._2).toMap)}
       |""".stripMargin
  }
}
