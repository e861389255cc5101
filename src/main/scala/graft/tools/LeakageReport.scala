package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{LlmOps, Sampling}

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
  * Fully DISTRIBUTED since round 12 (ADVICE r11 flagged the previous
  * O(corpus)-driver-memory collects as an undocumented scale bound;
  * this removes the bound instead): the straddle counts are
  * pairs⋈split joins, the moved/clustered/fraction numbers are
  * aggregates, and the only rows reaching the driver are the report's
  * own scalars — so the tool audits at any SF the q32 pipeline itself
  * handles (the sf10 row in SCALING_r12.md ran this form at the
  * default heap). */
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
    // tool's cost). The pair stream and both split tables are
    // persisted here because each feeds two aggregations below.
    val pairs = graft.ops.Caches.persist(
      LlmOps.jaccardPairsRaw(spark, dir, n = 3, threshold = 0.2, maxDf = 50)
        .select(col("d1"), col("d2")))
    val q36 = graft.ops.Caches.persist(
      Sampling.hashSplit(spark, dir).select(col("doc_id"), col("split").as("s36")))
    val q97 = graft.ops.Caches.persist(
      Sampling.leakageSafeSplit(spark, dir)
        .select(col("doc_id"), col("group_id"), col("split").as("s97")))

    val nPairs = pairs.count()
    val nDocs = q36.count()
    // split doc_id uniqueness, asserted BEFORE the coverage check uses
    // it (ADVICE r13): `matched == nPairs` below can be satisfied by
    // CANCELATION — a duplicated doc_id (2 join matches for one pair)
    // masking a missing endpoint (0 matches for another). Unique keys
    // make the joined row count a faithful pair count.
    Seq(("q36", q36), ("q97", q97)).foreach { case (label, split) =>
      val d = split.agg(count(lit(1)).as("n"),
        countDistinct(col("doc_id")).as("nd")).collect()(0)
      require(d.getLong(0) == d.getLong(1),
        s"$label split has ${d.getLong(0)} rows but ${d.getLong(1)} distinct doc_ids — " +
          "duplicate keys would let the pair-coverage assertion pass by cancelation")
    }
    // straddle counts: one pairs⋈split join per endpoint per split —
    // the splits are corpus-sized so no broadcast hint (AQE decides),
    // the result is ONE row. Coverage is ASSERTED, not assumed
    // (ADVICE r12): the inner joins would silently DROP a pair whose
    // endpoint is missing from a split table, and a split-coverage
    // regression would then read as FEWER cross-split pairs — the
    // leakage metric improving is exactly the failure that must not
    // pass silently. One aggregate counts matched and crossing rows
    // together, and matched ≠ nPairs aborts the report loudly.
    def straddles(split: org.apache.spark.sql.DataFrame, c: String): Long = {
      val r = pairs
        .join(split.select(col("doc_id").as("d1"), col(c).as("sa")), Seq("d1"))
        .join(split.select(col("doc_id").as("d2"), col(c).as("sb")), Seq("d2"))
        .agg(count(lit(1)).as("matched"),
          sum(when(col("sa") =!= col("sb"), 1L).otherwise(0L)).as("cross"))
        .collect()(0)
      require(r.getLong(0) == nPairs,
        s"$c split covers ${r.getLong(0)} of $nPairs near-dup pairs — " +
          "an endpoint is missing from the split table; the straddle " +
          "count would be a silent undercount")
      if (nPairs == 0) 0L else r.getLong(1)
    }
    val cross36 = straddles(q36, "s36")
    val cross97 = straddles(q97.select(col("doc_id"), col("s97")), "s97")
    // doc-level adoption cost as ONE aggregate over the joined splits:
    // who moved, are they all clustered, and the fraction drift
    val joined = q36.join(q97, Seq("doc_id"))
    val row = joined.agg(
      sum(when(col("s36") =!= col("s97"), 1L).otherwise(0L)).as("moved"),
      sum(when(col("s36") =!= col("s97") && col("group_id") === col("doc_id"), 1L)
        .otherwise(0L)).as("moved_unclustered"),
      sum(when(col("group_id") =!= col("doc_id"), 1L).otherwise(0L)).as("clustered"))
      .collect()(0)
    val (moved, movedUnclustered, clustered) =
      (row.getLong(0), row.getLong(1), row.getLong(2))
    def fracs(split: org.apache.spark.sql.DataFrame, c: String): String = {
      val by = split.groupBy(col(c)).agg(count(lit(1)).as("n")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      f"train ${by.getOrElse("train", 0L) * 100.0 / nDocs}%.1f%% / " +
        f"val ${by.getOrElse("val", 0L) * 100.0 / nDocs}%.1f%% / " +
        f"test ${by.getOrElse("test", 0L) * 100.0 / nDocs}%.1f%%"
    }
    val f36 = fracs(q36, "s36")
    val f97 = fracs(q97, "s97")
    graft.ops.Caches.releaseAll(spark)

    s"""leakage report @ $dir ($nDocs docs, $nPairs near-dup pairs)
       |  cross-split near-dup pairs, q36 per-doc split : $cross36
       |  cross-split near-dup pairs, q97 group split   : $cross97
       |  docs whose split moved adopting q97           : $moved
       |  ... all of them near-dup-clustered            : ${movedUnclustered == 0L} ($clustered clustered docs total)
       |  split fractions, q36                          : $f36
       |  split fractions, q97                          : $f97
       |""".stripMargin
  }
}
