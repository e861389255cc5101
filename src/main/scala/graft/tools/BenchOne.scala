package graft.tools

import org.apache.spark.sql.SparkSession

/** Single-query bench probe: times ONE SparkEntry query under the
  * exact session config graft.Bench uses (master/local[N], shuffle
  * partitions, AQE coalesce settings, noop sink), so a steady-state
  * estimate for a guard re-record can be measured without paying the
  * full 99-query surface (~90 s quiet, ~40 min at sf10). Not a graded
  * artifact — BASELINE.md records which samples came from here when a
  * guard cites one.
  *
  * WARMUP PARITY with graft.Bench (VERDICT r13 #3): the warm pass
  * runs the FULL all-query sf0.001 loop, not just the probed query.
  * The old single-query warm left the rest of the JIT/codegen/
  * allocation regime cold and probes read ~1.5-1.7× over same-session
  * full-surface values (q76: probe 4.53 vs builder-sample 2.5-2.6;
  * q65: 0.944 vs 0.646 graded) — which confounded exactly the
  * adjudication this tool exists for. The warm seconds print on the
  * output line, so a probe is read against box heat the same way a
  * graded line is (quiet ≈ 98-105 s).
  *
  * Usage: runMain graft.tools.BenchOne <query_name> [sfDir] [runs]
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(
      sys.error("usage: BenchOne <query_name> [sfDir] [runs]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
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
    val fn = graft.SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query: $name (known: ${graft.SparkEntry.queries.keys.toSeq.sorted.mkString(", ")})"))
    val w0 = System.nanoTime()
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (_, f) =>
      f(spark, warmDir).write.format("noop").mode("overwrite").save()
    }
    graft.ops.Caches.releaseAll(spark)
    spark.catalog.clearCache()
    val warm = (System.nanoTime() - w0) / 1e9
    val times = (1 to runs).map { _ =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    graft.ops.Caches.releaseAll(spark)
    println(f"BENCHONE $name sf=$sfDir warm=$warm%.1f runs=${times.map(t => f"$t%.3f").mkString(",")} min=${times.min}%.3f")
    spark.stop()
  }
}
