package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic: run one query twice exactly like graft.Bench does
  * (fresh builder call per run, Caches released only after the pair)
  * and print the SECOND run's executed plan, so cache reuse across
  * builder invocations is checkable: an InMemoryTableScan above the
  * documents scan means the second run read the cache; a parquet
  * FileScan means it rebuilt. Usage: CacheCheck <query> [sfDir] */
object CacheCheck {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: CacheCheck <query> [sfDir]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
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
    val fn = graft.SparkEntry.queries(name)
    val t1 = System.nanoTime()
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    val r1 = (System.nanoTime() - t1) / 1e9
    val df2 = fn(spark, sfDir)
    val t2 = System.nanoTime()
    df2.write.format("noop").mode("overwrite").save()
    val r2 = (System.nanoTime() - t2) / 1e9
    println(f"[cachecheck] $name run1=$r1%.2f run2=$r2%.2f")
    val plan = df2.queryExecution.executedPlan.toString
    val imts = plan.split('\n').count(_.contains("InMemoryTableScan"))
    val scans = plan.split('\n').count(l => l.contains("FileScan") || l.contains("Scan parquet"))
    println(s"[cachecheck] run2 plan: InMemoryTableScan=$imts parquetScan=$scans")
    plan.split('\n').filter(l => l.contains("SortMergeJoin") || l.contains("BroadcastHashJoin") ||
      l.contains("ShuffledHashJoin") || l.contains("Exchange") || l.contains("AQEShuffleRead"))
      .take(20).foreach(l => println("[cachecheck] " + l.trim.take(110)))
    graft.ops.Caches.releaseAll(spark)
    spark.stop()
  }
}
