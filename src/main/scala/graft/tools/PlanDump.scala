package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Physical-plan capture for the optimization-round evidence trail
  * (plans/r{N}/<query>_{before,after}.txt): writes every named query's
  * `.explain("formatted")` output to one file each, under the exact
  * session config graft.Bench runs with, so a plan claim in
  * OPTIMIZATION_r{N}.md ("2 Exchange → 1", "PushedFilters includes X")
  * is checkable against a committed artifact without running Spark.
  * Not a graded artifact — a measurement tool.
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <suffix> [sfDir] [q1,q2,...]
  *   suffix: appended to the query name ("before"/"after")
  *   queries: comma-separated names or prefixes; default = all
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <outDir> <suffix> [sfDir] [q1,q2,...]")
    val outDir = Paths.get(args(0))
    val suffix = args(1)
    val sfDir = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val wanted = args.lift(3).map(_.split(',').toSeq)
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
    Files.createDirectories(outDir)
    val qs = graft.SparkEntry.queries.toSeq.sortBy(_._1).filter { case (n, _) =>
      wanted.forall(_.exists(w => n == w || n.startsWith(w)))
    }
    qs.foreach { case (name, fn) =>
      val txt = scala.util.Try {
        fn(spark, sfDir).queryExecution.explainString(FormattedMode)
      }.recover { case e => s"EXPLAIN FAILED: $e" }.get
      Files.write(outDir.resolve(s"${name}_$suffix.txt"),
        txt.getBytes(StandardCharsets.UTF_8))
      println(s"[plandump] wrote ${name}_$suffix.txt (${txt.length} chars)")
      graft.ops.Caches.releaseAll(spark)
    }
    spark.stop()
  }
}
