package graft.tools

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-stage attribution probe for decade-ratio root-causing (VERDICT
  * r14 #2): runs ONE SparkEntry query at a given SF under the exact
  * graft.Bench session config, collects per-stage metrics for the
  * MEASURED (second) run via a SparkListener, and prints one JSON line
  * per stage — task time, input/shuffle bytes and rows, spill, peak
  * task memory. Comparing the same query's stage table across sf1 and
  * sf10 attributes a >10× second-decade ratio to its actual cause:
  * data growth (input bytes ~10×, time ~10×), a superlinear shuffle
  * (shuffle bytes ≫10×), or memory pressure (spill appears / peak
  * memory at the ceiling). Not a graded artifact — a measurement tool,
  * the BenchOne warm-parity discipline applied to stage metrics.
  *
  * Usage: runMain graft.tools.StageProfile <q1[,q2,...]> [sfDir]
  * (comma list: one warm loop, then each query profiled in turn —
  * the round-15 sweep shape; single-name behavior unchanged)
  */
object StageProfile {

  private final case class StageRow(id: Int, name: String, tasks: Int,
                                    runMs: Long, inBytes: Long, inRows: Long,
                                    srBytes: Long, srRows: Long,
                                    swBytes: Long, swRows: Long,
                                    memSpill: Long, diskSpill: Long,
                                    peakExec: Long)

  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(',').toSeq).getOrElse(
      sys.error("usage: StageProfile <q1[,q2,...]> [sfDir]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
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
    val fns = names.map(n => n -> graft.SparkEntry.queries.getOrElse(n,
      sys.error(s"unknown query: $n")))
    // warm parity with BenchOne: full sf0.001 loop
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (_, f) =>
      f(spark, warmDir).write.format("noop").mode("overwrite").save()
    }
    graft.ops.Caches.releaseAll(spark)
    spark.catalog.clearCache()
    fns.foreach { case (name, fn) =>
      // run 1 = cache-building run (the bench's first sample); the
      // listener attaches only around run 2, the steady-state one
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val stages = new ConcurrentLinkedQueue[StageRow]()
      val listener = new SparkListener {
        override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
          val i = sc.stageInfo
          val m = i.taskMetrics
          stages.add(StageRow(i.stageId,
            i.name.takeWhile(_ != '\n').take(80),
            i.numTasks, m.executorRunTime,
            m.inputMetrics.bytesRead, m.inputMetrics.recordsRead,
            m.shuffleReadMetrics.totalBytesRead, m.shuffleReadMetrics.recordsRead,
            m.shuffleWriteMetrics.bytesWritten, m.shuffleWriteMetrics.recordsWritten,
            m.memoryBytesSpilled, m.diskBytesSpilled,
            m.peakExecutionMemory))
        }
      }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      // settle the async listener bus before reading (the public API has
      // no drain; stage-completed events post within milliseconds of the
      // job end this thread just observed)
      Thread.sleep(2000)
      spark.sparkContext.removeSparkListener(listener)
      graft.ops.Caches.releaseAll(spark)
      import scala.jdk.CollectionConverters._
      val rows = stages.asScala.toSeq.sortBy(-_.runMs)
      def j(r: StageRow): String =
        s"""{"stage":${r.id},"name":"${r.name.replace("\"", "'")}","tasks":${r.tasks},""" +
          s""""run_ms":${r.runMs},"in_mb":${r.inBytes / 1048576},"in_rows":${r.inRows},""" +
          s""""sh_read_mb":${r.srBytes / 1048576},"sh_read_rows":${r.srRows},""" +
          s""""sh_write_mb":${r.swBytes / 1048576},"sh_write_rows":${r.swRows},""" +
          s""""spill_mem_mb":${r.memSpill / 1048576},"spill_disk_mb":${r.diskSpill / 1048576},""" +
          s""""peak_exec_mb":${r.peakExec / 1048576}}"""
      println(f"""[stageprofile] {"query":"$name","sf_dir":"$sfDir","sec":$sec%.2f,"stages":[""")
      rows.foreach(r => println("[stageprofile]   " + j(r) + ","))
      println("[stageprofile] ]}")
    }
    spark.stop()
  }
}
