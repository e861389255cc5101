package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide session; suites
  * run sequentially under sbt's default forked test JVM). */
object SparkSpec {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.spark

  /** Gate for suites pinned against the EXTERNAL read-only reference
    * tree (golden E2E, verbatim SQL, owners glue): skipped when the
    * tree is absent, or explicitly via GRAFT_SKIP_REF_GOLDEN=1 — the
    * documented escape hatch if that tree ever drifts, so the
    * repo-controlled suite can still run green (ADVICE r4). */
  def refTreeAvailable: Boolean =
    java.nio.file.Files.isDirectory(java.nio.file.Paths.get("/root/reference")) &&
      !sys.env.get("GRAFT_SKIP_REF_GOLDEN").contains("1")
}
