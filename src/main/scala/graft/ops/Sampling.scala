package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic sampling/splitting for training-data pipelines.
  *
  * Both operators key on [[LlmOps.portableHash64]] of the document id
  * plus a salt, NOT on `rand()`: the assignment is a pure function of
  * (id, salt), so it is reproducible across runs, engines (the DuckDB
  * oracle replays it bit-for-bit), cluster sizes, and re-partitions —
  * the property that makes a 100 TB split auditable. Both are
  * single-scan, zero-shuffle projections/filters (the output sort is
  * presentation only); at scale the filter pushes into the scan
  * pipeline and never materializes the dropped rows.
  */
object Sampling {

  /** Hash in [0, 1000) for doc `id` under `salt` — the shared
    * assignment primitive (the hash is a positive 60-bit value, so
    * the modulo is already non-negative). NULL-PROPAGATING `concat`,
    * not concat_ws: a null salt component (e.g. a null `source`
    * stratum) must null the hash so the row drops out of the sample —
    * exactly what the oracle's SQL `||` does; concat_ws would silently
    * skip the null and lump such rows into a phantom stratum. */
  private def bucket1000(id: Column, salt: Column): Column =
    pmod(LlmOps.portableHash64(concat(salt, lit(":"), id.cast("string"))), lit(1000L))

  /** q36 — deterministic train/val/test split: 80/10/10 by hash
    * bucket. Every document gets exactly one split label; the same
    * (doc_id, salt) maps to the same split forever. */
  def hashSplit(spark: SparkSession, dir: String,
                salt: String = "split-v1",
                trainPermille: Int = 800, valPermille: Int = 100): DataFrame = {
    require(trainPermille + valPermille <= 1000, "split fractions exceed 1")
    val b = bucket1000(col("doc_id"), lit(salt))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        when(b < trainPermille, "train")
          .when(b < trainPermille + valPermille, "val")
          .otherwise("test").as("split"))
      .orderBy(col("doc_id"))
  }

  /** q37 — per-stratum deterministic sample: keep `permille`/1000 of
    * each `source` stratum (a per-stratum salt decorrelates strata so
    * a hot doc_id range cannot starve one stratum). Emits the kept
    * rows — at 100 TB this is the scan-side filter that feeds an
    * export job, so selectivity is the cost. */
  def stratifiedSample(spark: SparkSession, dir: String,
                       permille: Int = 200, salt: String = "sample-v1"): DataFrame = {
    require(permille >= 0 && permille <= 1000, "permille out of range")
    // null-propagating concat (see bucket1000): a null source nulls
    // the hash and the row drops out, matching the oracle's `||`
    val b = bucket1000(col("doc_id"), concat(lit(salt + "/"), col("source")))
    Tables.documents(spark, dir)
      .filter(b < permille)
      .select(col("doc_id"), col("source"), col("lang"))
      .orderBy(col("doc_id"))
  }
}
