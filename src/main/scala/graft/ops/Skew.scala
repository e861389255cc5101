package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-salting for shuffle joins (SURVEY §4 100 TB notes): when one
  * join key carries a disproportionate share of the fact side, the
  * single reducer owning that key becomes the job's critical path. AQE
  * skew-join splits oversized PARTITIONS, but a single monster KEY
  * still lands on one task — salting is the standard fix: scatter the
  * fact side across `salts` sub-keys and replicate the dim side to
  * every sub-key, turning one hot reducer into `salts` even ones at
  * the cost of a `salts`× dim replication (cheap — the dim side is
  * small or it would not be the build side).
  */
object Skew {

  /** Equi-join `facts ⋈ dims` on `key`, salted `salts` ways. Result is
    * identical to the unsalted join (the scatter only routes rows);
    * the dim replication uses explode, so it stays a single plan with
    * no driver-side loop. */
  def saltedEquiJoin(facts: DataFrame, dims: DataFrame, key: String,
                     salts: Int = 16, joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    // deterministic scatter: hash of the full fact row — any scatter
    // yields a correct join; a row-derived one keeps reruns stable
    val salted = facts.withColumn("__salt",
      pmod(hash(facts.columns.map(col).toSeq: _*), lit(salts)))
    val replicated = dims.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
