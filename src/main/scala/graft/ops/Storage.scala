package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-layout operators — the two Spark-native layouts that turn
  * "read 100 TB" into "read the slice you need":
  *
  *  - PARTITIONED writes (`partitionBy`): one directory per partition
  *    value; a filter on the partition column becomes a
  *    `PartitionFilters` entry on the scan and non-matching
  *    directories are never listed, let alone read. The right layout
  *    for low-cardinality pruning keys (source, date, lang).
  *  - BUCKETED tables (`bucketBy` + `sortBy`): rows pre-shuffled into
  *    a fixed number of hash buckets per table at WRITE time; a join
  *    or aggregation on the bucket key then needs NO exchange at read
  *    time — the shuffle is paid once, at ingest, instead of on every
  *    query. The right layout for high-cardinality join keys
  *    (doc_id, user_id) under repeated joins.
  *
  * Both are plain `DataFrameWriter` surfaces; these helpers pin the
  * layout contract (mode, format, metastore naming) in ONE place and
  * [[StorageSpec]] asserts the plans actually deliver the promise:
  * pruned `PartitionFilters` on the partitioned scan, zero
  * `Exchange` in the bucketed join. Bucketed tables go through the
  * session catalog (`saveAsTable` — bucket metadata lives in the
  * metastore; a path-only parquet write silently loses it).
  */
object Storage {

  /** Write `df` partitioned by `cols` (directory-per-value layout).
    * Readers filtering on `cols` prune at the file listing. */
  def writePartitioned(df: DataFrame, path: String, cols: String*): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(cols: _*).parquet(path)

  /** Read a partitioned dataset back. Spark discovers the partition
    * columns from the directory names. */
  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Write `df` as a bucketed + bucket-sorted catalog table: `n`
    * hash buckets on `key`, each bucket file sorted by `key`. A
    * subsequent equi-join or groupBy on `key` between tables
    * bucketed the same way plans with NO shuffle exchange (and the
    * sort often collapses into a merge join's requirement). */
  def writeBucketed(df: DataFrame, table: String, key: String, n: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(n, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** Inner equi-join of two same-bucketed catalog tables on `key` —
    * the co-located join: with matching bucket counts both sides read
    * pre-shuffled, so the plan contains no Exchange for the join.
    * The MERGE hint pins a sort-merge join: the operator this layout
    * exists for is big ⋈ big (where broadcast is impossible and SMJ is
    * what the planner picks anyway); without the hint a small-table
    * demo broadcasts and the planner marks the scans `Bucketed: false
    * (disabled by query planner)` — bucketing only pays through SMJ /
    * shuffled-hash. (Bucketing itself requires
    * `spark.sql.sources.bucketing.enabled`, on by default; mismatched
    * bucket counts shuffle the smaller-bucketed side.) */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   key: String): DataFrame =
    spark.table(left).hint("merge").join(spark.table(right), Seq(key))

  /** The partition-pruning read path: filter on the partition column
    * pushed at listing time. Exposed as a helper so the spec and
    * callers share one definition. */
  def prunedRead(spark: SparkSession, path: String,
                 partCol: String, value: String): DataFrame =
    readPartitioned(spark, path).filter(col(partCol) === value)
}
