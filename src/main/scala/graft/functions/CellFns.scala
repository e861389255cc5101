package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.functions.expr

/** Column-from-Expression bridge for the reference-data cell
  * expressions ([[NearestCells]] / [[ProbeCells]] / [[AdcSubDists]]).
  *
  * Spark 4 exposes no public Column-from-Expression constructor, so
  * this registers a session function whose BUILDER closes over the
  * reference table (the [[VecDot]] registration mechanism, carrying a
  * payload), then references it by SQL name over the caller's two
  * column names. The name derives from the table's CONTENT hash
  * ([[CellTable.contentKey]]), so repeated plan builds over the same
  * centroid matrix — one per micro-batch in a serving loop — reuse
  * ONE registry entry instead of leaking a table per call (review
  * r9); registry growth is bounded by the number of DISTINCT
  * quantizers the session serves.
  *
  * Lived inside [[graft.ops.Embeddings]] (hard-wired to its qv/nrm
  * columns) until round 10, when the PQ family needed the same bridge
  * over its slice/norm helper columns. */
object CellFns {

  def fnCol(spark: SparkSession, prefix: String, table: CellTable,
            aName: String, bName: String)
           (mk: (Expression, Expression) => Expression): Column = {
    val name = s"${prefix}_${table.contentKey}"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name,
      { case Seq(a, b) => mk(a, b)
        case _ => throw new IllegalArgumentException(s"$name(a, b) takes 2 arguments") },
      "built-in")
    expr(s"$name($aName, $bName)")
  }
}
