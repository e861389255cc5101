package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.functions.expr

/** Column-from-Expression bridge for the reference-data cell
  * expressions ([[NearestCells]] / [[ProbeCells]] / [[AdcSubDists]]).
  *
  * Spark 4 exposes no public Column-from-Expression constructor, so
  * this registers a session function whose BUILDER closes over the
  * reference table (the [[VecDot]] registration mechanism, carrying a
  * payload), then references it by SQL name over the caller's two
  * column names.
  *
  * The registered NAME is derived from everything the builder closes
  * over — the expression class, the table's CONTENT hash
  * ([[CellTable.contentKey]]), and every non-child constructor
  * parameter of the built expression (nprobe, nSuperProbe, scale, …),
  * read off a placeholder instance's `productIterator` (ADVICE r10:
  * the earlier prefix+table key silently collided two columns over
  * the same table with different parameters unless every call site
  * remembered to encode its parameters into the prefix by hand).
  * Registration stays create-or-replace and content-addressed, so
  * repeated plan builds over the same quantizer — one per micro-batch
  * in a serving loop — reuse ONE registry entry (review r9); registry
  * growth is bounded by the number of DISTINCT (quantizer, parameter)
  * combinations the session serves.
  *
  * Lived inside [[graft.ops.Embeddings]] (hard-wired to its qv/nrm
  * columns) until round 10, when the PQ family needed the same bridge
  * over its slice/norm helper columns. */
object CellFns {

  def fnCol(spark: SparkSession, prefix: String, table: CellTable,
            aName: String, bName: String)
           (mk: (Expression, Expression) => Expression): Column = {
    // Probe instance with placeholder children: the wrapped classes
    // are case classes whose only Expression fields ARE the two
    // children, so productIterator minus Expressions is exactly the
    // parameter set the builder closed over.
    val probe = mk(Literal(0L), Literal(0L))
    val params = probe match {
      case p: Product =>
        p.productIterator.flatMap {
          case _: Expression => None
          case t: CellTable => Some(t.contentKey)
          case other => Some(String.valueOf(other))
        }.mkString(probe.getClass.getSimpleName, "_", "")
      case other => other.getClass.getSimpleName
    }
    // params can carry arbitrary content — hash it down to a fixed,
    // identifier-safe suffix (same SHA-256 family as contentKey)
    val pKey = java.security.MessageDigest.getInstance("SHA-256")
      .digest(params.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    val name = s"${prefix}_${table.contentKey}_$pKey"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name,
      { case Seq(a, b) => mk(a, b)
        case _ => throw new IllegalArgumentException(s"$name(a, b) takes 2 arguments") },
      "built-in")
    expr(s"$name($aName, $bName)")
  }
}
