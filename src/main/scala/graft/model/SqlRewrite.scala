package graft.model

import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.parser.CatalystSqlParser

/** Entity-space → table-space SQL rewriting.
  *
  * The reference compiles PURE lambdas to SQL through the Legend engine's
  * execution planner (Legend.scala:339-369). graft's equivalent is pure
  * Catalyst: parse the expression, rename attributes through the mapping,
  * and print it back to SQL — no external compiler, and the result is a
  * plain Spark SQL string that stays inside codegen when executed.
  */
object SqlRewrite {

  /** Rewrite top-level attribute names in a SQL expression. Dotted paths
    * (nested struct access) rename on the head part only; names absent
    * from the map (e.g. aliases introduced by the query) pass through. */
  def rename(sqlExpr: String, renames: Map[String, String]): String = {
    val parsed = CatalystSqlParser.parseExpression(sqlExpr)
    val rewritten = parsed.transform {
      case a: UnresolvedAttribute if renames.contains(a.nameParts.head) =>
        UnresolvedAttribute(renames(a.nameParts.head) +: a.nameParts.tail)
    }
    rewritten.sql
  }

  /** Syntax-check an expression (throws ParseException on bad input). */
  def validateSyntax(sqlExpr: String): Unit = {
    CatalystSqlParser.parseExpression(sqlExpr)
    ()
  }
}
