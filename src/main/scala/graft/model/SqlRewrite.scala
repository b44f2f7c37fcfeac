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

  /** Rewrite attributes to arbitrary table-space SQL *expressions* — the
    * general form of [[rename]], needed when a field doesn't map to a
    * bare column: enum-translating CASE expressions and derived
    * properties inlined into constraints (the reference compiles both
    * through the Legend engine's planner; graft substitutes at the
    * Catalyst AST level).
    *
    * Substitution keys may be DOTTED paths ("address.city" → the flat
    * column an embedded mapping assigns it): the LONGEST matching
    * name-part prefix wins, so a flattened leaf outranks a head-only
    * rename and un-flattened struct access still works beside it.
    *
    * Replacements are spliced as-is and NOT re-visited: they are already
    * in table space, and descending into them would loop when a column
    * shares its name with the entity field it backs (e.g. `sme` →
    * `CASE sme ... END`). Dotted paths keep the rename-on-head behavior
    * when the replacement is itself an attribute; substituting a
    * non-attribute expression under a dotted tail is an error (loud
    * beats silent misreads). */
  def substitute(sqlExpr: String, subs: Map[String, String]): String = {
    if (subs.isEmpty) return rename(sqlExpr, Map.empty)
    val root = CatalystSqlParser.parseExpression(sqlExpr)
    // parse the substitution map only when some attribute can match it
    // (callers like Expectations substitute many rules against one map;
    // rules touching no mapped field skip the map parse entirely)
    val touches = root.exists {
      case a: UnresolvedAttribute =>
        (1 to a.nameParts.size).exists(k => subs.contains(a.nameParts.take(k).mkString(".")))
      case _ => false
    }
    if (!touches) return root.sql
    val parsedSubs = subs.map { case (k, v) => k -> CatalystSqlParser.parseExpression(v) }
    substituteParsed(root, parsedSubs).sql
  }

  /** Expression-level form of [[substitute]] — the single implementation
    * of longest-dotted-prefix attribute replacement, shared with the
    * service compiler's joined path (one walk, one set of semantics). */
  private[model] def substituteParsed(
      root: org.apache.spark.sql.catalyst.expressions.Expression,
      subs: Map[String, org.apache.spark.sql.catalyst.expressions.Expression]):
      org.apache.spark.sql.catalyst.expressions.Expression = {
    import org.apache.spark.sql.catalyst.expressions.Expression
    def walk(e: Expression): Expression = e match {
      case a: UnresolvedAttribute =>
        // longest dotted-prefix match over the name parts
        val hit = (a.nameParts.size to 1 by -1).iterator
          .map(k => (k, a.nameParts.take(k).mkString(".")))
          .find { case (_, key) => subs.contains(key) }
        hit match {
          case Some((k, key)) =>
            val tail = a.nameParts.drop(k)
            subs(key) match {
              case ua: UnresolvedAttribute => UnresolvedAttribute(ua.nameParts ++ tail)
              case replacement =>
                require(tail.isEmpty,
                  s"cannot substitute expression [${subs(key).sql}] under dotted path [${a.name}]")
                replacement
            }
          case None => a
        }
      case other => other.mapChildren(walk)
    }
    walk(root)
  }

  /** Syntax-check an expression (throws ParseException on bad input). */
  def validateSyntax(sqlExpr: String): Unit = {
    CatalystSqlParser.parseExpression(sqlExpr)
    ()
  }
}
