package graft.plans

import graft.functions.DotProduct
import graft.text.CountInSet
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, In, LambdaFunction, Literal, NamedLambdaVariable, Size}
import org.apache.spark.sql.catalyst.expressions.ArrayFilter
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType

/** Catalyst session extensions (SURVEY §3/§4 — the
  * `SparkSessionExtensions` integration path for custom operators):
  *
  * 1. SQL surface for graft's native expressions — `graft_dot(a, b)` and
  *    `graft_count_in_set(toks, 'w1', 'w2', ...)` become callable from
  *    `spark.sql`, so SQL-only users (the service path, ad-hoc
  *    notebooks) get the codegen'd kernels, not interpreted HOFs.
  *
  * 2. [[RewriteCountInSet]], an optimizer rule that transparently
  *    rewrites the naive HOF formulation `size(filter(toks,
  *    x -> x IN (...literals)))` into the native [[CountInSet]] — the
  *    exact rewrite that bought ~20× on the t2/t3 hot paths, applied
  *    automatically to user-written plans.
  *
  * Wired into every graft session by `GraftSession.build` (extensions
  * bind at session construction).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "graft_dot(arrayA, arrayB)")
        DotProduct(args(0), args(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_count_in_set"),
      new ExpressionInfo(classOf[CountInSet].getName, "graft_count_in_set"),
      (args: Seq[Expression]) => {
        val words = args.drop(1).map {
          case Literal(v, StringType) if v != null => v.toString
          case other => throw new IllegalArgumentException(
            s"graft_count_in_set expects string literal words, got ${other.sql}")
        }
        require(args.nonEmpty && words.nonEmpty, "graft_count_in_set(tokens, word, ...)")
        CountInSet(args.head, words)
      }))
    ext.injectOptimizerRule(_ => RewriteCountInSet)
  }
}

/** size(filter(arr, x -> x IN (literals))) → CountInSet(arr, literals).
  *
  * Guarded to null-equivalent cases only: legacy `size(NULL)` returns -1
  * while CountInSet is null-preserving, so the rewrite fires when the
  * array is non-nullable (or the session runs with ANSI size-of-null
  * semantics, where both return null). The literal list must be all
  * strings — the word-set contract of the native kernel. */
object RewriteCountInSet extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case s @ Size(ArrayFilter(arr,
             LambdaFunction(In(v: NamedLambdaVariable, list), Seq(arg: NamedLambdaVariable), _)), _)
          if v.exprId == arg.exprId &&
            list.nonEmpty &&
            list.forall {
              case Literal(w, StringType) => w != null
              case _ => false
            } &&
            (!arr.nullable || !s.legacySizeOfNull) =>
        CountInSet(arr, list.map(_.asInstanceOf[Literal].value.toString))
    }
}
