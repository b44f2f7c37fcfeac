package graft.plans

import graft.functions.DotProduct
import graft.text.{CountInSet, Shingles}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{CaseWhen, ConcatWs, Expression, ExpressionInfo, In, LambdaFunction, LessThan, Literal, NamedLambdaVariable, Sequence, Size, Slice, Subtract}
import org.apache.spark.sql.catalyst.expressions.{ArrayFilter, ArrayTransform}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType}

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
    ext.injectFunction((
      FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[Shingles].getName, "graft_shingles"),
      (args: Seq[Expression]) => {
        require(args.size == 2 || args.size == 3,
          "graft_shingles(tokens, k[, distinct])")
        val k = args(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"graft_shingles expects an integer literal k, got ${other.sql}")
        }
        val distinct = args.drop(2).headOption.exists {
          case Literal(b: Boolean, _) => b
          case other => throw new IllegalArgumentException(
            s"graft_shingles expects a boolean literal distinct flag, got ${other.sql}")
        }
        Shingles(args.head, k, distinct)
      }))
    ext.injectOptimizerRule(_ => RewriteCountInSet)
    ext.injectOptimizerRule(_ => RewriteShingles)
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

/** The guarded HOF shingling idiom →  the native [[Shingles]] kernel:
  *
  *   CASE WHEN size(toks) < k THEN array()
  *        ELSE transform(sequence(1, size(toks) - (k-1)),
  *                       i -> concat_ws(' ', slice(toks, i, k)))
  *
  * becomes `Shingles(toks, k)` — the rewrite that removed per-row
  * interpreted lambda dispatch from graft's own shingle pipelines,
  * applied automatically to user-written plans. Only the GUARDED form
  * rewrites: the bare transform errors on short inputs (slice with a
  * non-positive start), and an optimizer rule must not change error
  * behavior. All three `toks` occurrences must be semantically equal,
  * the separator must be the single space (the k-gram convention), and
  * the short-input branch must be a foldable empty array. */
object RewriteShingles extends Rule[LogicalPlan] {

  private def isEmptyStringArray(e: Expression): Boolean =
    e.foldable && (e.dataType match {
      case ArrayType(StringType, _) | ArrayType(org.apache.spark.sql.types.NullType, _) =>
        e.eval() match {
          case a: org.apache.spark.sql.catalyst.util.ArrayData => a.numElements() == 0
          case _ => false
        }
      case _ => false
    })

  private def intLit(e: Expression): Option[Int] = e match {
    case Literal(v: Int, IntegerType) => Some(v)
    case _ => None
  }

  /** transform(sequence(1, size(t) - (k-1)), i -> concat_ws(' ', slice(t, i, k))) */
  private def shingleTransform(e: Expression): Option[(Expression, Int)] = e match {
    case ArrayTransform(
           Sequence(start, Subtract(Size(t1, _), km1Expr, _), step, _),
           LambdaFunction(
             ConcatWs(Seq(Literal(sep, StringType), Slice(t2, iv: NamedLambdaVariable, kExpr))),
             Seq(arg: NamedLambdaVariable), _))
        if intLit(start).contains(1) &&
          step.forall(s => intLit(s).contains(1)) &&
          sep != null && sep.toString == " " &&
          iv.exprId == arg.exprId &&
          (for (km1 <- intLit(km1Expr); k <- intLit(kExpr)) yield km1 == k - 1).getOrElse(false) &&
          t1.semanticEquals(t2) =>
      Some((t1, intLit(kExpr).get))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // legacy size(NULL) = -1 would take the empty-array branch where
      // Shingles(NULL) is NULL — only rewrite when the input can't be
      // null or size-of-null semantics agree (same guard as
      // RewriteCountInSet)
      case cw @ CaseWhen(Seq((LessThan(s0 @ Size(t0, _), kGuard), emptyBranch)), Some(body))
          if isEmptyStringArray(emptyBranch) &&
            (!t0.nullable || !s0.legacySizeOfNull) =>
        shingleTransform(body) match {
          case Some((t, k))
              if t.semanticEquals(t0) && intLit(kGuard).contains(k) =>
            Shingles(t, k, distinct = false)
          case _ => cw
        }
    }
}
