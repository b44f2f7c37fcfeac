package graft.text

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled membership-count kernel shared by [[CountInSet]]'s
  * interpreted and generated paths (the generated code calls this static,
  * keeping the janino method tiny regardless of the word-set size). */
object TextOps {

  /** Number of array elements present in `set` (duplicates counted; null
    * elements never match — same semantics as `filter(..., isin(...))`). */
  def countIn(arr: ArrayData, set: java.util.HashSet[UTF8String]): Int = {
    val n = arr.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }
}

/** Count of tokens in an `array<string>` column that belong to a fixed
  * word set — the stopword-hit primitive behind t2/t3.
  *
  * The composable alternative — `size(filter(toks, isin(words)))` — is a
  * higher-order function, and HOF lambdas are CodegenFallback in Spark:
  * interpreted per row, per element. t2 evaluates it once per document
  * and t3 four times per document, which made the interpreter, not the
  * data, the dominant cost of both queries (same failure class as the
  * pre-round-2 validator). This expression does one hash-set probe per
  * token inside whole-stage codegen: no lambda dispatch, no boxing.
  *
  * The word set rides along as a single plan constant (addReferenceObj),
  * so the generated projection stays a few lines regardless of set size.
  * Duplicates count (a stopword used twice is two hits) and null tokens
  * never match, exactly matching the HOF form and the DuckDB
  * `len(list_filter(w, x -> list_contains(...)))` oracle.
  */
case class CountInSet(child: Expression, words: Seq[String])
  extends UnaryExpression {

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<string> argument, got ${t.sql}")
    }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_count_in_set"

  override def nullSafeEval(v: Any): Any =
    TextOps.countIn(v.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("wordSet", set, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.text.TextOps.countIn($v, $setRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
