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

  private val Space = UTF8String.fromString(" ")

  /** Word k-grams of a token array, space-joined, in position order;
    * `distinct` keeps each shingle's first occurrence only. Null tokens
    * contribute empty strings (the tokenizer never yields nulls).
    * Shared by [[Shingles]]'s interpreted and generated paths. */
  def shingles(toks: ArrayData, k: Int, distinct: Boolean): ArrayData = {
    val n = toks.numElements()
    if (n < k)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[AnyRef](n - k + 1)
    val seen = if (distinct) new java.util.HashSet[UTF8String](2 * (n - k + 1)) else null
    val parts = new Array[UTF8String](k)
    var i = 0
    while (i <= n - k) {
      var j = 0
      while (j < k) {
        parts(j) = if (toks.isNullAt(i + j)) UTF8String.EMPTY_UTF8
                   else toks.getUTF8String(i + j)
        j += 1
      }
      val s = UTF8String.concatWs(Space, parts: _*)
      if (!distinct || seen.add(s)) out.add(s)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  /** Non-overlapping token windows of width `w`, space-joined, in
    * position order; the final window may be partial (passage dedup must
    * not silently drop tail text). Shared by [[TokenChunks]]'s
    * interpreted and generated paths. */
  def chunks(toks: ArrayData, w: Int): ArrayData = {
    val n = toks.numElements()
    if (n == 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[AnyRef]((n + w - 1) / w)
    var i = 0
    while (i < n) {
      val end = math.min(i + w, n)
      val parts = new Array[UTF8String](end - i)
      var j = i
      while (j < end) {
        parts(j - i) = if (toks.isNullAt(j)) UTF8String.EMPTY_UTF8
                       else toks.getUTF8String(j)
        j += 1
      }
      out.add(UTF8String.concatWs(Space, parts: _*))
      i += w
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
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

/** Word k-gram ("shingle") array from an `array<string>` token column —
  * the shingling primitive behind the MinHash/Jaccard/fingerprint/
  * contamination pipelines.
  *
  * Why native: the two composable forms both lose at scale. The HOF form
  * (`transform(sequence(...), i -> concat_ws(' ', slice(toks, i, k)))`)
  * is CodegenFallback — interpreted per row AND per element, the exact
  * failure class CountInSet fixed for membership counting. The window
  * form (posexplode → lead(tok, j) over (partition by id order by pos))
  * is codegen'd but buys its shingles with a full SHUFFLE + SORT of the
  * exploded token stream — at 100 TB that Exchange carries the entire
  * tokenized corpus and exists only to reassemble adjacency that the
  * source row already had. This expression emits the shingle array in
  * one pass inside whole-stage codegen: no lambda dispatch, no shuffle,
  * map-side only.
  *
  * `distinct = true` folds the downstream DISTINCT into the same pass
  * (first occurrence kept), which drops yet another Exchange from
  * consumers that only need the shingle SET (Jaccard, contamination).
  */
/** Fixed-width non-overlapping token chunks from an `array<string>`
  * token column — the passage grain behind d7's boilerplate removal.
  * Same native-kernel rationale as [[Shingles]] (the composable
  * `transform(sequence(...), ...)` form is CodegenFallback); stride ==
  * width distinguishes it from shingling, and the partial tail window is
  * kept so no text escapes the frequency count. */
case class TokenChunks(child: Expression, w: Int)
  extends UnaryExpression {

  require(w >= 1, s"chunk width must be >= 1, got $w")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<string> argument, got ${t.sql}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_token_chunks"

  override def nullSafeEval(v: Any): Any =
    TextOps.chunks(v.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.text.TextOps.chunks($v, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class Shingles(child: Expression, k: Int, distinct: Boolean)
  extends UnaryExpression {

  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<string> argument, got ${t.sql}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(v: Any): Any =
    TextOps.shingles(v.asInstanceOf[ArrayData], k, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.text.TextOps.shingles($v, $k, $distinct);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
