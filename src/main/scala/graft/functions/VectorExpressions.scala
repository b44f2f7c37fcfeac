package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dot product over two `array<double>` columns.
  *
  * The composable alternative — `aggregate(zip_with(a, b, _*_), 0.0, _+_)`
  * — is a higher-order function, and HOF lambdas are CodegenFallback in
  * Spark: interpreted per row, per element. On the similarity hot paths
  * (brute-force scoring, LSH bucketing, IVF assignment — each computes
  * many dot products per corpus row) that interpretation dominates the
  * query. This expression generates a tight primitive loop inside
  * whole-stage codegen instead: no boxing, no lambda dispatch, no
  * ser/de.
  *
  * Semantics match the sequential left-to-right fold exactly (same double
  * rounding order, so DuckDB `list_dot_product` oracles keep comparing
  * bit-identical results). Contract: equal-length arrays with non-null
  * elements (the embedding-column contract); if lengths differ the common
  * prefix is used.
  *
  * Reference capability context: the reference engine has no vector ops —
  * this is part of graft's LLM-pipeline surface (SURVEY §2.4).
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two array<double> arguments, got ${l.sql} and ${r.sql}")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Compiled centroid math shared by [[NearestCentroids]]'s interpreted
  * and generated paths (the generated code calls these statics, keeping
  * each janino method tiny no matter how many centroids there are). */
object CentroidOps {

  /** Ids (indices) of the `m` centroids nearest to `vec` by cosine,
    * ordered by (cosine desc, id asc) — ties resolve to the smaller id,
    * matching `row_number() OVER (ORDER BY cos DESC, list_id ASC)`.
    * Cosine = dot / (|vec| * norms(i)) with sequential double folds. */
  def nearest(vec: ArrayData, cents: Array[Array[Double]],
              norms: Array[Double], m: Int): ArrayData = {
    val nv = vec.numElements()
    var vv = 0.0
    var i = 0
    while (i < nv) { val x = vec.getDouble(i); vv += x * x; i += 1 }
    val vnorm = math.sqrt(vv)
    val k = cents.length
    val cos = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cv = cents(c)
      val n = math.min(nv, cv.length)
      var acc = 0.0
      var j = 0
      while (j < n) { acc += vec.getDouble(j) * cv(j); j += 1 }
      cos(c) = acc / (vnorm * norms(c))
      c += 1
    }
    // selection of the top m by (cos desc, id asc): m and k are tiny
    val out = new Array[Int](math.min(m, k))
    val taken = new Array[Boolean](k)
    var o = 0
    while (o < out.length) {
      var best = -1
      var bc = 0
      while (bc < k) {
        if (!taken(bc) && (best < 0 || cos(bc) > cos(best))) best = bc
        bc += 1
      }
      taken(best) = true
      out(o) = best
      o += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Ids of the `m` nearest centroids (by cosine) for an `array<double>`
  * vector column — the IVF assignment/probe primitive.
  *
  * The centroid matrix is a plan constant attached via `addReferenceObj`,
  * so the generated projection stays a few lines regardless of nlist
  * (inlining nlist × dim literal arrays into the expression tree makes
  * janino compilation, not the data, the dominant query cost — measured
  * at sf0.1). Evaluation itself runs as compiled JVM code either way.
  */
case class NearestCentroids(child: Expression,
                            centroids: Array[Array[Double]],
                            m: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  private val norms: Array[Double] =
    centroids.map(v => math.sqrt(v.map(x => x * x).sum))

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<double> argument, got ${t.sql}")
    }

  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.IntegerType, false)

  override def prettyName: String = "graft_nearest_centroids"

  override def nullSafeEval(v: Any): Any =
    CentroidOps.nearest(v.asInstanceOf[ArrayData], centroids, norms, m)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
    val normRef = ctx.addReferenceObj("norms", norms, "double[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.CentroidOps.nearest($v, $centRef, $normRef, $m);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-level entry points for graft's native expressions. */
object VectorFunctions {

  /** Codegen'd dot product of two array<double> columns. */
  def dotProduct(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** Ids of the `m` centroids nearest to `vec` (cos desc, id asc). */
  def nearestCentroids(vec: Column, centroids: Array[Array[Double]], m: Int): Column =
    Bridge.column(NearestCentroids(Bridge.expression(vec), centroids, m))
}
