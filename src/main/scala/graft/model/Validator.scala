package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Native row validation (SURVEY §2.1, M5).
  *
  * Appends an array column listing the names of every rule a row
  * violates — the same observable behaviour as the reference's
  * `legendValidate` (package.scala:33-51) but with a crucial execution
  * difference: the reference uses a row UDF (opaque to Catalyst — no
  * pushdown through it, every row serialized to Scala objects); graft
  * composes built-in higher-order functions (`filter`/`transform` over an
  * array of structs), a native expression tree operating directly on
  * Tungsten rows. (HOF lambdas are CodegenFallback, so this projection
  * itself is interpreted, but each rule predicate inside evaluates as a
  * compiled Catalyst expression and no ser/de boundary is crossed —
  * and [[clean]]'s conjunctive filter form stays fully codegen'd and
  * scan-pushable.) At 100 TB that is the difference between a scan-speed
  * pass and a serialization bottleneck.
  *
  * Null semantics: a rule whose expression evaluates to NULL (e.g.
  * `acctBal > 0` on a NULL balance) is counted as violated — a row can't
  * *prove* it satisfies the rule. Expressed as `coalesce(rule, false)`.
  */
object Validator {

  val ViolationColumn = "graft_violations"

  def violationsArray(expectations: Seq[(String, String)]): Column = {
    val checks = expectations.map { case (name, sql) =>
      struct(lit(name).as("rule"), coalesce(expr(sql), lit(false)).as("ok"))
    }
    transform(
      filter(array(checks: _*), c => !c.getField("ok")),
      c => c.getField("rule"))
  }

  /** df + violations column. Clean rows get an empty array (not null),
    * so `size(col) = 0` is the clean-row predicate. */
  def validate(df: DataFrame,
               expectations: Seq[(String, String)],
               colName: String = ViolationColumn): DataFrame =
    df.withColumn(colName, violationsArray(expectations))

  /** Only rows satisfying every expectation (single AND chain — lets
    * Catalyst push conjuncts into the scan where possible). */
  def clean(df: DataFrame, expectations: Seq[(String, String)]): DataFrame =
    expectations.map { case (_, sql) => coalesce(expr(sql), lit(false)) }
      .reduceOption(_ && _)
      .fold(df)(df.filter)

  /** Rows violating at least one expectation, with the violations column. */
  def quarantine(df: DataFrame,
                 expectations: Seq[(String, String)],
                 colName: String = ViolationColumn): DataFrame =
    validate(df, expectations, colName).filter(size(col(colName)) > 0)
}
