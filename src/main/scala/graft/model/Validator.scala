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
  * builds the array from `when`/`concat_ws`/`split` — built-ins that stay
  * entirely inside whole-stage codegen. (The obvious alternative —
  * `filter`/`transform` higher-order functions over an array of structs —
  * is CodegenFallback in Spark: interpreted per row, ~200× slower on the
  * validate path, measured at sf0.1.) At 100 TB that is the difference
  * between a scan-speed pass and the job's bottleneck.
  *
  * Null semantics: a rule whose expression evaluates to NULL (e.g.
  * `acctBal > 0` on a NULL balance) is counted as violated — a row can't
  * *prove* it satisfies the rule. Expressed as `coalesce(rule, false)`.
  */
object Validator {

  val ViolationColumn = "graft_violations"

  /** Joins violated rule names on a control character no rule name can
    * contain, then splits — every node here (CASE WHEN, concat_ws, split,
    * empty-array literal) compiles in whole-stage codegen (asserted in
    * PlanSpec). concat_ws skips the NULLs that satisfied rules produce. */
  private val Sep = "\u0001"

  def violationsArray(expectations: Seq[(String, String)]): Column = {
    val violatedNames = expectations.map { case (name, sql) =>
      when(!coalesce(expr(sql), lit(false)), lit(name))
    }
    val joined = concat_ws(Sep, violatedNames: _*)
    when(joined === "", array().cast("array<string>"))
      .otherwise(split(joined, Sep))
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
