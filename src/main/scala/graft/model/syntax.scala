package graft.model

import org.apache.spark.sql.DataFrame

/** Implicit DataFrame syntax — the ergonomic entry point the reference
  * ships as `import org.finos.legend.spark._` (package.scala:27-51:
  * `df.legendTransform(renames)` / `df.legendValidate(expectations)`).
  *
  * graft's equivalents delegate to the existing engine objects, so the
  * execution characteristics are the library's, not the reference's:
  * `graftValidate` builds the violation array from codegen'd built-ins
  * (see [[Validator]] — the reference uses a row UDF, opaque to
  * Catalyst), and `graftTransform` is one projection, not N chained
  * renames. Model-aware forms (by mapping name) sit next to the
  * reference-parity raw-Map forms so a caller holding a [[GraftModel]]
  * never re-derives rule/rename maps by hand.
  *
  * Usage:
  * {{{
  *   import graft.model.syntax._
  *   raw.graftValidate(model, "my::mapping")          // + graft_violations
  *   raw.graftClean(model, "my::mapping")             // clean rows only
  *   raw.graftToEntity(model.mapping("my::mapping"))  // table → entity space
  *   entity.graftTransform(model.mapping("my::mapping").fields) // → table space
  * }}}
  */
object syntax {

  implicit class GraftDataFrameOps(private val df: DataFrame) extends AnyVal {

    /** Reference-parity rename pass (`legendTransform`,
      * package.scala:29-31): applied as ONE projection. */
    def graftTransform(renames: Map[String, String]): DataFrame =
      df.withColumnsRenamed(renames)

    /** Reference-parity validation (`legendValidate`, package.scala:33-51):
      * appends an array column naming every violated rule, empty array
      * for clean rows. Rule order in the array follows `expectations`
      * iteration order (insertion order for the usual small maps). */
    def graftValidate(expectations: Map[String, String],
                      colName: String = Validator.ViolationColumn): DataFrame =
      Validator.validate(df, expectations.toSeq, colName)

    /** Model-aware validation: all technical + business expectations of
      * `mappingName`, compiled to this df's (table-space) columns. */
    def graftValidate(model: GraftModel, mappingName: String): DataFrame =
      Validator.validate(df, Expectations.forMapping(model, mappingName))

    /** Rows satisfying every expectation of the mapping (one AND chain —
      * conjuncts push into the scan where possible). */
    def graftClean(model: GraftModel, mappingName: String): DataFrame =
      Validator.clean(df, Expectations.forMapping(model, mappingName))

    /** Rows violating at least one expectation, with the violation column. */
    def graftQuarantine(model: GraftModel, mappingName: String): DataFrame =
      Validator.quarantine(df, Expectations.forMapping(model, mappingName))

    /** Table-space df → entity field names (enum codes translated). */
    def graftToEntity(mapping: GraftMapping): DataFrame =
      Transformer.toEntity(df, mapping)

    /** Entity-space df → table column names (write direction). */
    def graftToTable(mapping: GraftMapping): DataFrame =
      Transformer.toTable(df, mapping)

    /** Append the class's derived properties (entity space). */
    def graftWithDerivations(model: GraftModel, className: String): DataFrame =
      Transformer.withDerivations(df, model, className)
  }
}
