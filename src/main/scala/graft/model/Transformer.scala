package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mapping transformations and derivations (SURVEY §2.1, M6+M7).
  *
  * - Renames between entity space (field names) and table space (column
  *   names), both directions (reference: legendTransform,
  *   package.scala:29-31 — entity→table only; graft adds the inverse so
  *   raw tables can be lifted into entity space).
  * - Derived columns from the model's derivation expressions (reference:
  *   qualified properties compiled to SQL, Legend.scala:254-270,355-369).
  *
  * Renames are a single projection (`withColumnsRenamed`), not N chained
  * ones; derivations are `expr()` columns so they resolve and codegen
  * like any other expression.
  */
object Transformer {

  /** Entity-space df → table columns (write direction). */
  def toTable(df: DataFrame, mapping: GraftMapping): DataFrame =
    df.withColumnsRenamed(mapping.fields)

  /** Table-space df → entity fields (read direction). Enum-mapped
    * columns translate source codes to enum values first (one CASE per
    * such column — stays in codegen), then everything renames in a
    * single projection. */
  def toEntity(df: DataFrame, mapping: GraftMapping): DataFrame = {
    val translated = mapping.enumFields.keys.flatMap { field =>
      mapping.enumExpr(field).map(mapping.fields.getOrElse(field, field) -> expr(_))
    }.toMap
    val base = if (translated.isEmpty) df else df.withColumns(translated)
    base.withColumnsRenamed(mapping.inverse)
  }

  /** Append all of a class's derived properties (entity space). */
  def withDerivations(df: DataFrame, model: GraftModel, className: String): DataFrame = {
    val derivations = model.allDerivations(className)
    df.withColumns(derivations.map(d => d.name -> expr(d.expr)).toMap)
  }

  /** Derivations compiled to table space through a mapping:
    * (name, compiled SQL) pairs, e.g. for inclusion in generated SQL.
    * Deduped by name, last definition wins — a subclass that redeclares
    * a superclass derivation (the reference corpus's employee repeats
    * person's `age`/`initials`) yields ONE column, not duplicates. */
  def derivationsForMapping(model: GraftModel, mappingName: String): Seq[(String, String)] = {
    val subs = model.tableSubstitutions(mappingName)
    val m = model.mapping(mappingName)
    // tableSubstitutions' fold already keeps the LAST definition per
    // name — distinct names looked up there give the deduped set
    model.allDerivations(m.entity).map(_.name).distinct.map(n => n -> subs(n))
  }
}
