package graft.model

import org.apache.spark.sql.types.{StructField, StructType}

/** Schema drift detection (governance): compares the model-derived
  * schema against a table's actual schema and reports every divergence.
  * The reference ecosystem treats the model as the contract; this is
  * the enforcement half — run it before writes (or on a schedule) to
  * catch silent upstream schema changes before they corrupt a governed
  * table. Pure metadata — no data scan. */
object SchemaDiff {

  sealed trait Kind
  case object MissingColumn extends Kind       // in model, not in table
  case object UnexpectedColumn extends Kind    // in table, not in model
  case object TypeMismatch extends Kind
  case object NullabilityWeakened extends Kind // model requires non-null, table allows null

  final case class Drift(field: String, kind: Kind, expected: String, actual: String)

  def diff(expected: StructType, actual: StructType): Seq[Drift] = {
    val act = actual.fields.map(f => f.name -> f).toMap
    val exp = expected.fields.map(f => f.name -> f).toMap
    val missing = expected.fields.collect {
      case f if !act.contains(f.name) =>
        Drift(f.name, MissingColumn, f.dataType.simpleString, "-")
    }
    val unexpected = actual.fields.collect {
      case f if !exp.contains(f.name) =>
        Drift(f.name, UnexpectedColumn, "-", f.dataType.simpleString)
    }
    val changed = expected.fields.flatMap { e =>
      act.get(e.name).toSeq.flatMap { a =>
        val types =
          if (e.dataType != a.dataType)
            Seq(Drift(e.name, TypeMismatch, e.dataType.simpleString, a.dataType.simpleString))
          else Nil
        val nulls =
          if (!e.nullable && a.nullable)
            Seq(Drift(e.name, NullabilityWeakened, "not null", "nullable"))
          else Nil
        types ++ nulls
      }
    }
    missing ++ unexpected ++ changed
  }

  /** Drift of a physical table vs its mapping's model schema. */
  def forMapping(model: GraftModel, mappingName: String, actual: StructType): Seq[Drift] =
    diff(SchemaGen.schemaOfMapping(model, mappingName), actual)

  /** True when the table can safely serve the model's contract. */
  def conforms(model: GraftModel, mappingName: String, actual: StructType): Boolean =
    forMapping(model, mappingName, actual)
      .forall(d => d.kind == UnexpectedColumn || d.kind == NullabilityWeakened)
}
