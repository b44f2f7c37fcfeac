package graft.model

import org.apache.spark.sql.types._

/** Model → Spark `StructType` (SURVEY §2.1, M2).
  *
  * Behaviour pinned by the reference (Legend.scala:433-502, verified by
  * LegendEntityTest.scala:75-88):
  * - superType properties come first, recursively;
  * - `[0..1]` → nullable scalar, `[1]` → non-nullable scalar,
  *   upper bound > 1 or `*` → ArrayType (nullable iff lower bound 0);
  * - enumeration-typed properties become StringType;
  * - class-typed properties become nested StructType (array-of-struct
  *   for collections);
  * - `doc` strings land in column metadata under the `comment` key
  *   (what SHOW COLUMNS / DESCRIBE surfaces on a real catalog).
  */
object SchemaGen {

  /** Primitive model types → Spark types. Same public mapping as the
    * reference (LegendEntityTest.scala:30-47). */
  def primitive(name: String): DataType = name match {
    case "String"     => StringType
    case "Boolean"    => BooleanType
    case "Binary"     => BinaryType
    case "Integer"    => IntegerType
    case "Number"     => LongType
    case "Float"      => FloatType
    case "Decimal"    => DoubleType
    case "Date"       => DateType
    case "StrictDate" => DateType
    case "DateTime"   => TimestampType
    case other        => throw new IllegalArgumentException(s"unsupported data type [$other]")
  }

  /** Spark schema for an entity (class) in the model. */
  def schemaOf(model: GraftModel, className: String): StructType =
    StructType(model.allProperties(className).map(field(model, _)))

  /** Spark schema for a mapping: the entity schema with fields renamed to
    * their table columns (reference: getMappingSchema, Legend.scala:272-279).
    * EMBEDDED fields (a nested class mapped to dotted paths —
    * "address.city" → addr_city) flatten to one column per leaf: the
    * table physically holds flat columns, so the mapping schema does
    * too. A leaf under a nullable embedded property is nullable even if
    * the leaf itself is mandatory (absent parent ⇒ NULL leaf columns). */
  def schemaOfMapping(model: GraftModel, mappingName: String): StructType = {
    val m = model.mapping(mappingName)
    def flatten(props: Seq[GraftProperty], prefix: String,
                forcedNullable: Boolean): Seq[StructField] =
      props.flatMap { p =>
        val path = if (prefix.isEmpty) p.name else s"$prefix.${p.name}"
        m.fields.get(path) match {
          case Some(col) =>
            val f = field(model, p)
            Seq(f.copy(name = col, nullable = f.nullable || forcedNullable))
          case None =>
            model.classes.get(p.dataType) match {
              case Some(nc) if p.isReference && !p.multiplicity.isCollection &&
                  m.fields.keys.exists(_.startsWith(path + ".")) =>
                flatten(model.allProperties(nc.name), path,
                  forcedNullable || p.multiplicity.isNullable)
              case _ => throw new IllegalArgumentException(
                s"mapping [${m.name}] has no column for field [$path]")
            }
        }
      }
    StructType(flatten(model.allProperties(m.entity), "", forcedNullable = false))
  }

  private def field(model: GraftModel, p: GraftProperty): StructField = {
    val (dataType, doc) =
      if (p.isReference) {
        model.classes.get(p.dataType) match {
          case Some(nested) =>
            val nestedSchema = StructType(model.allProperties(nested.name).map(field(model, _)))
            // property doc wins; fall back to the nested class's own doc
            (nestedSchema: DataType, p.doc.orElse(nested.doc))
          case None =>
            val e = model.enum(p.dataType) // throws if neither class nor enum
            (StringType: DataType, p.doc.orElse(e.doc))
        }
      } else (primitive(p.dataType), p.doc)

    val finalType = if (p.multiplicity.isCollection) ArrayType(dataType) else dataType
    val metadata = doc.fold(Metadata.empty) { d =>
      new MetadataBuilder().putString("comment", d).build()
    }
    StructField(p.name, finalType, p.multiplicity.isNullable, metadata)
  }
}
