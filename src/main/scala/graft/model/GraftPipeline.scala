package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The full model-driven pipeline (SURVEY §2.1, M11; reference:
  * LegendSparkTest.scala:42-72): READ (schema-enforced) → TRANSFORM
  * (entity→table renames) → VALIDATE (violations column) → DERIVE
  * (derived columns) → WRITE (governed table).
  *
  * Each stage is a pure `DataFrame => DataFrame` built from the model, so
  * the whole pipeline is one Catalyst plan: schema pruning, pushdown and
  * codegen see through every stage. Nothing here collects to the driver.
  */
final case class GraftPipeline(model: GraftModel, mappingName: String) {

  private val mapping = model.mapping(mappingName)

  /** Entity schema for schema-enforced reads of raw (entity-space) data. */
  def entitySchema: org.apache.spark.sql.types.StructType =
    SchemaGen.schemaOf(model, mapping.entity)

  /** Read raw entity-space records (e.g. JSON) with the model schema. */
  def read(spark: SparkSession, format: String, path: String): DataFrame =
    spark.read.format(format).schema(entitySchema).load(path)

  /** Entity space → table space. */
  def transform(df: DataFrame): DataFrame = Transformer.toTable(df, mapping)

  /** Table space → entity space (lift an existing table into the model). */
  def lift(df: DataFrame): DataFrame = Transformer.toEntity(df, mapping)

  /** Validate in table space: appends the violations array column. */
  def validate(df: DataFrame, colName: String = Validator.ViolationColumn): DataFrame =
    Validator.validate(df, Expectations.forMapping(model, mappingName), colName)

  /** Append derived columns (table space). */
  def derive(df: DataFrame): DataFrame =
    df.withColumns(Transformer.derivationsForMapping(model, mappingName)
      .map { case (n, sql) => n -> expr(sql) }.toMap)

  /** Clean rows only (every expectation TRUE) — single conjunctive filter
    * so eligible predicates push to the scan. */
  def clean(df: DataFrame): DataFrame =
    Validator.clean(df, Expectations.forMapping(model, mappingName))

  /** READ → TRANSFORM → VALIDATE → DERIVE in one plan (no write). */
  def run(spark: SparkSession, format: String, path: String): DataFrame =
    derive(validate(transform(read(spark, format, path))))

  /** Create the governed table and append the (table-space) rows. */
  def write(df: DataFrame, format: String = "parquet",
            location: Option[String] = None): Unit = {
    val spark = df.sparkSession
    TableGen.create(spark, model, mappingName, format, location)
    TableGen.write(df, model, mappingName)
  }
}
