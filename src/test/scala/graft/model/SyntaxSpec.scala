package graft.model

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The implicit DataFrame syntax (reference package.scala:27-51 parity):
  * same observable behaviour as `legendTransform`/`legendValidate`, but
  * delegating to graft's codegen-native engine objects. */
class SyntaxSpec extends SparkTestBase {

  import spark.implicits._
  import syntax._

  lazy val model: GraftModel = ModelQueries.model
  lazy val mapping: GraftMapping = model.mapping(ModelQueries.CustomerMapping)

  test("graftTransform renames like the reference's legendTransform") {
    val df = Seq((1L, "ann")).toDF("id", "name")
    val out = df.graftTransform(Map("id" -> "c_id", "name" -> "c_name"))
    assert(out.columns.toSeq == Seq("c_id", "c_name"))
    // missing source columns are a no-op, matching withColumnRenamed
    assert(df.graftTransform(Map("nope" -> "x")).columns.toSeq == Seq("id", "name"))
  }

  test("graftValidate(Map) appends violated-rule names, empty array when clean") {
    val df = Seq((1L, 10.0), (2L, -5.0), (3L, 0.0)).toDF("id", "bal")
    val out = df.graftValidate(Map(
      "bal positive" -> "bal > 0",
      "bal not huge" -> "bal < 1000")).as[(Long, Double, Seq[String])].collect()
      .map(r => r._1 -> r._3).toMap
    assert(out(1L) == Seq.empty)
    assert(out(2L) == Seq("bal positive"))
    assert(out(3L) == Seq("bal positive"))
    // custom column name (reference's colName parameter)
    val named = df.graftValidate(Map("p" -> "bal > 0"), colName = "violations")
    assert(named.columns.contains("violations"))
  }

  test("graftValidate/graftClean/graftQuarantine by mapping partition the table") {
    val raw = graft.Tables(spark, sfDir, "customer")
    val total = raw.count()
    val validated = raw.graftValidate(model, ModelQueries.CustomerMapping)
    assert(validated.columns.contains(Validator.ViolationColumn))
    val clean = raw.graftClean(model, ModelQueries.CustomerMapping).count()
    val dirty = raw.graftQuarantine(model, ModelQueries.CustomerMapping).count()
    assert(clean + dirty == total, s"$clean + $dirty != $total")
    assert(clean ==
      validated.filter(size(col(Validator.ViolationColumn)) === 0).count())
  }

  test("graftToEntity/graftToTable round-trip through the mapping") {
    val raw = graft.Tables(spark, sfDir, "customer")
    val entity = raw.graftToEntity(mapping)
    val entityCols = entity.columns.toSet
    assert(model.allProperties(mapping.entity).map(_.name).toSet.subsetOf(entityCols))
    val back = entity.graftToTable(mapping)
    // enum-translated columns keep entity values; names must round-trip
    assert(back.columns.toSet == raw.columns.toSet)
  }

  test("graftWithDerivations appends the class's derived properties") {
    val entity = graft.Tables(spark, sfDir, "customer").graftToEntity(mapping)
    val out = entity.graftWithDerivations(model, mapping.entity)
    val derived = model.allDerivations(mapping.entity).map(_.name)
    assert(derived.nonEmpty && derived.forall(out.columns.contains))
  }
}
