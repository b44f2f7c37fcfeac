package graft.model

import graft.SparkTestBase
import graft.model.legend.LegendLoader
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.time.LocalDate

/** The Legend loader proven on the reference's REAL entity corpus
  * (SURVEY §2.1 M13) — the Apache-2.0 fixture set the reference's own
  * tests load (reference: LegendFileLoader.scala:1-30 over
  * src/test/resources/entities/databricks), vendored verbatim under
  * src/test/resources/entities/databricks (the connection entity is
  * omitted: it names a live host and the loader skips connections
  * anyway — runtime/table entities cover the skip path).
  *
  * Covers exactly what hand-authored fixtures could not: person→employee
  * inheritance, the `sme` Enumeration with its enumeration property
  * mapping (`enumMappingId` + `stringSourceValue`), constraints over
  * DERIVED properties (`[hiringAge] should be > 18`), derived properties
  * redeclared by the subclass (age/initials appear on both person and
  * employee), service aliases with spaces ("Hiring Age"), and both real
  * services (filter→project→sort→take and groupBy/agg).
  *
  * Observable semantics pinned against the reference's own assertions:
  * - transformations map (LegendEntityTest.scala:170-176)
  * - dateDiff YEARS → year(b) - year(a) (LegendEntityTest.scala:190-199)
  * - substring passthrough + string plus → concat (ibid.)
  * - validation failure set {[id], [sme], [hiringAge]}
  *   (LegendSparkTest.scala:64-72)
  */
class LegendRealCorpusSpec extends SparkTestBase {
  import spark.implicits._

  private val dir = "src/test/resources/entities/databricks"
  private lazy val model = LegendLoader.fromDirectory(dir)
  private val Mapping = "databricks::mapping::employee_delta"
  private val thisYear = LocalDate.now().getYear

  /** Raw table-space rows; planted violations mirror the reference's
    * test data shape: one missing id, one unmapped sme code "C", one
    * employee who joined at 17 ([hiringAge] constraint). */
  private def rawRows = Seq(
    (Some(1), "Georges", "Jotcham", "1973-11-26", Some("F"), Some("Scala"), "2020-09-14", Some(229)),
    (Some(2), "Greta", "Stone", "1988-04-02", Some("F"), Some("Python"), "2015-06-01", Some(310)),
    (Some(3), "Maria", "OGorman", "1987-08-14", Some("M"), Some("Python"), "2017-03-03", Some(299)),
    (None, "Levey", "Storck", "1989-02-19", Some("M"), Some("Python"), "2015-12-05", Some(282)),
    (Some(5), "Ross", "Bernhard", "1988-12-25", Some("F"), Some("C"), "2017-03-13", Some(243)),
    (Some(6), "Trueman", "Keirle", "1999-12-10", Some("M"), Some("Scala"), "2016-01-27", Some(50)),
    (Some(7), "Star", "Akred", "1987-07-28", None, Some("Scala"), "2017-07-17", Some(169)),
    (Some(8), "Gina", "Calverley", "1979-07-15", Some("N"), Some("SQL"), "2021-06-03", Some(69)))
    .toDF("id", "first_name", "last_name", "birth_date", "gender", "sme", "joined_date", "high_fives")
    .withColumn("birth_date", to_date(col("birth_date")))
    .withColumn("joined_date", to_date(col("joined_date")))

  test("real corpus: classpath loader yields the same model as the file loader") {
    // the vendored corpus is on the test classpath — the deployment
    // shape where entities ship inside the application jar
    val cp = LegendLoader.fromResources("/entities/databricks")
    assert(cp.entityNames == model.entityNames)
    assert(cp.mapping(Mapping).fields == model.mapping(Mapping).fields)
    assert(cp.clazz("databricks::entity::employee").constraints ==
      model.clazz("databricks::entity::employee").constraints)
  }

  test("real corpus: loads all model entities, skips runtime/table definitions") {
    assert(model.classes.keySet ==
      Set("databricks::entity::person", "databricks::entity::employee"))
    assert(model.enum("databricks::entity::sme").values ==
      Seq("Scala", "Python", "Java", "R", "SQL"))
    assert(model.mappings.keySet == Set(Mapping))
    assert(model.services.keySet ==
      Set("databricks::service::employee", "databricks::service::skills"))
  }

  test("real corpus: inheritance resolves person properties first; schema matches") {
    assert(model.allProperties("databricks::entity::employee").map(_.name) ==
      Seq("firstName", "lastName", "birthDate", "gender", "id", "sme", "joinedDate", "highFives"))
    val s = SchemaGen.schemaOf(model, "databricks::entity::employee")
    assert(s("firstName").dataType == StringType && !s("firstName").nullable)
    assert(s("gender").nullable && s("sme").dataType == StringType && s("sme").nullable)
    assert(s("birthDate").dataType == DateType)
    assert(s("id").dataType == IntegerType && !s("id").nullable)
    assert(s("highFives").dataType == IntegerType && s("highFives").nullable)
  }

  test("real corpus: transformations match the reference's pinned map") {
    val m = model.mapping(Mapping)
    assert(m.table == "legend.employee")
    // reference: LegendEntityTest.scala:170-176
    assert(m.fields == Map(
      "highFives" -> "high_fives", "joinedDate" -> "joined_date",
      "lastName" -> "last_name", "firstName" -> "first_name",
      "birthDate" -> "birth_date", "id" -> "id", "sme" -> "sme",
      "gender" -> "gender"))
    // the enumeration property mapping is parsed, not dropped; all
    // pairs are identity so the translating CASE is elided
    assert(m.enumFields("sme").toMap ==
      Map("Scala" -> "Scala", "Python" -> "Python", "Java" -> "Java", "R" -> "R", "SQL" -> "SQL"))
    assert(m.enumExpr("sme").isEmpty)
  }

  test("real corpus: derivations compile and evaluate (dateDiff/substring/plus semantics)") {
    val derivs = Transformer.derivationsForMapping(model, Mapping).toMap
    // subclass redeclarations dedupe: exactly the reference's three
    assert(derivs.keySet == Set("hiringAge", "age", "initials"))
    val out = rawRows.select(col("id"),
        expr(derivs("hiringAge")).as("hiringAge"),
        expr(derivs("age")).as("age"),
        expr(derivs("initials")).as("initials"))
      .where(col("id").isin(1, 6))
      .collect().map(r => r.getInt(0) -> (r.getInt(1), r.getInt(2), r.getString(3))).toMap
    assert(out(1) == ((47, thisYear - 1973, "GJ"))) // year diffs, 1-char initials
    assert(out(6) == ((17, thisYear - 1999, "TK")))
  }

  test("real corpus: validation flags exactly the reference's failure set") {
    val rules = Expectations.forMapping(model, Mapping)
    // the derived-property constraint is inlined to raw columns
    val byName = rules.toMap
    assert(byName("[hiringAge] should be > 18").contains("joined_date"))
    val failed = Validator.validate(rawRows, rules)
      .select(explode(col(Validator.ViolationColumn)).as("v"))
      .collect().map(_.getString(0).split(" ").head).toSet
    // reference: LegendSparkTest.scala:71
    assert(failed == Set("[id]", "[sme]", "[hiringAge]"))
  }

  /** (Re)create the catalog table the mapping points at. The session
    * catalog is in-memory, so a previous JVM's warehouse dir can
    * outlive its table entry — clear both. */
  private def writeEmployeeTable(): Unit = {
    spark.sql("CREATE DATABASE IF NOT EXISTS legend")
    spark.sql("DROP TABLE IF EXISTS legend.employee")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir") + "/legend.db/employee")
    loc.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(loc, true)
    rawRows.write.saveAsTable("legend.employee")
  }

  test("real corpus: employee service (filter→project→sort→take) runs end-to-end") {
    writeEmployeeTable()

    val sql = ServiceGen.serviceSql(model, "databricks::service::employee")
    assert(sql.contains("`Hiring Age`")) // spaced alias is quoted
    val out = ServiceGen.runService(spark, model, "databricks::service::employee")
    assert(out.columns.toSeq ==
      Seq("FirstName", "LastName", "HighFives", "Age", "Hiring Age", "Sme", "Initials"))
    val rows = out.collect().map(r =>
      (r.getString(0), r.getInt(2), r.getInt(3), r.getInt(4), r.getString(5), r.getString(6)))
    assert(rows.toSeq == Seq(
      ("Greta", 310, thisYear - 1988, 27, "Python", "GS"),
      ("Georges", 229, thisYear - 1973, 47, "Scala", "GJ"),
      ("Gina", 69, thisYear - 1979, 42, "SQL", "GC")))
  }

  test("real corpus: governed mapping read (generateSql parity) filters to clean rows") {
    writeEmployeeTable()
    // the reference's generateSql shape: every mapped column projected
    // under its entity name, derivations appended, expectations in
    // WHERE (LegendEntityTest.scala:200-227)
    val sql = ServiceGen.mappingSql(model, Mapping)
    assert(sql.contains("first_name AS firstName") && sql.contains("WHERE"))
    assert(sql.contains("AS hiringAge") && sql.contains("AS initials"))
    val out = ServiceGen.runMapping(spark, model, Mapping)
    // planted violations ([id] null, sme 'C', hiringAge 17) are
    // filtered: 8 raw rows -> 5 clean (the null-GENDER row survives —
    // gender is [0..1], nullable by multiplicity)
    assert(out.select("id").as[Int].collect().toSet == Set(1, 2, 3, 7, 8))
    // derivations ride along in entity space
    assert(out.filter(col("id") === 1).select("initials").as[String].head() == "GJ")
  }

  test("real corpus: skills service (groupBy/agg) runs end-to-end") {
    writeEmployeeTable()

    val out = ServiceGen.runService(spark, model, "databricks::service::skills")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    // null-gender row excluded by not(isEmpty); count(id) skips the
    // null-id row; ordered by avg high-fives desc
    assert(out.toSeq == Seq(
      ("F", (229.0 + 310 + 243) / 3, 3L),
      ("M", (299.0 + 282 + 50) / 3, 2L),
      ("N", 69.0, 1L)))
  }

  test("real corpus: non-identity enum mappings translate through the CASE path") {
    // same mapping, but the warehouse stores short codes: exercise the
    // translation the identity corpus elides
    val mappingJson = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$dir/mapping/employee_delta.json"))
    def recode(json: String, from: String, to: String): String = json.replaceAll(
      "(\"_type\" : \"stringSourceValue\",\\s*\"value\" : )\"" + from + "\"",
      "$1\"" + to + "\"")
    val coded = recode(recode(mappingJson, "Scala", "S"), "Python", "P")
    assert(coded != mappingJson, "fixture surgery must hit the sourceValues")
    val others = Seq("entity/person.json", "entity/employee.json", "entity/sme.json")
      .map(f => java.nio.file.Files.readString(java.nio.file.Paths.get(s"$dir/$f")))
    val m2 = LegendLoader.fromJsonStrings(others :+ coded).mapping(Mapping)

    assert(m2.enumExpr("sme").exists(_.contains("CASE")))
    val entity = Transformer.toEntity(
      Seq(("S", 1), ("P", 2), ("Java", 3), ("C", 4)).toDF("sme", "id"), m2)
    val got = entity.select("id", "sme").collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    // mapped codes translate; already-enum and unmapped values pass
    // through raw (the domain expectation catches "C", not a silent null)
    assert(got == Map(1 -> "Scala", 2 -> "Python", 3 -> "Java", 4 -> "C"))
    val domain = Expectations.forMapping(
      LegendLoader.fromJsonStrings(others :+ coded), Mapping).toMap.apply("[sme] not allowed value")
    assert(domain.contains("CASE") && domain.contains("'Scala'"))
  }

  test("real corpus: unsupported mapping constructs fail loudly at load") {
    val mappingJson = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$dir/mapping/employee_delta.json"))
    val unknownId = mappingJson.replace(
      "\"enumMappingId\" : \"databricks_entity_sme\"",
      "\"enumMappingId\" : \"no_such_enum_mapping\"")
    assert(unknownId != mappingJson)
    val e1 = intercept[IllegalArgumentException] {
      LegendLoader.fromJsonStrings(Seq(unknownId))
    }
    assert(e1.getMessage.contains("no_such_enum_mapping"))

    // embedded mappings are supported since round 7 — but a malformed one
    // (no nested classMapping) still fails loudly, naming the property
    val embedded = mappingJson.replaceFirst(
      "\"_type\" : \"relationalPropertyMapping\"",
      "\"_type\" : \"embeddedPropertyMapping\"")
    val e2 = intercept[IllegalArgumentException] {
      LegendLoader.fromJsonStrings(Seq(embedded))
    }
    assert(e2.getMessage.contains("empty classMapping"))

    // genuinely unsupported property-mapping types still reject by name
    val otherwise = mappingJson.replaceFirst(
      "\"_type\" : \"relationalPropertyMapping\"",
      "\"_type\" : \"otherwisePropertyMapping\"")
    val e3 = intercept[IllegalArgumentException] {
      LegendLoader.fromJsonStrings(Seq(otherwise))
    }
    assert(e3.getMessage.contains("otherwisePropertyMapping"))
  }
}
