package graft.model

import graft.SparkTestBase
import graft.model.legend.LegendLoader
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Legend entity-protocol interchange (SURVEY §2.1 M13).
  *
  * Fixtures below are hand-authored in the public Legend entity-protocol
  * JSON format (`{classifierPath, content}` with PURE lambda ASTs) — the
  * same format the reference loads from its entity directories — and
  * exercise classes with inheritance + constraints + qualified
  * properties, an enumeration, a relational mapping, and two services
  * (project and groupBy pipelines). End-to-end: load → schema →
  * expectations → validate → derive → service SQL → run.
  */
class LegendSpec extends SparkTestBase {

  // --- tiny protocol-JSON builders (keep the fixtures readable) ---
  private def mult(lo: Int, hi: Option[Int] = Some(1)): String =
    hi.fold(s"""{"lowerBound":$lo}""")(u => s"""{"lowerBound":$lo,"upperBound":$u}""")
  private def prop(name: String, tpe: String, lo: Int = 1): String =
    s"""{"name":"$name","type":"$tpe","multiplicity":${mult(lo)}}"""
  private def pvar(n: String) = s"""{"_type":"var","name":"$n"}"""
  private def pprop(recv: String, name: String) =
    s"""{"_type":"property","property":"$name","parameters":[$recv]}"""
  private def thisProp(name: String) = pprop(pvar("this"), name)
  private def func(f: String, ps: String*) =
    s"""{"_type":"func","function":"$f","parameters":[${ps.mkString(",")}]}"""
  private def lit(t: String, v: String) =
    s"""{"_type":"$t","multiplicity":${mult(1)},"values":[$v]}"""
  private def lambda(body: String, params: String*) =
    s"""{"_type":"lambda","body":[$body],"parameters":[${params.map(pvar).mkString(",")}]}"""
  private def coll(vs: String*) =
    s"""{"_type":"collection","multiplicity":${mult(vs.size)},"values":[${vs.mkString(",")}]}"""
  private def ptr(p: String) = s"""{"_type":"packageableElementPtr","fullPath":"$p"}"""

  private val partyJson =
    s"""{"classifierPath":"meta::pure::metamodel::type::Class","content":{
       |"_type":"class","name":"party","package":"demo::entity","superTypes":[],
       |"constraints":[],"qualifiedProperties":[],
       |"properties":[${prop("name", "String")},${prop("region", "String", lo = 0)}]}}""".stripMargin

  private val segmentJson =
    s"""{"classifierPath":"meta::pure::metamodel::type::Enumeration","content":{
       |"_type":"Enumeration","name":"segment","package":"demo::entity",
       |"values":[{"value":"BUILDING"},{"value":"MACHINERY"},{"value":"AUTOMOBILE"}]}}""".stripMargin

  // constraints: acctBal >= -1000; name startsWith 'C' AND length(name) > 1
  // qualified property: tenureYears = dateDiff(since, until, YEARS)
  private val customerJson =
    s"""{"classifierPath":"meta::pure::metamodel::type::Class","content":{
       |"_type":"class","name":"customer","package":"demo::entity",
       |"superTypes":["demo::entity::party"],
       |"properties":[${prop("custId", "Integer")},${prop("acctBal", "Float")},
       |  ${prop("mktSegment", "demo::entity::segment", lo = 0)},
       |  ${prop("since", "Date")},${prop("until", "Date")}],
       |"constraints":[
       |  {"name":"balance floor","functionDefinition":${lambda(
            func("greaterThanEqual", thisProp("acctBal"), lit("float", "-1000.0")))}},
       |  {"name":"well-named","functionDefinition":${lambda(
            func("and",
              func("startsWith", thisProp("name"), lit("string", "\"C\"")),
              func("greaterThan", func("length", thisProp("name")), lit("integer", "1"))))}}],
       |"qualifiedProperties":[
       |  {"name":"tenureYears","parameters":[],"returnType":"Integer",
       |   "returnMultiplicity":${mult(1)},
       |   "body":[${func("dateDiff", thisProp("since"), thisProp("until"),
            pprop(ptr("DurationUnit"), "YEARS"))}]}]}}""".stripMargin

  private def colOp(c: String) = s"""{"_type":"column","column":"$c","table":{"_type":"Table"}}"""
  private def pm(field: String, column: String) =
    s"""{"_type":"relationalPropertyMapping",
       |"property":{"class":"demo::entity::customer","property":"$field"},
       |"relationalOperation":${colOp(column)}}""".stripMargin

  private val mappingJson =
    s"""{"classifierPath":"meta::pure::mapping::Mapping","content":{
       |"_type":"mapping","name":"customer_rel","package":"demo::mapping",
       |"classMappings":[{"_type":"relational","class":"demo::entity::customer",
       |"mainTable":{"_type":"Table","schema":"default","table":"legend_customer"},
       |"propertyMappings":[${Seq(
          pm("custId", "c_custkey"), pm("name", "c_name"), pm("region", "c_region"),
          pm("acctBal", "c_acctbal"), pm("mktSegment", "c_mktsegment"),
          pm("since", "c_since"), pm("until", "c_until")).mkString(",")}]}]}}""".stripMargin

  // getAll → filter(acctBal > 0) → project([name, acctBal], [Name, Balance])
  //   → sort([desc(Balance)]) → take(2)
  private val serviceJson =
    s"""{"classifierPath":"meta::legend::service::metamodel::Service","content":{
       |"_type":"service","name":"topCustomers","package":"demo::service","pattern":"/top",
       |"execution":{"_type":"pureSingleExecution","mapping":"demo::mapping::customer_rel",
       |"func":${lambda(
          func("take",
            func("sort",
              func("project",
                func("filter",
                  func("getAll", ptr("demo::entity::customer")),
                  lambda(func("greaterThan", pprop(pvar("x"), "acctBal"),
                    lit("float", "0.0")), "x")),
                coll(lambda(pprop(pvar("x"), "name"), "x"),
                     lambda(pprop(pvar("x"), "acctBal"), "x")),
                coll(lit("string", "\"Name\""), lit("string", "\"Balance\""))),
              coll(func("desc", lit("string", "\"Balance\"")))),
            lit("integer", "2")))}}}}""".stripMargin

  // getAll → groupBy([mktSegment], [agg(x|x.acctBal, y|y.average())], [Segment, AvgBal])
  private val groupServiceJson =
    s"""{"classifierPath":"meta::legend::service::metamodel::Service","content":{
       |"_type":"service","name":"segmentBalance","package":"demo::service","pattern":"/seg",
       |"execution":{"_type":"pureSingleExecution","mapping":"demo::mapping::customer_rel",
       |"func":${lambda(
          func("groupBy",
            func("getAll", ptr("demo::entity::customer")),
            coll(lambda(pprop(pvar("x"), "mktSegment"), "x")),
            coll(func("agg",
              lambda(pprop(pvar("x"), "acctBal"), "x"),
              lambda(func("average", pvar("y")), "y"))),
            coll(lit("string", "\"Segment\""), lit("string", "\"AvgBal\""))))}}}}""".stripMargin

  private lazy val model = LegendLoader.fromJsonStrings(
    Seq(partyJson, segmentJson, customerJson, mappingJson, serviceJson, groupServiceJson))

  private def customerRows = {
    import spark.implicits._
    Seq(
      (1L, "Cora", "EUROPE", 120.5, "BUILDING", "2019-03-01", "2024-03-01"),
      (2L, "Cy", "ASIA", -2000.0, "MACHINERY", "2020-01-15", "2024-01-15"), // violates floor
      (3L, "Ada", "EUROPE", 300.0, "BUILDING", "2021-06-01", "2023-05-31"), // violates naming
      (4L, "Cleo", null, 50.0, null, "2022-02-01", "2022-12-01"))
      .toDF("c_custkey", "c_name", "c_region", "c_acctbal", "c_mktsegment", "c_since", "c_until")
      .withColumn("c_since", to_date(col("c_since")))
      .withColumn("c_until", to_date(col("c_until")))
  }

  test("M13: loads classes, enums, mappings, services; resolves inheritance") {
    assert(model.classes.keySet ==
      Set("demo::entity::party", "demo::entity::customer"))
    assert(model.enum("demo::entity::segment").values ==
      Seq("BUILDING", "MACHINERY", "AUTOMOBILE"))
    assert(model.mapping("demo::mapping::customer_rel").table == "legend_customer")
    // inherited properties come first, as in the reference's resolution
    assert(model.allProperties("demo::entity::customer").map(_.name) ==
      Seq("name", "region", "custId", "acctBal", "mktSegment", "since", "until"))
  }

  test("M13: PURE constraint lambdas translate to parseable entity-space SQL") {
    val byName = model.clazz("demo::entity::customer").constraints
      .map(k => k.name -> k.expr).toMap
    assert(byName("balance floor") == "(acctBal >= -1000.0)")
    assert(byName("well-named") == "(startswith(name, 'C') AND (length(name) > 1))")
    // every expectation (technical + enum-domain + business) compiles
    val compiled = Expectations.compiledForClass(model, "demo::entity::customer")
    assert(compiled.nonEmpty && compiled.values.forall(_.isSuccess),
      compiled.filter(_._2.isFailure).keys.mkString(", "))
  }

  test("M13: schema generation maps Legend primitives and enum refs") {
    val s = SchemaGen.schemaOf(model, "demo::entity::customer")
    assert(s("custId").dataType == LongType || s("custId").dataType == IntegerType)
    assert(s("acctBal").dataType == FloatType) // reference maps Float the same way
    assert(s("mktSegment").dataType == StringType) // enum ref → string domain
    assert(s("since").dataType == DateType)
    assert(s("name").nullable == false && s("region").nullable == true)
  }

  test("M13: validation flags exactly the planted violations") {
    val entity = Transformer.toEntity(customerRows,
      model.mapping("demo::mapping::customer_rel"))
    val rules = Expectations.forClass(model, "demo::entity::customer")
    val bad = Validator.validate(entity, rules)
      .select(col("custId"), explode(col("graft_violations")).as("v"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(bad == Set((2L, "balance floor"), (3L, "well-named")))
  }

  test("M13: qualified property (dateDiff YEARS) derives correctly") {
    val entity = Transformer.toEntity(customerRows,
      model.mapping("demo::mapping::customer_rel"))
    val derived = Transformer.withDerivations(entity, model, "demo::entity::customer")
      .select(col("custId"), col("tenureYears"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // calendar-year difference (year(b) - year(a)), the semantics the
    // Legend engine pins (LegendEntityTest.scala:194)
    assert(derived == Map(1L -> 5, 2L -> 4, 3L -> 2, 4L -> 0))
  }

  test("M13: project service compiles and runs (filter → project → sort → take)") {
    customerRows.createOrReplaceTempView("legend_customer")
    val sql = ServiceGen.serviceSql(model, "demo::service::topCustomers")
    assert(sql.contains("c_acctbal") && sql.toUpperCase.contains("ORDER BY"))
    val rows = ServiceGen.runService(spark, model, "demo::service::topCustomers")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(rows == Seq(("Ada", 300.0), ("Cora", 120.5))) // balance desc, top 2
  }

  test("M13: extended PURE function coverage renders correct, parseable SQL") {
    import graft.model.legend.PureExpr._
    import graft.model.legend.PureToSql
    def p(n: String) = PProperty(PVar("this"), n)
    def unit(u: String) = PProperty(PPtr("DurationUnit"), u)
    val cases: Seq[(graft.model.legend.PureExpr, String)] = Seq(
      PFunc("minus", Seq(p("x"))) -> "(- x)",
      PFunc("minus", Seq(p("x"), p("y"))) -> "(x - y)",
      PFunc("size", Seq(p("tags"))) -> "size(tags)",
      PFunc("count", Seq(p("tags"))) -> "size(tags)",
      PFunc("matches", Seq(p("name"), PLit("'^C.*'"))) -> "(name RLIKE '^C.*')",
      PFunc("parseInteger", Seq(p("s"))) -> "CAST(s AS BIGINT)",
      PFunc("firstDayOfMonth", Seq(p("d"))) -> "trunc(d, 'MM')",
      PFunc("adjust", Seq(p("d"), PLit("3"), unit("MONTHS"))) -> "add_months(d, 3)",
      PFunc("adjust", Seq(p("d"), PLit("2"), unit("YEARS"))) -> "add_months(d, (2) * 12)",
      PFunc("if", Seq(PFunc("isEmpty", Seq(p("a"))), PLambda(Nil, PLit("0")),
        PLambda(Nil, p("a")))) -> "(CASE WHEN (a IS NULL) THEN 0 ELSE a END)",
      PFunc("replace", Seq(p("s"), PLit("'a'"), PLit("'b'"))) -> "replace(s, 'a', 'b')",
      PFunc("left", Seq(p("s"), PLit("3"))) -> "left(s, 3)",
      PFunc("right", Seq(p("s"), PLit("3"))) -> "right(s, 3)",
      PFunc("indexOf", Seq(p("s"), PLit("'x'"))) -> "(instr(s, 'x') - 1)",
      PFunc("pow", Seq(p("x"), PLit("2"))) -> "power(x, 2)",
      PFunc("log", Seq(p("x"))) -> "ln(x)",
      PFunc("hour", Seq(p("ts"))) -> "hour(ts)",
      PFunc("minute", Seq(p("ts"))) -> "minute(ts)",
      PFunc("second", Seq(p("ts"))) -> "second(ts)",
      PFunc("dayOfWeekNumber", Seq(p("d"))) -> "(((dayofweek(d) + 5) % 7) + 1)",
      // string plus resolves to concat; numeric plus stays arithmetic
      PFunc("plus", Seq(PCollection(Seq(PFunc("toUpper", Seq(p("a"))), PLit("'-'"), p("b")))))
        -> "concat(upper(a), '-', b)",
      PFunc("plus", Seq(PCollection(Seq(p("a"), p("b"))))) -> "(a + b)",
      // collection HOFs: the PURE lambda variable becomes the SQL lambda
      // parameter under a collision-free graft_ rename (Spark lambda
      // bindings shadow outer attributes); bare $t is the element,
      // $t.f is struct-element access
      PFunc("forAll", Seq(p("tags"), PLambda(Seq("t"),
        PFunc("greaterThan", Seq(PFunc("length", Seq(PVar("t"))), PLit("0"))))))
        -> "forall(tags, graft_t -> (length(graft_t) > 0))",
      PFunc("exists", Seq(p("tags"), PLambda(Seq("t"),
        PFunc("equal", Seq(PVar("t"), PLit("'x'"))))))
        -> "exists(tags, graft_t -> (graft_t = 'x'))",
      PFunc("filter", Seq(p("nums"), PLambda(Seq("n"),
        PFunc("greaterThan", Seq(PVar("n"), PLit("10"))))))
        -> "filter(nums, graft_n -> (graft_n > 10))",
      PFunc("map", Seq(p("items"), PLambda(Seq("i"), PProperty(PVar("i"), "qty"))))
        -> "transform(items, graft_i -> graft_i.qty)",
      // nested: size of a filtered collection
      PFunc("size", Seq(PFunc("filter", Seq(p("nums"), PLambda(Seq("n"),
        PFunc("lessThan", Seq(PVar("n"), PLit("0"))))))))
        -> "size(filter(nums, graft_n -> (graft_n < 0)))",
      // a lambda parameter colliding with a PROPERTY the body references
      // must not capture it: $this.n renders bare `n`, which a SQL
      // parameter named `n` would have silently shadowed (ADVICE r8)
      PFunc("exists", Seq(p("tags"), PLambda(Seq("n"),
        PFunc("equal", Seq(PVar("n"), p("n"))))))
        -> "exists(tags, graft_n -> (graft_n = n))",
      // ...re-prefixing until free when graft_n is itself a property
      PFunc("exists", Seq(p("tags"), PLambda(Seq("n"),
        PFunc("equal", Seq(PVar("n"), p("graft_n"))))))
        -> "exists(tags, graft_graft_n -> (graft_graft_n = graft_n))",
      // round-8 widening: math/string/collection/date additions
      PFunc("mod", Seq(p("a"), p("b"))) -> "pmod(a, b)",
      PFunc("rem", Seq(p("a"), p("b"))) -> "mod(a, b)",
      PFunc("max", Seq(PCollection(Seq(p("a"), p("b"), p("c"))))) -> "greatest(a, b, c)",
      PFunc("min", Seq(p("a"), p("b"))) -> "least(a, b)",
      PFunc("ltrim", Seq(p("s"))) -> "ltrim(s)",
      PFunc("rtrim", Seq(p("s"))) -> "rtrim(s)",
      PFunc("reverseString", Seq(p("s"))) -> "reverse(s)",
      PFunc("at", Seq(p("tags"), PLit("0"))) ->
        ("if(0 >= 0 AND 0 < size(tags), element_at(tags, 0 + 1), " +
          "raise_error(concat('at(): index ', cast(0 as string), ' out of bounds')))"),
      PFunc("first", Seq(p("tags"))) -> "try_element_at(tags, 1)",
      PFunc("last", Seq(p("tags"))) -> "try_element_at(tags, -1)",
      PFunc("removeDuplicates", Seq(p("tags"))) -> "array_distinct(tags)",
      PFunc("toOne", Seq(p("nick"))) -> "nick",
      PFunc("quarterNumber", Seq(p("d"))) -> "quarter(d)",
      PFunc("weekOfYear", Seq(p("d"))) -> "weekofyear(d)",
      PFunc("datePart", Seq(p("ts"))) -> "CAST(ts AS DATE)",
      PFunc("parseDate", Seq(p("s"))) -> "CAST(s AS TIMESTAMP)",
      // round-9 widening: string family + collection windows
      PFunc("lpad", Seq(p("s"), PLit("8"))) -> "lpad(s, 8, ' ')",
      PFunc("lpad", Seq(p("s"), PLit("8"), PLit("'0'"))) -> "lpad(s, 8, '0')",
      PFunc("rpad", Seq(p("s"), PLit("4"), PLit("'x'"))) -> "rpad(s, 4, 'x')",
      PFunc("repeatString", Seq(p("s"), PLit("3"))) -> "repeat(s, 3)",
      PFunc("toUpperFirstCharacter", Seq(p("s")))
        -> "concat(upper(left(s, 1)), substring(s, 2))",
      PFunc("isAlphaNumeric", Seq(p("s"))) -> "(s RLIKE '^[A-Za-z0-9]+$')",
      PFunc("isNoLongerThan", Seq(p("s"), PLit("10"))) -> "(length(s) <= 10)",
      PFunc("isNoShorterThan", Seq(p("s"), PLit("2"))) -> "(length(s) >= 2)",
      PFunc("slice", Seq(p("tags"), PLit("1"), PLit("3")))
        -> "slice(tags, (1) + 1, greatest(0, (3) - (1)))",
      PFunc("take", Seq(p("tags"), PLit("2"))) -> "slice(tags, 1, greatest(0, 2))",
      PFunc("limit", Seq(p("tags"), PLit("2"))) -> "slice(tags, 1, greatest(0, 2))",
      PFunc("drop", Seq(p("tags"), PLit("2")))
        -> "slice(tags, greatest(1, (2) + 1), greatest(0, size(tags) - greatest(0, 2)))",
      PFunc("concatenate", Seq(p("tags"), p("more"))) -> "concat(tags, more)",
      PFunc("isDistinct", Seq(p("tags")))
        -> "(size(array_distinct(tags)) = size(tags))")
    for ((ast, expected) <- cases) {
      val sql = PureToSql.scalar(ast, Set("this"))
      assert(sql == expected, s"for $ast")
      SqlRewrite.validateSyntax(sql)
    }
  }

  test("M13: unsupported PURE constructs fail loudly at LOAD time with the offending name") {
    // unknown scalar function in a constraint
    val badConstraint =
      s"""{"classifierPath":"meta::pure::metamodel::type::Class","content":{
         |"_type":"class","name":"bad","package":"demo::entity","superTypes":[],
         |"properties":[${prop("a", "Integer")}],
         |"constraints":[{"name":"weird","functionDefinition":${lambda(
            func("someExoticFunction", thisProp("a")))}}],
         |"qualifiedProperties":[]}}""".stripMargin
    val e1 = intercept[IllegalArgumentException] {
      LegendLoader.fromJsonStrings(Seq(badConstraint))
    }
    assert(e1.getMessage.contains("someExoticFunction"))
    // non-column relational operation in a mapping
    val badMapping =
      s"""{"classifierPath":"meta::pure::mapping::Mapping","content":{
         |"_type":"mapping","name":"bad_rel","package":"demo::mapping",
         |"classMappings":[{"_type":"relational","class":"demo::entity::customer",
         |"mainTable":{"_type":"Table","schema":"default","table":"t"},
         |"propertyMappings":[{"_type":"relationalPropertyMapping",
         |"property":{"class":"demo::entity::customer","property":"name"},
         |"relationalOperation":{"_type":"dynaFunc","funcName":"concat"}}]}]}}""".stripMargin
    val e2 = intercept[IllegalArgumentException] {
      LegendLoader.fromJsonStrings(Seq(badMapping))
    }
    assert(e2.getMessage.contains("name") && e2.getMessage.contains("column"))
  }

  test("M13: groupBy service aggregates per segment") {
    customerRows.createOrReplaceTempView("legend_customer")
    val rows = ServiceGen.runService(spark, model, "demo::service::segmentBalance")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(rows.keySet == Set("BUILDING", "MACHINERY", null))
    assert(math.abs(rows("BUILDING") - 210.25) < 1e-9) // avg(120.5, 300.0)
  }

  test("M13 r9 widening: runtime semantics of the string/collection additions") {
    import spark.implicits._
    import graft.model.legend.PureExpr._
    import graft.model.legend.PureToSql
    def p(n: String) = PProperty(PVar("this"), n)
    val df = Seq(("ab", Seq("x", "y", "y", "z"), Seq("q"))).toDF("s", "tags", "more")
    def ev(ast: graft.model.legend.PureExpr) =
      df.selectExpr(PureToSql.scalar(ast, Set("this"))).head.get(0)
    assert(ev(PFunc("lpad", Seq(p("s"), PLit("4"), PLit("'0'")))) == "00ab")
    assert(ev(PFunc("rpad", Seq(p("s"), PLit("4"), PLit("'x'")))) == "abxx")
    assert(ev(PFunc("repeatString", Seq(p("s"), PLit("3")))) == "ababab")
    assert(ev(PFunc("toUpperFirstCharacter", Seq(p("s")))) == "Ab")
    assert(ev(PFunc("toUpperFirstCharacter", Seq(PLit("''")))) == "")
    assert(ev(PFunc("isAlphaNumeric", Seq(p("s")))) == true)
    assert(ev(PFunc("isAlphaNumeric", Seq(PLit("'a b'")))) == false)
    assert(ev(PFunc("isAlphaNumeric", Seq(PLit("''")))) == false)
    assert(ev(PFunc("isNoLongerThan", Seq(p("s"), PLit("1")))) == false)
    assert(ev(PFunc("isNoLongerThan", Seq(p("s"), PLit("2")))) == true)
    assert(ev(PFunc("isNoShorterThan", Seq(p("s"), PLit("3")))) == false)
    // collection windows: PURE 0-based, end-exclusive, negative-safe
    assert(ev(PFunc("slice", Seq(p("tags"), PLit("1"), PLit("3")))) == Seq("y", "y"))
    assert(ev(PFunc("take", Seq(p("tags"), PLit("2")))) == Seq("x", "y"))
    assert(ev(PFunc("take", Seq(p("tags"), PLit("10")))) == Seq("x", "y", "y", "z"))
    assert(ev(PFunc("take", Seq(p("tags"), PLit("0")))) == Seq())
    assert(ev(PFunc("drop", Seq(p("tags"), PLit("2")))) == Seq("y", "z"))
    assert(ev(PFunc("drop", Seq(p("tags"), PLit("-1")))) == Seq("x", "y", "y", "z"))
    assert(ev(PFunc("drop", Seq(p("tags"), PLit("10")))) == Seq())
    assert(ev(PFunc("concatenate", Seq(p("tags"), p("more"))))
      == Seq("x", "y", "y", "z", "q"))
    assert(ev(PFunc("isDistinct", Seq(p("tags")))) == false)
    assert(ev(PFunc("isDistinct", Seq(p("more")))) == true)
  }

  test("M13 r9 widening: dispersion aggregates translate and run") {
    val devServiceJson =
      s"""{"classifierPath":"meta::legend::service::metamodel::Service","content":{
         |"_type":"service","name":"segmentDev","package":"demo::service","pattern":"/dev",
         |"execution":{"_type":"pureSingleExecution","mapping":"demo::mapping::customer_rel",
         |"func":${lambda(
            func("groupBy",
              func("getAll", ptr("demo::entity::customer")),
              coll(lambda(pprop(pvar("x"), "mktSegment"), "x")),
              coll(func("agg",
                lambda(pprop(pvar("x"), "acctBal"), "x"),
                lambda(func("stdDevSample", pvar("y")), "y"))),
              coll(lit("string", "\"Segment\""), lit("string", "\"DevBal\""))))}}}}""".stripMargin
    val m2 = LegendLoader.fromJsonStrings(
      Seq(partyJson, segmentJson, customerJson, mappingJson, devServiceJson))
    val sql = ServiceGen.serviceSql(m2, "demo::service::segmentDev")
    assert(sql.contains("stddev_samp("), sql)
    customerRows.createOrReplaceTempView("legend_customer")
    val rows = ServiceGen.runService(spark, m2, "demo::service::segmentDev")
      .collect().map(r => (r.getString(0), Option(r.get(1)).map(_.asInstanceOf[Double])))
      .toMap
    // BUILDING has acctBal {120.5, 300.0}: stddev_samp = |diff|/sqrt(2)
    assert(math.abs(rows("BUILDING").get - (300.0 - 120.5) / math.sqrt(2.0)) < 1e-9)
  }

  // --- association navigation (two-class corpus, single FK join) ---

  import graft.model.legend.LegendQueries

  test("M13: association service compiles to ONE join; fields resolve through the target mapping") {
    val sql = ServiceGen.serviceSql(LegendQueries.model, "gate::service::orderWithCustomer")
    assert(sql.contains("JOIN customer AS t1 ON t0.o_custkey = t1.c_custkey"), sql)
    assert(sql.contains("t1.c_name"), sql)        // navigated field, target mapping
    assert(sql.contains("t0.o_totalprice"), sql)  // main field, main mapping
    assert("JOIN".r.findAllIn(sql).size == 1, s"exactly one join expected:\n$sql")
  }

  test("M13: association service executes and matches a manual join") {
    import spark.implicits._
    val orders = Seq((1L, 10L, 60000.0), (2L, 20L, 70000.0), (3L, 10L, 1000.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
      .withColumn("o_orderstatus", org.apache.spark.sql.functions.lit("O"))
      .withColumn("o_orderpriority", org.apache.spark.sql.functions.lit("1-URGENT"))
    val cust = Seq((10L, "Alice", "BUILDING", 5.0), (20L, "Bob", "MACHINERY", 7.0))
      .toDF("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
    orders.createOrReplaceTempView("orders")
    cust.createOrReplaceTempView("customer")
    val rows = ServiceGen.runService(spark, LegendQueries.model,
        "gate::service::orderWithCustomer")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(3)))
    // only order 1 passes: BUILDING segment AND price >= 50000
    assert(rows.toSeq == Seq((1L, "Alice", 60000.0)))
  }

  test("M13: two-hop navigation chains both joins against their parent aliases") {
    val sql = ServiceGen.serviceSql(LegendQueries.model, "gate::service::orderNation")
    assert(sql.contains("JOIN customer AS t1 ON t0.o_custkey = t1.c_custkey"), sql)
    assert(sql.contains("JOIN nation AS t2 ON t1.c_nationkey = t2.n_nationkey"), sql)
    assert(sql.contains("t2.n_name"), sql) // 2-hop field under the hop-2 alias
    assert("JOIN".r.findAllIn(sql).size == 2, sql)
  }

  test("M13: optional hop makes every LATER hop a LEFT JOIN too") {
    val base = LegendQueries.model
    // relax hop 1 (order→customer) to [0..1]; hop 2 stays [1..1]
    val relaxed = base.copy(associations = base.associations.map { case (k, a) =>
      k -> a.copy(properties = a.properties.map(p =>
        if (p.name == "customer") p.copy(multiplicity = Multiplicity.ZeroOrOne) else p))
    })
    val sql = ServiceGen.serviceSql(relaxed, "gate::service::orderNation")
    assert(sql.contains("LEFT JOIN customer AS t1"), sql)
    // an inner hop-2 join would drop orphan orders that hop 1 preserved
    assert(sql.contains("LEFT JOIN nation AS t2"), sql)
  }

  test("M13: an UNDEFINED association chain rejects loudly at compile") {
    // `ghost` is not an association property of customer
    val svc = GraftService("deep", "gate::mapping::order_customer_rel",
      select = Seq("X" -> "customer.ghost.name"))
    val m = LegendQueries.model.copy(
      services = LegendQueries.model.services + ("deep" -> svc))
    val e = intercept[IllegalArgumentException] {
      ServiceGen.serviceSql(m, "deep")
    }
    assert(e.getMessage.contains("does not resolve"), e.getMessage)
  }

  test("M13: unknown navigated field and unmapped join reject loudly") {
    val badField = GraftService("bad_field", "gate::mapping::order_customer_rel",
      select = Seq("X" -> "customer.nope"))
    val m1 = LegendQueries.model.copy(
      services = LegendQueries.model.services + ("bad_field" -> badField))
    val e1 = intercept[IllegalArgumentException] { ServiceGen.serviceSql(m1, "bad_field") }
    assert(e1.getMessage.contains("does not resolve") && e1.getMessage.contains("nope"),
      e1.getMessage)

    // drop the store's join: compile must name the missing join
    val m2 = m1.copy(joins = Map.empty,
      services = LegendQueries.model.services)
    val e2 = intercept[IllegalArgumentException] {
      ServiceGen.serviceSql(m2, "gate::service::orderWithCustomer")
    }
    assert(e2.getMessage.contains("OrderCustomer"), e2.getMessage)
  }

  test("M13: embedded property mappings flatten to columns; everything downstream works") {
    import spark.implicits._
    // person { name: String[1], address: Address[1] };
    // Address { city: String[1], zip: Integer[1], constraint zip > 0 }
    val addressClass =
      s"""{"classifierPath":"meta::pure::metamodel::type::Class","content":{
         |"_type":"class","name":"Address","package":"emb::entity","superTypes":[],
         |"properties":[${prop("city", "String")}, ${prop("zip", "Integer")}],
         |"constraints":[{"name":"positive zip","functionDefinition":${lambda(
              func("greaterThan", thisProp("zip"), lit("integer", "0")))}}],
         |"qualifiedProperties":[]}}""".stripMargin
    val personClass =
      s"""{"classifierPath":"meta::pure::metamodel::type::Class","content":{
         |"_type":"class","name":"person","package":"emb::entity","superTypes":[],
         |"properties":[${prop("name", "String")},
         |  {"name":"address","type":"emb::entity::Address","multiplicity":${mult(1)}}],
         |"constraints":[],"qualifiedProperties":[]}}""".stripMargin
    val mappingJson =
      s"""{"classifierPath":"meta::pure::mapping::Mapping","content":{
         |"_type":"mapping","name":"person_rel","package":"emb::mapping",
         |"classMappings":[{"_type":"relational","class":"emb::entity::person",
         |"mainTable":{"_type":"Table","schema":"default","table":"emb_person"},
         |"propertyMappings":[
         |  {"_type":"relationalPropertyMapping",
         |   "property":{"class":"emb::entity::person","property":"name"},
         |   "relationalOperation":{"_type":"column","column":"p_name","table":{"_type":"Table"}}},
         |  {"_type":"embeddedPropertyMapping",
         |   "property":{"class":"emb::entity::person","property":"address"},
         |   "classMapping":{"_type":"embedded","propertyMappings":[
         |     {"_type":"relationalPropertyMapping",
         |      "property":{"class":"emb::entity::Address","property":"city"},
         |      "relationalOperation":{"_type":"column","column":"addr_city","table":{"_type":"Table"}}},
         |     {"_type":"relationalPropertyMapping",
         |      "property":{"class":"emb::entity::Address","property":"zip"},
         |      "relationalOperation":{"_type":"column","column":"addr_zip","table":{"_type":"Table"}}}]}}]}]}}""".stripMargin
    val serviceJson =
      s"""{"classifierPath":"meta::legend::service::metamodel::Service","content":{
         |"_type":"service","name":"byCity","package":"emb::service","pattern":"/c",
         |"execution":{"_type":"pureSingleExecution","mapping":"emb::mapping::person_rel",
         |"func":${lambda(
            func("project",
              func("filter",
                func("getAll", ptr("emb::entity::person")),
                lambda(func("equal",
                  pprop(pprop(pvar("x"), "address"), "city"),
                  lit("string", "\"PARIS\"")), "x")),
              coll(lambda(pprop(pvar("x"), "name"), "x"),
                   lambda(pprop(pprop(pvar("x"), "address"), "zip"), "x")),
              coll(lit("string", "\"Name\""), lit("string", "\"Zip\""))))}}}}""".stripMargin
    val m = LegendLoader.fromJsonStrings(
      Seq(addressClass, personClass, mappingJson, serviceJson))

    // dotted flattening in the mapping
    val mp = m.mapping("emb::mapping::person_rel")
    assert(mp.fields == Map("name" -> "p_name",
      "address.city" -> "addr_city", "address.zip" -> "addr_zip"))
    // mapping schema is the FLAT table shape
    assert(SchemaGen.schemaOfMapping(m, "emb::mapping::person_rel").fieldNames.toSeq ==
      Seq("p_name", "addr_city", "addr_zip"))

    Seq(("ann", "PARIS", 75001L), ("bob", "OSLO", 150L), ("cid", "PARIS", -4L))
      .toDF("p_name", "addr_city", "addr_zip")
      .createOrReplaceTempView("emb_person")

    // service navigating the embedded field runs (filter + projection)
    val rows = ServiceGen.runService(spark, m, "emb::service::byCity")
      .as[(String, Long)].collect().toSet
    assert(rows == Set(("ann", 75001L), ("cid", -4L)))

    // validation: the NESTED class's constraint resolves through the
    // dotted path to the flat column; embedded mandatory is vacuous
    val rules = Expectations.forMapping(m, "emb::mapping::person_rel").toMap
    assert(rules("positive zip").contains("addr_zip"))
    val bad = spark.table("emb_person")
      .filter(!org.apache.spark.sql.functions.expr(rules("positive zip")))
      .select("p_name").as[String].collect().toSeq
    assert(bad == Seq("cid"))

    // governed read rebuilds the ENTITY shape: struct(city, zip) AS address
    val lifted = ServiceGen.runMapping(spark, m, "emb::mapping::person_rel")
    assert(lifted.schema("address").dataType.isInstanceOf[StructType])
    val ann = lifted.filter(col("name") === "ann").select("address.city", "address.zip")
      .as[(String, Long)].head()
    assert(ann == (("PARIS", 75001L)))
  }

  test("M13: optional association navigation compiles to LEFT JOIN; orphans survive") {
    import spark.implicits._
    // same two-class corpus, but customer navigation relaxed to [0..1]
    val base = LegendQueries.model
    val relaxed = base.copy(associations = base.associations.map { case (k, a) =>
      k -> a.copy(properties = a.properties.map(p =>
        if (p.name == "customer") p.copy(multiplicity = Multiplicity.ZeroOrOne) else p))
    })
    val sql = ServiceGen.serviceSql(relaxed, "gate::service::orderWithCustomer")
    assert(sql.contains("LEFT JOIN customer AS t1"), sql)
    // an orphan order (no customer row) passes a filter that its NULL
    // navigation can't satisfy — but a name-only projection keeps it
    val orphanSvc = GraftService("orphans", "gate::mapping::order_customer_rel",
      select = Seq("OrderId" -> "orderId", "CustomerName" -> "customer.name"))
    val m2 = relaxed.copy(services = relaxed.services + ("orphans" -> orphanSvc))
    Seq((1L, 10L, 60000.0, "O", "1-URGENT"), (2L, 99L, 70000.0, "O", "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus", "o_orderpriority")
      .createOrReplaceTempView("orders")
    Seq((10L, "Alice", "BUILDING", 5.0))
      .toDF("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
      .createOrReplaceTempView("customer")
    val rows = ServiceGen.runService(spark, m2, "orphans")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(rows == Set((1L, Some("Alice")), (2L, None)))
  }

  test("M13: navigating THROUGH a to-many property rejects loudly (no silent fan-out)") {
    val base = LegendQueries.model
    // flip order→customer to [0..*]: a plain join would duplicate every
    // order row once per customer — PURE semantics would aggregate
    val fanout = base.copy(associations = base.associations.map { case (k, a) =>
      k -> a.copy(properties = a.properties.map(p =>
        if (p.name == "customer") p.copy(multiplicity = Multiplicity.ZeroMany) else p))
    })
    val e = intercept[IllegalArgumentException] {
      ServiceGen.serviceSql(fanout, "gate::service::orderWithCustomer")
    }
    assert(e.getMessage.contains("to-many"), e.getMessage)
  }

  test("M13: two associations sharing a property name with different joins reject at load") {
    def cls(n: String) =
      s"""{"classifierPath":"meta::pure::metamodel::type::Class","content":{
         |"_type":"class","name":"$n","package":"dup::entity","superTypes":[],
         |"properties":[${prop("id", "Integer")}],
         |"constraints":[],"qualifiedProperties":[]}}""".stripMargin
    def assoc(n: String, target: String) =
      s"""{"classifierPath":"meta::pure::metamodel::relationship::Association","content":{
         |"_type":"association","name":"$n","package":"dup::entity",
         |"properties":[
         |  {"name":"other","type":"dup::entity::$target","multiplicity":${mult(1)}},
         |  {"name":"back","type":"dup::entity::a","multiplicity":${mult(0, None)}}]}}""".stripMargin
    def join(n: String, rt: String, rc: String) =
      s"""{"name":"$n","operation":{"_type":"dynaFunc","funcName":"equal","parameters":[
         |  {"_type":"column","column":"a_id","table":{"_type":"Table","table":"ta","schema":"default"}},
         |  {"_type":"column","column":"$rc","table":{"_type":"Table","table":"$rt","schema":"default"}}]}}""".stripMargin
    val store =
      s"""{"classifierPath":"meta::relational::metamodel::Database","content":{
         |"_type":"relational","name":"dupDb","package":"dup::store",
         |"schemas":[],"filters":[],
         |"joins":[${join("J1", "tb", "b_id")},${join("J2", "tc", "c_id")}]}}""".stripMargin
    def cm(c: String, t: String) =
      s"""{"_type":"relational","class":"dup::entity::$c",
         |"mainTable":{"_type":"Table","schema":"default","table":"$t"},
         |"propertyMappings":[{"_type":"relationalPropertyMapping",
         |  "property":{"class":"dup::entity::$c","property":"id"},
         |  "relationalOperation":{"_type":"column","column":"${t.last}_id","table":{"_type":"Table"}}}]}""".stripMargin
    def am(a: String, j: String) =
      s"""{"_type":"relational","association":"dup::entity::$a",
         |"propertyMappings":[{"_type":"relationalPropertyMapping",
         |  "property":{"class":"dup::entity::$a","property":"other"},
         |  "relationalOperation":{"_type":"elementWithJoins",
         |    "joins":[{"db":"dup::store::dupDb","name":"$j"}]}}]}""".stripMargin
    val mapping =
      s"""{"classifierPath":"meta::pure::mapping::Mapping","content":{
         |"_type":"mapping","name":"dup_rel","package":"dup::mapping",
         |"classMappings":[${cm("a", "ta")},${cm("b", "tb")},${cm("c", "tc")}],
         |"associationMappings":[${am("A_B", "J1")},${am("A_C", "J2")}]}}""".stripMargin
    val e = intercept[IllegalArgumentException] {
      LegendLoader.fromJsonStrings(
        Seq(cls("a"), cls("b"), cls("c"), assoc("A_B", "b"), assoc("A_C", "c"),
          store, mapping))
    }
    assert(e.getMessage.contains("different joins") && e.getMessage.contains("other"),
      e.getMessage)
  }

  test("M13: ambiguous association property rejects loudly") {
    val base = LegendQueries.model
    // a second association also defining `customer` from order, to a
    // different target class
    val dup = GraftAssociation("gate::entity::Order_Customer2", Seq(
      GraftProperty("customer", "gate::entity::party"),
      GraftProperty("orders", "gate::entity::order", Multiplicity.ZeroMany)))
    val m = base.copy(associations =
      base.associations + ("gate::entity::Order_Customer2" -> dup))
    val e = intercept[IllegalArgumentException] {
      ServiceGen.serviceSql(m, "gate::service::orderWithCustomer")
    }
    assert(e.getMessage.contains("ambiguous"), e.getMessage)
  }

  test("M13: OPTIONAL embedded value - absent rows validate clean and read back NULL") {
    import spark.implicits._
    val addressClass =
      s"""{"classifierPath":"meta::pure::metamodel::type::Class","content":{
         |"_type":"class","name":"Address","package":"opt::entity","superTypes":[],
         |"properties":[${prop("city", "String")}, ${prop("zip", "Integer")}],
         |"constraints":[],"qualifiedProperties":[]}}""".stripMargin
    val personClass =
      s"""{"classifierPath":"meta::pure::metamodel::type::Class","content":{
         |"_type":"class","name":"person","package":"opt::entity","superTypes":[],
         |"properties":[${prop("name", "String")},
         |  {"name":"address","type":"opt::entity::Address","multiplicity":${mult(0)}}],
         |"constraints":[],"qualifiedProperties":[]}}""".stripMargin
    val mappingJson =
      s"""{"classifierPath":"meta::pure::mapping::Mapping","content":{
         |"_type":"mapping","name":"person_rel","package":"opt::mapping",
         |"classMappings":[{"_type":"relational","class":"opt::entity::person",
         |"mainTable":{"_type":"Table","schema":"default","table":"opt_person"},
         |"propertyMappings":[
         |  {"_type":"relationalPropertyMapping",
         |   "property":{"class":"opt::entity::person","property":"name"},
         |   "relationalOperation":{"_type":"column","column":"p_name","table":{"_type":"Table"}}},
         |  {"_type":"embeddedPropertyMapping",
         |   "property":{"class":"opt::entity::person","property":"address"},
         |   "classMapping":{"_type":"embedded","propertyMappings":[
         |     {"_type":"relationalPropertyMapping",
         |      "property":{"class":"opt::entity::Address","property":"city"},
         |      "relationalOperation":{"_type":"column","column":"addr_city","table":{"_type":"Table"}}},
         |     {"_type":"relationalPropertyMapping",
         |      "property":{"class":"opt::entity::Address","property":"zip"},
         |      "relationalOperation":{"_type":"column","column":"addr_zip","table":{"_type":"Table"}}}]}}]}]}}""".stripMargin
    val m = LegendLoader.fromJsonStrings(Seq(addressClass, personClass, mappingJson))

    Seq(("full", "PARIS", Some(75001L)), ("absent", null, None), ("partial", "OSLO", None))
      .map { case (n, c, z) => (n, c, z.map(Long.box).orNull) }
      .toDF("p_name", "addr_city", "addr_zip")
      .createOrReplaceTempView("opt_person")

    val rules = Expectations.forMapping(m, "opt::mapping::person_rel").toMap
    // absent address (ALL leaves null) violates nothing; a partially
    // present one still trips the mandatory-zip rule
    val zipRule = rules("[address.zip] is mandatory")
    val violators = spark.table("opt_person")
      .filter(!org.apache.spark.sql.functions.expr(zipRule))
      .select("p_name").as[String].collect().toSeq
    assert(violators == Seq("partial"), s"rule was: $zipRule")

    // governed read: absent value reads back as NULL, present as struct
    val lifted = ServiceGen.runMapping(spark, m, "opt::mapping::person_rel")
    val byName = lifted.collect()
      .map(r => r.getAs[String]("name") -> r.getAs[org.apache.spark.sql.Row]("address")).toMap
    assert(byName("absent") == null)
    assert(byName("full") != null && byName("full").getAs[String]("city") == "PARIS")
  }

  test("M13: multi-join elementWithJoins and compound join operations reject at load") {
    val multiJoinMapping =
      s"""{"classifierPath":"meta::pure::mapping::Mapping","content":{
         |"_type":"mapping","name":"mj","package":"demo::mapping",
         |"classMappings":[{"_type":"relational","class":"demo::entity::customer",
         |"mainTable":{"_type":"Table","schema":"default","table":"t"},
         |"propertyMappings":[{"_type":"relationalPropertyMapping",
         |"property":{"class":"demo::entity::customer","property":"name"},
         |"relationalOperation":{"_type":"column","column":"c","table":{"_type":"Table"}}}]}],
         |"associationMappings":[{"_type":"relational","association":"demo::A",
         |"propertyMappings":[{"_type":"relationalPropertyMapping",
         |"property":{"class":"demo::A","property":"p"},
         |"relationalOperation":{"_type":"elementWithJoins",
         |"joins":[{"db":"d","name":"j1"},{"db":"d","name":"j2"}]}}]}]}}""".stripMargin
    val e1 = intercept[IllegalArgumentException] {
      LegendLoader.fromJsonStrings(Seq(multiJoinMapping))
    }
    assert(e1.getMessage.contains("single-join"), e1.getMessage)

    val compoundStore =
      s"""{"classifierPath":"meta::relational::metamodel::Database","content":{
         |"_type":"relational","name":"d","package":"demo::store","schemas":[],"filters":[],
         |"joins":[{"name":"j","operation":{"_type":"dynaFunc","funcName":"and","parameters":[]}}]}}""".stripMargin
    val e2 = intercept[IllegalArgumentException] {
      LegendLoader.fromJsonStrings(Seq(compoundStore))
    }
    assert(e2.getMessage.contains("single-equality"), e2.getMessage)
  }

  // --- otherwise-embedded property mappings (single-target routing) ---

  /** person.address is PARTIALLY embedded (city inline as addr_city) and
    * otherwise-routed through the PersonAddress FK join to the address
    * table's own class mapping for everything else. */
  private def otherwiseCorpus(otherwiseJoins: String =
      """[{"db":"ow::store::owDb","name":"PersonAddress"}]""") = {
    val addressClass =
      s"""{"classifierPath":"meta::pure::metamodel::type::Class","content":{
         |"_type":"class","name":"Address","package":"ow::entity","superTypes":[],
         |"properties":[${prop("addrId", "Integer")},${prop("city", "String")},
         |  ${prop("zip", "Integer")}],
         |"constraints":[],"qualifiedProperties":[]}}""".stripMargin
    val personClass =
      s"""{"classifierPath":"meta::pure::metamodel::type::Class","content":{
         |"_type":"class","name":"person","package":"ow::entity","superTypes":[],
         |"properties":[${prop("name", "String")},
         |  {"name":"address","type":"ow::entity::Address","multiplicity":${mult(1)}}],
         |"constraints":[],"qualifiedProperties":[]}}""".stripMargin
    val store =
      s"""{"classifierPath":"meta::relational::metamodel::Database","content":{
         |"_type":"relational","name":"owDb","package":"ow::store","schemas":[],"filters":[],
         |"joins":[{"name":"PersonAddress","operation":{"_type":"dynaFunc","funcName":"equal",
         |  "parameters":[
         |    {"_type":"column","column":"p_addr_id","table":{"_type":"Table","table":"ow_person","schema":"default"}},
         |    {"_type":"column","column":"a_id","table":{"_type":"Table","table":"ow_address","schema":"default"}}]}}]}}""".stripMargin
    val mappingJson =
      s"""{"classifierPath":"meta::pure::mapping::Mapping","content":{
         |"_type":"mapping","name":"person_rel","package":"ow::mapping",
         |"classMappings":[
         |  {"_type":"relational","class":"ow::entity::person",
         |   "mainTable":{"_type":"Table","schema":"default","table":"ow_person"},
         |   "propertyMappings":[
         |     {"_type":"relationalPropertyMapping",
         |      "property":{"class":"ow::entity::person","property":"name"},
         |      "relationalOperation":{"_type":"column","column":"p_name","table":{"_type":"Table"}}},
         |     {"_type":"otherwiseEmbeddedPropertyMapping",
         |      "property":{"class":"ow::entity::person","property":"address"},
         |      "classMapping":{"_type":"embedded","propertyMappings":[
         |        {"_type":"relationalPropertyMapping",
         |         "property":{"class":"ow::entity::Address","property":"city"},
         |         "relationalOperation":{"_type":"column","column":"addr_city","table":{"_type":"Table"}}}]},
         |      "otherwisePropertyMapping":{"_type":"relationalPropertyMapping",
         |        "property":{"class":"ow::entity::person","property":"address"},
         |        "relationalOperation":{"_type":"elementWithJoins","joins":$otherwiseJoins}}}]},
         |  {"_type":"relational","class":"ow::entity::Address",
         |   "mainTable":{"_type":"Table","schema":"default","table":"ow_address"},
         |   "propertyMappings":[
         |     {"_type":"relationalPropertyMapping",
         |      "property":{"class":"ow::entity::Address","property":"addrId"},
         |      "relationalOperation":{"_type":"column","column":"a_id","table":{"_type":"Table"}}},
         |     {"_type":"relationalPropertyMapping",
         |      "property":{"class":"ow::entity::Address","property":"city"},
         |      "relationalOperation":{"_type":"column","column":"a_city","table":{"_type":"Table"}}},
         |     {"_type":"relationalPropertyMapping",
         |      "property":{"class":"ow::entity::Address","property":"zip"},
         |      "relationalOperation":{"_type":"column","column":"a_zip","table":{"_type":"Table"}}}]}]}}""".stripMargin
    // project name, the INLINE city, and the JOIN-ROUTED zip
    val serviceJson =
      s"""{"classifierPath":"meta::legend::service::metamodel::Service","content":{
         |"_type":"service","name":"withZip","package":"ow::service","pattern":"/z",
         |"execution":{"_type":"pureSingleExecution","mapping":"ow::mapping::person_rel",
         |"func":${lambda(
            func("project",
              func("getAll", ptr("ow::entity::person")),
              coll(lambda(pprop(pvar("x"), "name"), "x"),
                   lambda(pprop(pprop(pvar("x"), "address"), "city"), "x"),
                   lambda(pprop(pprop(pvar("x"), "address"), "zip"), "x")),
              coll(lit("string", "\"Name\""), lit("string", "\"City\""),
                   lit("string", "\"Zip\""))))}}}}""".stripMargin
    Seq(addressClass, personClass, store, mappingJson, serviceJson)
  }

  test("M13: otherwise-embedded mapping — inline field stays flat, uncovered field joins") {
    import spark.implicits._
    val m = LegendLoader.fromJsonStrings(otherwiseCorpus())
    val mp = m.mapping("ow::mapping::person_rel")
    assert(mp.fields == Map("name" -> "p_name", "address.city" -> "addr_city"))
    assert(mp.otherwiseJoins == Map("address" -> "ow::store::owDb::PersonAddress"))

    val sql = ServiceGen.serviceSql(m, "ow::service::withZip")
    // ONE join — city never pays it (inline column wins over the route)
    assert(sql.contains("JOIN ow_address AS t1 ON t0.p_addr_id = t1.a_id"), sql)
    assert(sql.contains("t0.addr_city"), sql)
    assert(sql.contains("t1.a_zip"), sql)
    assert("JOIN".r.findAllIn(sql).size == 1, s"exactly one join expected:\n$sql")

    Seq(("ann", "PARIS", 1L), ("bob", "OSLO", 2L))
      .toDF("p_name", "addr_city", "p_addr_id").createOrReplaceTempView("ow_person")
    Seq((1L, "PARIS", 75001L), (2L, "OSLO", 150L))
      .toDF("a_id", "a_city", "a_zip").createOrReplaceTempView("ow_address")
    val rows = ServiceGen.runService(spark, m, "ow::service::withZip")
      .as[(String, String, Long)].collect().toSet
    assert(rows == Set(("ann", "PARIS", 75001L), ("bob", "OSLO", 150L)))

    // expectations on the flat table cover only what it stores: the
    // inline leaf keeps its rule; join-routed fields (and the whole-value
    // mandatory rule) validate under the Address mapping instead
    val rules = Expectations.forMapping(m, "ow::mapping::person_rel").toMap
    assert(rules.contains("[address.city] is mandatory"), rules.keys.mkString(", "))
    assert(rules("[address.city] is mandatory").contains("addr_city"))
    assert(!rules.keys.exists(_.contains("address.zip")), rules.keys.mkString(", "))
    assert(!rules.contains("[address] is mandatory"))
    // the Address class's own mapping still validates everything
    val addrRules = Expectations.forMapping(
      m, "ow::mapping::person_rel::ow::entity::Address").toMap
    assert(addrRules("[zip] is mandatory").contains("a_zip"))

    // flat governed read of the routed field fails loudly with the hint
    val e = intercept[IllegalArgumentException] {
      ServiceGen.mappingSql(m, "ow::mapping::person_rel")
    }
    assert(e.getMessage.contains("OTHERWISE-routed"), e.getMessage)
  }

  test("M13: an unparseable rule fails alone — it cannot resurrect otherwise-filtered rules") {
    // built via the Scala API (the Legend loader rejects bad constraints
    // at load): one broken constraint must surface as its OWN Failure,
    // not disable the otherwise-rule filter for the whole mapping
    val m = LegendLoader.fromJsonStrings(otherwiseCorpus())
    val person = m.clazz("ow::entity::person")
    val m2 = m.copy(classes = m.classes.updated("ow::entity::person",
      person.copy(constraints = Seq(GraftConstraint("broken", "name >< 3")))))
    val compiled = Expectations.compiledForMapping(m2, "ow::mapping::person_rel")
    assert(compiled("broken").isFailure)
    assert(compiled("[address.city] is mandatory").isSuccess)
    // otherwise-routed rules stay filtered out despite the broken rule
    assert(!compiled.keys.exists(_.contains("address.zip")),
      compiled.keys.mkString(", "))
    assert(!compiled.contains("[address] is mandatory"))
  }

  test("M13: multi-target otherwise routing rejects loudly at load") {
    val e = intercept[IllegalArgumentException] {
      LegendLoader.fromJsonStrings(otherwiseCorpus(
        """[{"db":"ow::store::owDb","name":"PersonAddress"},
          | {"db":"ow::store::owDb","name":"Another"}]""".stripMargin))
    }
    assert(e.getMessage.contains("single-target"), e.getMessage)
  }

  test("M13: widened-function runtime semantics match PURE (pmod, collections, dates)") {
    import spark.implicits._
    // evaluate the RENDERED SQL — semantic pins, not string pins
    val row = Seq((-12, 5, Seq("b", "a", "b"), Seq.empty[String],
        java.sql.Timestamp.valueOf("2026-08-13 10:30:00")))
      .toDF("a", "b", "tags", "none", "ts")
    def eval(sql: String) = row.selectExpr(sql).head().get(0)
    import graft.model.legend.PureExpr._
    import graft.model.legend.PureToSql
    def p(n: String) = PProperty(PVar("this"), n)
    def sqlOf(e: graft.model.legend.PureExpr) = PureToSql.scalar(e, Set("this"))
    // PURE: mod(-12, 5) = 3 (non-negative), rem(-12, 5) = -2 (dividend sign)
    assert(eval(sqlOf(PFunc("mod", Seq(p("a"), p("b"))))) == 3)
    assert(eval(sqlOf(PFunc("rem", Seq(p("a"), p("b"))))) == -2)
    // at() is 0-based; first/last on empty collections are empty, not errors
    assert(eval(sqlOf(PFunc("at", Seq(p("tags"), PLit("1"))))) == "a")
    // at() out of bounds ERRORS (PURE semantics) even without ANSI mode
    val oob = intercept[Exception] {
      eval(sqlOf(PFunc("at", Seq(p("tags"), PLit("7")))))
    }
    assert(oob.getMessage.contains("out of bounds"), oob.getMessage)
    assert(eval(sqlOf(PFunc("first", Seq(p("tags"))))) == "b")
    assert(eval(sqlOf(PFunc("last", Seq(p("tags"))))) == "b")
    assert(eval(sqlOf(PFunc("first", Seq(p("none"))))) == null)
    assert(eval(sqlOf(PFunc("removeDuplicates", Seq(p("tags"))))) == Seq("b", "a"))
    // 2026-08-13 is a Thursday in Q3, ISO week 33
    assert(eval(sqlOf(PFunc("dayOfWeekNumber", Seq(p("ts"))))) == 4)
    assert(eval(sqlOf(PFunc("quarterNumber", Seq(p("ts"))))) == 3)
    assert(eval(sqlOf(PFunc("weekOfYear", Seq(p("ts"))))) == 33)
    assert(eval(sqlOf(PFunc("datePart", Seq(p("ts"))))).toString == "2026-08-13")
  }

  test("M13: forAll constraint over a [0..*] property validates element-wise") {
    import spark.implicits._
    val bagClass =
      s"""{"classifierPath":"meta::pure::metamodel::type::Class","content":{
         |"_type":"class","name":"bag","package":"hof::entity","superTypes":[],
         |"properties":[${prop("id", "Integer")},
         |  {"name":"tags","type":"String","multiplicity":${mult(0, None)}}],
         |"constraints":[{"name":"tags nonempty","functionDefinition":${lambda(
              func("forAll", thisProp("tags"),
                lambda(func("greaterThan", func("length", pvar("t")),
                  lit("integer", "0")), "t")))}}],
         |"qualifiedProperties":[]}}""".stripMargin
    val m = LegendLoader.fromJsonStrings(Seq(bagClass))
    val rule = m.clazz("hof::entity::bag").constraints.head
    assert(rule.expr == "forall(tags, graft_t -> (length(graft_t) > 0))")

    // element-wise semantics at runtime: empty collections are vacuously
    // true (PURE forAll over []), one empty string trips the rule
    val df = Seq(
      (1L, Seq("a", "b")), (2L, Seq.empty[String]), (3L, Seq("ok", ""))
    ).toDF("id", "tags")
    val bad = Validator.validate(df, Expectations.forClass(m, "hof::entity::bag")
        .filter(_._1 == "tags nonempty"))
      .select(col("id"), explode(col("graft_violations")).as("v"))
      .collect().map(_.getLong(0)).toSet
    assert(bad == Set(3L))
  }

  test("r15 advisory: service TypeCtx roots at the QUERIED entity, not the mapping's first class") {
    // lattice: bigOrder extends baseOrder; widget is unrelated. A
    // multi-class mapping lists widget FIRST — the old rooting (the
    // mapping's bare-path entry = first class mapping) would check a
    // subType in the service lambda against widget instead of the
    // entity the getAll actually queries.
    val baseJson =
      s"""{"classifierPath":"meta::pure::metamodel::type::Class","content":{
         |"_type":"class","name":"baseOrder","package":"mc::entity","superTypes":[],
         |"properties":[${prop("price", "Float")}],
         |"constraints":[],"qualifiedProperties":[]}}""".stripMargin
    val bigJson =
      s"""{"classifierPath":"meta::pure::metamodel::type::Class","content":{
         |"_type":"class","name":"bigOrder","package":"mc::entity",
         |"superTypes":["mc::entity::baseOrder"],
         |"properties":[${prop("status", "String")}],
         |"constraints":[],"qualifiedProperties":[]}}""".stripMargin
    val widgetJson =
      s"""{"classifierPath":"meta::pure::metamodel::type::Class","content":{
         |"_type":"class","name":"widget","package":"mc::entity","superTypes":[],
         |"properties":[${prop("price", "Float")}],
         |"constraints":[],"qualifiedProperties":[]}}""".stripMargin
    def cm(clazz: String, table: String) =
      s"""{"_type":"relational","class":"mc::entity::$clazz",
         |"mainTable":{"_type":"Table","schema":"default","table":"$table"},
         |"propertyMappings":[{"_type":"relationalPropertyMapping",
         |  "property":{"class":"mc::entity::$clazz","property":"price"},
         |  "relationalOperation":${colOp("price")}}]}""".stripMargin
    def mappingOf(first: String, second: String) =
      s"""{"classifierPath":"meta::pure::mapping::Mapping","content":{
         |"_type":"mapping","name":"m","package":"mc::mapping",
         |"classMappings":[${cm(first, "t_" + first)}, ${cm(second, "t_" + second)}]}}""".stripMargin
    val subTypeToBase = func("subType", pvar("x"),
      """{"_type":"genericTypeInstance","genericType":{"rawType":{"_type":"packageableType","fullPath":"mc::entity::baseOrder"}}}""")
    def svc(queried: String) =
      s"""{"classifierPath":"meta::legend::service::metamodel::Service","content":{
         |"_type":"service","name":"s","package":"mc::service","pattern":"/s",
         |"execution":{"_type":"pureSingleExecution","mapping":"mc::mapping::m",
         |"func":${lambda(
            func("filter",
              func("getAll", ptr(s"mc::entity::$queried")),
              lambda(func("greaterThan", pprop(subTypeToBase, "price"),
                lit("float", "0.0")), "x")))}}}}""".stripMargin

    // queried entity = bigOrder, mapping lists widget first: the
    // subType(@baseOrder) is vacuous FOR BIGORDER and must compile
    // (old rooting checked it against widget and rejected)
    val ok = LegendLoader.fromJsonStrings(Seq(
      baseJson, bigJson, widgetJson, mappingOf("widget", "bigOrder"), svc("bigOrder")))
    assert(ok.services.contains("mc::service::s"))

    // queried entity = widget, mapping lists bigOrder first: the
    // narrowing is UNRELATED for widget and must reject loudly (old
    // rooting checked it against bigOrder and silently erased it)
    val badSvc = scala.util.Try(LegendLoader.fromJsonStrings(Seq(
      baseJson, bigJson, widgetJson, mappingOf("bigOrder", "widget"), svc("widget"))))
    assert(badSvc.isFailure &&
      badSvc.failed.get.getMessage.contains("subType"), badSvc.toString)
  }
}
