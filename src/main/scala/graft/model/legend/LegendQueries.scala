package graft.model.legend

import graft.Tables
import graft.model._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checked gate queries for the Legend interchange path (SURVEY
  * §2.1 M13; keys m7/m8).
  *
  * The fixture below is a complete Legend-protocol entity set authored
  * in the public wire format (class + constraints with PURE lambda ASTs,
  * relational mapping, pureSingleExecution service) over the TPC-H
  * orders table — so the ENTIRE path the reference exercises (entity
  * JSON → compiled constraints/SQL → execution) runs inside the
  * DuckDB-checked correctness gate, not just in specs. Both queries are
  * single-scan shapes: the service is filter→project→sort→take (filter
  * pushed to the parquet scan), validation is one pass with map-side
  * partial aggregation — the same 100 TB contract as the m1–m6 pack.
  */
object LegendQueries {

  // --- protocol-JSON fixture (hand-authored, public Legend wire format) ---
  private def mult1 = """{"lowerBound":1,"upperBound":1}"""
  private def mult01 = """{"lowerBound":0,"upperBound":1}"""
  private def prop(name: String, tpe: String, m: String) =
    s"""{"name":"$name","type":"$tpe","multiplicity":$m}"""
  private def pvar(n: String) = s"""{"_type":"var","name":"$n"}"""
  private def thisProp(name: String) =
    s"""{"_type":"property","property":"$name","parameters":[${pvar("this")}]}"""
  private def xProp(name: String) =
    s"""{"_type":"property","property":"$name","parameters":[${pvar("x")}]}"""
  private def func(f: String, ps: String*) =
    s"""{"_type":"func","function":"$f","parameters":[${ps.mkString(",")}]}"""
  private def plit(t: String, v: String) =
    s"""{"_type":"$t","multiplicity":$mult1,"values":[$v]}"""
  private def str(v: String) = plit("string", "\"" + v + "\"")
  private def lambda(body: String, params: String*) =
    s"""{"_type":"lambda","body":[$body],"parameters":[${params.map(pvar).mkString(",")}]}"""
  private def coll(vs: String*) =
    s"""{"_type":"collection","multiplicity":{"lowerBound":${vs.size},"upperBound":${vs.size}},"values":[${vs.mkString(",")}]}"""
  private def ptr(p: String) = s"""{"_type":"packageableElementPtr","fullPath":"$p"}"""

  private val orderClassJson =
    s"""{"classifierPath":"meta::pure::metamodel::type::Class","content":{
       |"_type":"class","name":"order","package":"gate::entity","superTypes":[],
       |"properties":[
       |  ${prop("orderId", "Integer", mult1)},
       |  ${prop("status", "String", mult1)},
       |  ${prop("price", "Float", mult1)},
       |  ${prop("priority", "String", mult01)}],
       |"constraints":[
       |  {"name":"positive price","functionDefinition":${lambda(
            func("greaterThan", thisProp("price"), plit("float", "0.0")))}},
       |  {"name":"known status","functionDefinition":${lambda(
            func("in", thisProp("status"), coll(str("O"), str("F"), str("P"))))}},
       |  {"name":"urgent well priced","functionDefinition":${lambda(
            func("or",
              func("not", func("startsWith", thisProp("priority"), str("1"))),
              func("greaterThanEqual", thisProp("price"), plit("float", "1000.0"))))}}],
       |"qualifiedProperties":[]}}""".stripMargin

  private def pm(field: String, column: String) =
    s"""{"_type":"relationalPropertyMapping",
       |"property":{"class":"gate::entity::order","property":"$field"},
       |"relationalOperation":{"_type":"column","column":"$column","table":{"_type":"Table"}}}""".stripMargin

  private val mappingJson =
    s"""{"classifierPath":"meta::pure::mapping::Mapping","content":{
       |"_type":"mapping","name":"order_rel","package":"gate::mapping",
       |"classMappings":[{"_type":"relational","class":"gate::entity::order",
       |"mainTable":{"_type":"Table","schema":"default","table":"orders"},
       |"propertyMappings":[${Seq(
          pm("orderId", "o_orderkey"), pm("status", "o_orderstatus"),
          pm("price", "o_totalprice"), pm("priority", "o_orderpriority")).mkString(",")}]}]}}""".stripMargin

  // getAll → filter(price >= 100000) → project → sort(desc OrderId) → take(50)
  private val serviceJson =
    s"""{"classifierPath":"meta::legend::service::metamodel::Service","content":{
       |"_type":"service","name":"bigOrders","package":"gate::service","pattern":"/big",
       |"execution":{"_type":"pureSingleExecution","mapping":"gate::mapping::order_rel",
       |"func":${lambda(
          func("take",
            func("sort",
              func("project",
                func("filter",
                  func("getAll", ptr("gate::entity::order")),
                  lambda(func("greaterThanEqual", xProp("price"),
                    plit("float", "100000.0")), "x")),
                coll(lambda(xProp("orderId"), "x"),
                     lambda(xProp("status"), "x"),
                     lambda(xProp("price"), "x")),
                coll(str("OrderId"), str("Status"), str("Price"))),
              coll(func("desc", str("OrderId")))),
            plit("integer", "50")))}}}}""".stripMargin

  // --- two-class corpus: customer class + association + store joins +
  // --- a navigating service (the m9 single-join association path) ---

  private val customerClassJson =
    s"""{"classifierPath":"meta::pure::metamodel::type::Class","content":{
       |"_type":"class","name":"customer","package":"gate::entity","superTypes":[],
       |"properties":[
       |  ${prop("custId", "Integer", mult1)},
       |  ${prop("name", "String", mult1)},
       |  ${prop("segment", "String", mult1)},
       |  ${prop("balance", "Float", mult1)}],
       |"constraints":[],"qualifiedProperties":[]}}""".stripMargin

  private val associationJson =
    s"""{"classifierPath":"meta::pure::metamodel::relationship::Association","content":{
       |"_type":"association","name":"Order_Customer","package":"gate::entity",
       |"properties":[
       |  {"name":"customer","type":"gate::entity::customer","multiplicity":$mult1},
       |  {"name":"orders","type":"gate::entity::order","multiplicity":{"lowerBound":0}}]}}""".stripMargin

  private val nationClassJson =
    s"""{"classifierPath":"meta::pure::metamodel::type::Class","content":{
       |"_type":"class","name":"nation","package":"gate::entity","superTypes":[],
       |"properties":[
       |  ${prop("nationId", "Integer", mult1)},
       |  ${prop("name", "String", mult1)}],
       |"constraints":[],"qualifiedProperties":[]}}""".stripMargin

  private val nationAssociationJson =
    s"""{"classifierPath":"meta::pure::metamodel::relationship::Association","content":{
       |"_type":"association","name":"Customer_Nation","package":"gate::entity",
       |"properties":[
       |  {"name":"nation","type":"gate::entity::nation","multiplicity":$mult1},
       |  {"name":"customers","type":"gate::entity::customer","multiplicity":{"lowerBound":0}}]}}""".stripMargin

  /** Relational Database (store) entity carrying the FK joins the
    * associations navigate through. */
  private val storeJson =
    s"""{"classifierPath":"meta::relational::metamodel::Database","content":{
       |"_type":"relational","name":"gateDb","package":"gate::store",
       |"schemas":[],"filters":[],
       |"joins":[{"name":"OrderCustomer","operation":{
       |  "_type":"dynaFunc","funcName":"equal","parameters":[
       |    {"_type":"column","column":"o_custkey","table":{"_type":"Table","table":"orders","schema":"default"}},
       |    {"_type":"column","column":"c_custkey","table":{"_type":"Table","table":"customer","schema":"default"}}]}},
       |  {"name":"CustomerNation","operation":{
       |  "_type":"dynaFunc","funcName":"equal","parameters":[
       |    {"_type":"column","column":"c_nationkey","table":{"_type":"Table","table":"customer","schema":"default"}},
       |    {"_type":"column","column":"n_nationkey","table":{"_type":"Table","table":"nation","schema":"default"}}]}}]}}""".stripMargin

  private def pmc(field: String, column: String) =
    s"""{"_type":"relationalPropertyMapping",
       |"property":{"class":"gate::entity::customer","property":"$field"},
       |"relationalOperation":{"_type":"column","column":"$column","table":{"_type":"Table"}}}""".stripMargin

  /** Mapping with BOTH class mappings and the association mapping tying
    * property `customer` to the store join. */
  private val joinMappingJson =
    s"""{"classifierPath":"meta::pure::mapping::Mapping","content":{
       |"_type":"mapping","name":"order_customer_rel","package":"gate::mapping",
       |"classMappings":[
       |  {"_type":"relational","class":"gate::entity::order",
       |   "mainTable":{"_type":"Table","schema":"default","table":"orders"},
       |   "propertyMappings":[${Seq(
            pm("orderId", "o_orderkey"), pm("status", "o_orderstatus"),
            pm("price", "o_totalprice"), pm("priority", "o_orderpriority")).mkString(",")}]},
       |  {"_type":"relational","class":"gate::entity::customer",
       |   "mainTable":{"_type":"Table","schema":"default","table":"customer"},
       |   "propertyMappings":[${Seq(
            pmc("custId", "c_custkey"), pmc("name", "c_name"),
            pmc("segment", "c_mktsegment"), pmc("balance", "c_acctbal")).mkString(",")}]},
       |  {"_type":"relational","class":"gate::entity::nation",
       |   "mainTable":{"_type":"Table","schema":"default","table":"nation"},
       |   "propertyMappings":[
       |     {"_type":"relationalPropertyMapping",
       |      "property":{"class":"gate::entity::nation","property":"nationId"},
       |      "relationalOperation":{"_type":"column","column":"n_nationkey","table":{"_type":"Table"}}},
       |     {"_type":"relationalPropertyMapping",
       |      "property":{"class":"gate::entity::nation","property":"name"},
       |      "relationalOperation":{"_type":"column","column":"n_name","table":{"_type":"Table"}}}]}],
       |"associationMappings":[{"_type":"relational",
       |  "association":"gate::entity::Order_Customer",
       |  "propertyMappings":[{"_type":"relationalPropertyMapping",
       |    "property":{"class":"gate::entity::Order_Customer","property":"customer"},
       |    "relationalOperation":{"_type":"elementWithJoins",
       |      "joins":[{"db":"gate::store::gateDb","name":"OrderCustomer"}]}}]},
       |  {"_type":"relational",
       |  "association":"gate::entity::Customer_Nation",
       |  "propertyMappings":[{"_type":"relationalPropertyMapping",
       |    "property":{"class":"gate::entity::Customer_Nation","property":"nation"},
       |    "relationalOperation":{"_type":"elementWithJoins",
       |      "joins":[{"db":"gate::store::gateDb","name":"CustomerNation"}]}}]}]}}""".stripMargin

  // getAll(order) → filter($x.customer.segment == 'BUILDING' AND price >= 50000)
  //   → project([orderId, customer.name, customer.balance, price])
  //   → sort(desc OrderId) → take(50): one association hop in filter AND projection
  private val joinServiceJson =
    s"""{"classifierPath":"meta::legend::service::metamodel::Service","content":{
       |"_type":"service","name":"orderWithCustomer","package":"gate::service","pattern":"/oc",
       |"execution":{"_type":"pureSingleExecution","mapping":"gate::mapping::order_customer_rel",
       |"func":${lambda(
          func("take",
            func("sort",
              func("project",
                func("filter",
                  func("getAll", ptr("gate::entity::order")),
                  lambda(func("and",
                    func("equal",
                      s"""{"_type":"property","property":"segment","parameters":[${xProp("customer")}]}""",
                      str("BUILDING")),
                    func("greaterThanEqual", xProp("price"),
                      plit("float", "50000.0"))), "x")),
                coll(lambda(xProp("orderId"), "x"),
                     lambda(s"""{"_type":"property","property":"name","parameters":[${xProp("customer")}]}""", "x"),
                     lambda(s"""{"_type":"property","property":"balance","parameters":[${xProp("customer")}]}""", "x"),
                     lambda(xProp("price"), "x")),
                coll(str("OrderId"), str("CustomerName"), str("CustomerBalance"), str("Price"))),
              coll(func("desc", str("OrderId")))),
            plit("integer", "50")))}}}}""".stripMargin

  // two-hop navigation: order → customer → nation, both hops in one
  // service (filter on the 1-hop field, projection reaching hop 2)
  private val deepServiceJson =
    s"""{"classifierPath":"meta::legend::service::metamodel::Service","content":{
       |"_type":"service","name":"orderNation","package":"gate::service","pattern":"/on",
       |"execution":{"_type":"pureSingleExecution","mapping":"gate::mapping::order_customer_rel",
       |"func":${lambda(
          func("take",
            func("sort",
              func("project",
                func("filter",
                  func("getAll", ptr("gate::entity::order")),
                  lambda(func("greaterThanEqual", xProp("price"),
                    plit("float", "80000.0")), "x")),
                coll(lambda(xProp("orderId"), "x"),
                     lambda(s"""{"_type":"property","property":"name","parameters":[${xProp("customer")}]}""", "x"),
                     lambda(s"""{"_type":"property","property":"name","parameters":[{"_type":"property","property":"nation","parameters":[${xProp("customer")}]}]}""", "x"),
                     lambda(xProp("price"), "x")),
                coll(str("OrderId"), str("CustomerName"), str("NationName"), str("Price"))),
              coll(func("desc", str("OrderId")))),
            plit("integer", "30")))}}}}""".stripMargin

  /** The loaded model — parsed once per JVM; load-time translation means
    * a bad fixture fails here, not inside a query. */
  lazy val model: GraftModel =
    LegendLoader.fromJsonStrings(Seq(orderClassJson, mappingJson, serviceJson,
      customerClassJson, associationJson, nationClassJson, nationAssociationJson,
      storeJson, joinMappingJson, joinServiceJson, deepServiceJson))

  val OrderMapping = "gate::mapping::order_rel"

  /** M13 gate (service path): Legend-protocol service end-to-end —
    * protocol JSON → PURE AST → SQL → spark.sql. Filter reaches the
    * scan; sort+take is TakeOrderedAndProject. */
  def m7LegendService(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "orders").createOrReplaceTempView("orders")
    ServiceGen.runService(s, model, "gate::service::bigOrders")
  }

  /** M13 gate (constraint path): Legend-protocol constraints compiled to
    * expectations and aggregated to per-rule violation counts (same
    * single-scan explode shape as m2). */
  def m8LegendValidate(s: SparkSession, dir: String): DataFrame = {
    val rules = Expectations.forMapping(model, OrderMapping)
    val checks = array(rules.map { case (name, sql) =>
      struct(lit(name).as("rule"),
        when(coalesce(expr(sql), lit(false)), lit(0L)).otherwise(lit(1L)).as("v"))
    }: _*)
    Tables(s, dir, "orders")
      .select(explode(checks).as("c"))
      .select(col("c.rule").as("rule"), col("c.v").as("v"))
      .groupBy(col("rule"))
      .agg(sum(col("v")).as("violations"))
  }

  /** M13 gate (association path): a Legend service navigating an
    * association — protocol JSON (class pair + association + store FK
    * join + associationMappings) compiles to ONE SQL join; the navigated
    * fields resolve through the TARGET class's mapping. The emitted join
    * is a plain FK equi-join Spark plans like any fact⨝dim (broadcast
    * here — customer is the small side at every SF). */
  def m9LegendJoin(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "orders").createOrReplaceTempView("orders")
    Tables(s, dir, "customer").createOrReplaceTempView("customer")
    ServiceGen.runService(s, model, "gate::service::orderWithCustomer")
  }

  /** M13 gate (chain path): TWO-hop association navigation — the
    * service projects both a 1-hop and a 2-hop field, so the compiled
    * SQL chains both generated FK joins (order⨝customer⨝nation) with
    * each hop joining against its parent's alias. */
  def m10LegendDeepJoin(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "orders").createOrReplaceTempView("orders")
    Tables(s, dir, "customer").createOrReplaceTempView("customer")
    Tables(s, dir, "nation").createOrReplaceTempView("nation")
    ServiceGen.runService(s, model, "gate::service::orderNation")
  }

  // --- M18: business milestoning (round 12) ---

  /** The milestoned model: a versioned order entity over `orders_hist`,
    * whose store declares business milestoning (from_z/thru_z). Same
    * protocol wire format as everything above. */
  private val milestoneStoreJson =
    s"""{"classifierPath":"meta::relational::metamodel::Database","content":{
       |"_type":"relational","name":"histDb","package":"gate::store",
       |"schemas":[{"name":"default","tables":[
       |  {"name":"orders_hist","columns":[],"primaryKey":[],
       |   "milestoning":[{"_type":"businessMilestoning","from":"from_z","thru":"thru_z"}]}]}],
       |"filters":[],"joins":[]}}""".stripMargin

  private val orderVersionClassJson =
    s"""{"classifierPath":"meta::pure::metamodel::type::Class","content":{
       |"_type":"class","name":"orderVersion","package":"gate::entity","superTypes":[],
       |"properties":[
       |  ${prop("orderId", "Integer", mult1)},
       |  ${prop("status", "String", mult1)},
       |  ${prop("price", "Float", mult1)}],
       |"constraints":[],"qualifiedProperties":[]}}""".stripMargin

  private def pmv(field: String, column: String) =
    s"""{"_type":"relationalPropertyMapping",
       |"property":{"class":"gate::entity::orderVersion","property":"$field"},
       |"relationalOperation":{"_type":"column","column":"$column","table":{"_type":"Table"}}}""".stripMargin

  private val milestoneMappingJson =
    s"""{"classifierPath":"meta::pure::mapping::Mapping","content":{
       |"_type":"mapping","name":"order_hist_rel","package":"gate::mapping",
       |"classMappings":[{"_type":"relational","class":"gate::entity::orderVersion",
       |"mainTable":{"_type":"Table","schema":"default","table":"orders_hist"},
       |"propertyMappings":[${Seq(
          pmv("orderId", "o_orderkey"), pmv("status", "o_status"),
          pmv("price", "o_totalprice")).mkString(",")}]}]}}""".stripMargin

  lazy val milestoneModel: GraftModel = LegendLoader.fromJsonStrings(
    Seq(orderVersionClassJson, milestoneStoreJson, milestoneMappingJson))

  /** M18 gate: business-temporal `.all($businessDate)` end-to-end on
    * the TEXT front end. A deterministic two-version history over
    * `orders` (each order: a 30-day 'P'ending version from its order
    * date, then its final status until the infinity date) is read as-of
    * 1996-06-15 — the as-of filter must pick exactly one version of
    * each order alive on that date and exclude future orders entirely.
    * The compiled WHERE's milestone conjuncts are plain column
    * predicates on the base scan: at 100 TB they push into the parquet
    * reader like any date filter (and prune on a from_z/thru_z
    * partitioned or clustered layout). */
  def m11LegendMilestone(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "orders").createOrReplaceTempView("orders")
    s.sql("""CREATE OR REPLACE TEMPORARY VIEW orders_hist AS
      SELECT o_orderkey, o_totalprice, 'P' AS o_status,
             CAST(o_orderdate AS DATE) AS from_z,
             date_add(o_orderdate, 30) AS thru_z
      FROM orders
      UNION ALL
      SELECT o_orderkey, o_totalprice, o_orderstatus AS o_status,
             date_add(o_orderdate, 30) AS from_z, DATE '9999-12-31' AS thru_z
      FROM orders""")
    val sql = PureParser.querySql(milestoneModel,
      "gate::entity::orderVersion.all($businessDate)" +
        "->filter(x|$x.price >= 100000)" +
        "->groupBy([x|$x.status], " +
        "[agg(x|$x.orderId, x|$x->count()), agg(x|$x.price, x|$x->max()), " +
        "agg(x|$x.price, x|$x->min())], " +
        "['status', 'n', 'max_price', 'min_price'])",
      params = Map("businessDate" -> "DATE '1996-06-15'"))
    s.sql(sql)
  }

  // --- M18b: bitemporal milestoning (round 12 widening) ---

  private val btStoreJson =
    s"""{"classifierPath":"meta::relational::metamodel::Database","content":{
       |"_type":"relational","name":"btDb","package":"gate::store",
       |"schemas":[{"name":"default","tables":[
       |  {"name":"orders_bt","columns":[],"primaryKey":[],
       |   "milestoning":[
       |     {"_type":"businessMilestoning","from":"from_z","thru":"thru_z"},
       |     {"_type":"processingMilestoning","in":"in_z","out":"out_z"}]}]}],
       |"filters":[],"joins":[]}}""".stripMargin

  private val btClassJson =
    s"""{"classifierPath":"meta::pure::metamodel::type::Class","content":{
       |"_type":"class","name":"orderBt","package":"gate::entity","superTypes":[],
       |"properties":[
       |  ${prop("orderId", "Integer", mult1)},
       |  ${prop("status", "String", mult1)},
       |  ${prop("price", "Float", mult1)}],
       |"constraints":[],"qualifiedProperties":[]}}""".stripMargin

  private def pmbt(field: String, column: String) =
    s"""{"_type":"relationalPropertyMapping",
       |"property":{"class":"gate::entity::orderBt","property":"$field"},
       |"relationalOperation":{"_type":"column","column":"$column","table":{"_type":"Table"}}}""".stripMargin

  private val btMappingJson =
    s"""{"classifierPath":"meta::pure::mapping::Mapping","content":{
       |"_type":"mapping","name":"order_bt_rel","package":"gate::mapping",
       |"classMappings":[{"_type":"relational","class":"gate::entity::orderBt",
       |"mainTable":{"_type":"Table","schema":"default","table":"orders_bt"},
       |"propertyMappings":[${Seq(
          pmbt("orderId", "o_orderkey"), pmbt("status", "o_status"),
          pmbt("price", "o_price")).mkString(",")}]}]}}""".stripMargin

  lazy val btModel: GraftModel = LegendLoader.fromJsonStrings(
    Seq(btClassJson, btStoreJson, btMappingJson))

  /** M18b gate: BITEMPORAL `.all(pd, bd)` end-to-end. Deterministic
    * correction history over `orders`: each order is first recorded at
    * its order date with a truncated price (floor to 1000s) valid for
    * all business time; 20 days later the correction lands — the
    * original row is closed out and re-recorded with its business
    * validity capped at orderdate+30, and the TRUE price takes over
    * from orderdate+30. Read as-of processing 1996-06-30 / business
    * 1996-06-15, both milestone pairs compile to plain scan-pushable
    * conjuncts (the 100 TB story is identical to m11's — at scale the
    * four as-of predicates prune on a from_z/in_z partitioned or
    * clustered layout). */
  def m12LegendBitemporal(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "orders").createOrReplaceTempView("orders")
    s.sql("""CREATE OR REPLACE TEMPORARY VIEW orders_bt AS
      SELECT o_orderkey, floor(o_totalprice/1000)*1000 AS o_price,
             o_orderstatus AS o_status,
             CAST(o_orderdate AS DATE) AS from_z, DATE '9999-12-31' AS thru_z,
             CAST(o_orderdate AS DATE) AS in_z, date_add(o_orderdate, 20) AS out_z
      FROM orders
      UNION ALL
      SELECT o_orderkey, floor(o_totalprice/1000)*1000 AS o_price,
             o_orderstatus AS o_status,
             CAST(o_orderdate AS DATE) AS from_z, date_add(o_orderdate, 30) AS thru_z,
             date_add(o_orderdate, 20) AS in_z, DATE '9999-12-31' AS out_z
      FROM orders
      UNION ALL
      SELECT o_orderkey, o_totalprice AS o_price, o_orderstatus AS o_status,
             date_add(o_orderdate, 30) AS from_z, DATE '9999-12-31' AS thru_z,
             date_add(o_orderdate, 20) AS in_z, DATE '9999-12-31' AS out_z
      FROM orders""")
    val sql = PureParser.querySql(btModel,
      "gate::entity::orderBt.all($processingDate, $businessDate)" +
        "->filter(x|$x.price >= 100000)" +
        "->groupBy([x|$x.status], " +
        "[agg(x|$x.orderId, x|$x->count()), agg(x|$x.price, x|$x->max()), " +
        "agg(x|$x.price, x|$x->min())], " +
        "['status', 'n', 'max_price', 'min_price'])",
      params = Map("processingDate" -> "DATE '1996-06-30'",
        "businessDate" -> "DATE '1996-06-15'"))
    s.sql(sql)
  }

  // --- M16b: `->subType(@T)` over a real class lattice (round 14) ---

  /** Two-level lattice: bigOrder extends baseOrder; the subclass is the
    * mapped entity. Entity files arrive SUBCLASS-FIRST on purpose — the
    * two-pass loader must resolve the superType regardless of file
    * order. The subclass carries a constraint whose lambda narrows
    * `$this` through the lattice (compiled in pass 2 under the full
    * TypeCtx), proving protocol-JSON constraints see the merged class
    * set, not just their own file. */
  private val subBaseClassJson =
    s"""{"classifierPath":"meta::pure::metamodel::type::Class","content":{
       |"_type":"class","name":"baseOrder","package":"sub::entity","superTypes":[],
       |"properties":[
       |  ${prop("orderId", "Integer", mult1)},
       |  ${prop("price", "Float", mult1)}],
       |"constraints":[],"qualifiedProperties":[]}}""".stripMargin

  private val subOrderClassJson =
    s"""{"classifierPath":"meta::pure::metamodel::type::Class","content":{
       |"_type":"class","name":"bigOrder","package":"sub::entity",
       |"superTypes":["sub::entity::baseOrder"],
       |"properties":[${prop("status", "String", mult1)}],
       |"constraints":[
       |  {"name":"positive base price","functionDefinition":${lambda(
            func("greaterThan",
              s"""{"_type":"property","property":"price","parameters":[${func(
                   "subType",
                   pvar("this"),
                   """{"_type":"genericTypeInstance","genericType":{"rawType":{"_type":"packageableType","fullPath":"sub::entity::baseOrder"}}}""")}]}""",
              plit("float", "0.0")))}}],
       |"qualifiedProperties":[]}}""".stripMargin

  private def pms(field: String, column: String) =
    s"""{"_type":"relationalPropertyMapping",
       |"property":{"class":"sub::entity::bigOrder","property":"$field"},
       |"relationalOperation":{"_type":"column","column":"$column","table":{"_type":"Table"}}}""".stripMargin

  private val subMappingJson =
    s"""{"classifierPath":"meta::pure::mapping::Mapping","content":{
       |"_type":"mapping","name":"big_order_rel","package":"sub::mapping",
       |"classMappings":[{"_type":"relational","class":"sub::entity::bigOrder",
       |"mainTable":{"_type":"Table","schema":"default","table":"orders"},
       |"propertyMappings":[${Seq(
          pms("orderId", "o_orderkey"), pms("price", "o_totalprice"),
          pms("status", "o_orderstatus")).mkString(",")}]}]}}""".stripMargin

  lazy val subModel: GraftModel = LegendLoader.fromJsonStrings(
    Seq(subOrderClassJson, subBaseClassJson, subMappingJson))

  /** M16b gate: `->subType(@T)` on the text front end, over the loaded
    * lattice. The narrowing to the superclass is provably vacuous, so
    * the rendered SQL is the identity on the chain — the filter is a
    * plain scan-pushable predicate, indistinguishable at plan level
    * from one written without the subType (the same erasure the
    * legend-engine performs for non-inheritance mappings). */
  def m13LegendSubtype(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "orders").createOrReplaceTempView("orders")
    val sql = PureParser.querySql(subModel,
      "sub::entity::bigOrder.all()" +
        "->filter(x|$x->subType(@sub::entity::baseOrder).price >= 100000)" +
        "->groupBy([x|$x.status], " +
        "[agg(x|$x.orderId, x|$x->count()), agg(x|$x.price, x|$x->max())], " +
        "['status', 'n', 'max_price'])")
    s.sql(sql)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m13_legend_subtype" -> (m13LegendSubtype _),
    "m7_legend_service" -> (m7LegendService _),
    "m8_legend_validate" -> (m8LegendValidate _),
    "m9_legend_join" -> (m9LegendJoin _),
    "m10_legend_deep_join" -> (m10LegendDeepJoin _),
    "m11_legend_milestone" -> (m11LegendMilestone _),
    "m12_legend_bitemporal" -> (m12LegendBitemporal _))

  /** Violated = NOT coalesce(rule, FALSE), as in the m2 oracle; DuckDB's
    * integer sum casts back to BIGINT for the gate's pandas hasher. */
  val oracles: Map[String, String] = Map(
    "m13_legend_subtype" ->
      """SELECT o_orderstatus AS status, count(o_orderkey) AS n,
        |  max(o_totalprice) AS max_price
        |FROM orders WHERE o_totalprice >= 100000
        |GROUP BY o_orderstatus""".stripMargin,
    "m12_legend_bitemporal" ->
      """WITH orders_bt AS (
        |  SELECT o_orderkey, floor(o_totalprice/1000)*1000 AS o_price,
        |         o_orderstatus AS o_status,
        |         CAST(o_orderdate AS DATE) AS from_z, DATE '9999-12-31' AS thru_z,
        |         CAST(o_orderdate AS DATE) AS in_z,
        |         CAST(o_orderdate AS DATE) + 20 AS out_z
        |  FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, floor(o_totalprice/1000)*1000 AS o_price,
        |         o_orderstatus AS o_status,
        |         CAST(o_orderdate AS DATE) AS from_z,
        |         CAST(o_orderdate AS DATE) + 30 AS thru_z,
        |         CAST(o_orderdate AS DATE) + 20 AS in_z, DATE '9999-12-31' AS out_z
        |  FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice AS o_price, o_orderstatus AS o_status,
        |         CAST(o_orderdate AS DATE) + 30 AS from_z, DATE '9999-12-31' AS thru_z,
        |         CAST(o_orderdate AS DATE) + 20 AS in_z, DATE '9999-12-31' AS out_z
        |  FROM orders)
        |SELECT o_status AS status, count(o_orderkey) AS n,
        |  max(o_price) AS max_price, min(o_price) AS min_price
        |FROM orders_bt
        |WHERE (in_z <= DATE '1996-06-30' AND DATE '1996-06-30' < out_z)
        |  AND (from_z <= DATE '1996-06-15' AND DATE '1996-06-15' < thru_z)
        |  AND o_price >= 100000
        |GROUP BY o_status""".stripMargin,
    "m11_legend_milestone" ->
      """WITH orders_hist AS (
        |  SELECT o_orderkey, o_totalprice, 'P' AS o_status,
        |         CAST(o_orderdate AS DATE) AS from_z,
        |         CAST(o_orderdate AS DATE) + 30 AS thru_z
        |  FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice, o_orderstatus AS o_status,
        |         CAST(o_orderdate AS DATE) + 30 AS from_z,
        |         DATE '9999-12-31' AS thru_z
        |  FROM orders)
        |SELECT o_status AS status, count(o_orderkey) AS n,
        |  max(o_totalprice) AS max_price, min(o_totalprice) AS min_price
        |FROM orders_hist
        |WHERE (from_z <= DATE '1996-06-15' AND DATE '1996-06-15' < thru_z)
        |  AND o_totalprice >= 100000
        |GROUP BY o_status""".stripMargin,
    "m10_legend_deep_join" ->
      """SELECT o_orderkey AS OrderId, c_name AS CustomerName,
        |  n_name AS NationName, o_totalprice AS Price
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_totalprice >= 80000.0
        |ORDER BY o_orderkey DESC LIMIT 30""".stripMargin,
    "m9_legend_join" ->
      """SELECT o_orderkey AS OrderId, c_name AS CustomerName,
        |  c_acctbal AS CustomerBalance, o_totalprice AS Price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING' AND o_totalprice >= 50000.0
        |ORDER BY o_orderkey DESC LIMIT 50""".stripMargin,
    "m7_legend_service" ->
      """SELECT o_orderkey AS OrderId, o_orderstatus AS Status,
        |  o_totalprice AS Price
        |FROM orders WHERE o_totalprice >= 100000.0
        |ORDER BY o_orderkey DESC LIMIT 50""".stripMargin,
    "m8_legend_validate" ->
      """SELECT '[orderId] is mandatory' AS rule,
        |  CAST(sum(CASE WHEN NOT coalesce(o_orderkey IS NOT NULL, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS violations
        |FROM orders
        |UNION ALL
        |SELECT '[status] is mandatory',
        |  CAST(sum(CASE WHEN NOT coalesce(o_orderstatus IS NOT NULL, FALSE) THEN 1 ELSE 0 END) AS BIGINT)
        |FROM orders
        |UNION ALL
        |SELECT '[price] is mandatory',
        |  CAST(sum(CASE WHEN NOT coalesce(o_totalprice IS NOT NULL, FALSE) THEN 1 ELSE 0 END) AS BIGINT)
        |FROM orders
        |UNION ALL
        |SELECT 'positive price',
        |  CAST(sum(CASE WHEN NOT coalesce(o_totalprice > 0.0, FALSE) THEN 1 ELSE 0 END) AS BIGINT)
        |FROM orders
        |UNION ALL
        |SELECT 'known status',
        |  CAST(sum(CASE WHEN NOT coalesce(o_orderstatus IN ('O','F','P'), FALSE) THEN 1 ELSE 0 END) AS BIGINT)
        |FROM orders
        |UNION ALL
        |SELECT 'urgent well priced',
        |  CAST(sum(CASE WHEN NOT coalesce((NOT starts_with(o_orderpriority, '1'))
        |    OR o_totalprice >= 1000.0, FALSE) THEN 1 ELSE 0 END) AS BIGINT)
        |FROM orders""".stripMargin)
}
