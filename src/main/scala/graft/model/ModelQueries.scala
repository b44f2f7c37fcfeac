package graft.model

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checked queries exercising the model subsystem end-to-end
  * (SURVEY §2.1 M1–M11; the m* keys in the driver's correctness gate).
  *
  * Each query runs the *real* model machinery — JSON model load, mapping
  * lift, expectation compilation, native validation, derivations, service
  * SQL generation — over the TPC-H testdata, shaped so an equivalent
  * DuckDB SQL oracle exists. The validation / derivation paths stay fully
  * inside Catalyst (no UDF), so every m* plan is a single scan with
  * map-side partial aggregation — the 100 TB shape is one pass over the
  * fact table, no shuffle beyond the final small groupBy.
  *
  * Mirrors the reference's end-to-end flow (LegendSparkTest.scala:42-72:
  * read → transform → validate → derive; Legend.scala:105-152: service →
  * executable SQL).
  */
object ModelQueries {

  /** Demo model shipped as a resource — classes/enums/constraints/
    * derivations/mappings/services over the customer and orders tables. */
  lazy val model: GraftModel = ModelLoader.fromResource("/graft/models/tpch.json")

  val CustomerMapping = "tpch::mapping::Customer"
  val OrdersMapping = "tpch::mapping::Orders"

  /** M2+M6: lift the raw customer table into entity space through the
    * mapping (table columns → entity fields, single projection). */
  def m1SchemaTransform(s: SparkSession, dir: String): DataFrame = {
    val m = model.mapping(CustomerMapping)
    val fields = model.allProperties(m.entity).map(p => col(p.name))
    Transformer.toEntity(Tables(s, dir, "customer"), m).select(fields: _*)
  }

  /** M3+M4: per-rule violation counts for every compiled expectation
    * (technical mandatory + enum domain + business constraints). One scan:
    * the rule array explodes map-side, partial agg handles the rest. */
  def m2Expectations(s: SparkSession, dir: String): DataFrame = {
    val rules = Expectations.forMapping(model, CustomerMapping)
    val checks = array(rules.map { case (name, sql) =>
      struct(lit(name).as("rule"),
        when(coalesce(expr(sql), lit(false)), lit(0L)).otherwise(lit(1L)).as("v"))
    }: _*)
    Tables(s, dir, "customer")
      .select(explode(checks).as("c"))
      .select(col("c.rule").as("rule"), col("c.v").as("v"))
      .groupBy(col("rule"))
      .agg(sum(col("v")).as("violations"))
  }

  /** M5: native validation — violations array column via higher-order
    * functions (no row UDF), aggregated to clean/dirty counts per status. */
  def m3ValidateAgg(s: SparkSession, dir: String): DataFrame = {
    val p = GraftPipeline(model, OrdersMapping)
    p.validate(Tables(s, dir, "orders"))
      .groupBy(col("o_orderstatus").as("status"))
      .agg(
        count(lit(1)).as("total"),
        sum(when(size(col(Validator.ViolationColumn)) === 0, 1L).otherwise(0L)).as("clean"),
        sum(when(size(col(Validator.ViolationColumn)) > 0, 1L).otherwise(0L)).as("dirty"))
  }

  /** M7: derived properties (entity-space expressions) applied and
    * aggregated — balance banding plus a derived length. */
  def m4Derivations(s: SparkSession, dir: String): DataFrame = {
    val m = model.mapping(CustomerMapping)
    val entity = Transformer.toEntity(Tables(s, dir, "customer"), m)
    Transformer.withDerivations(entity, model, m.entity)
      .groupBy(col("balanceBand"))
      .agg(count(lit(1)).as("n"), round(avg(col("nameLen")), 4).as("avg_name_len"))
  }

  /** M8: a declarative service compiled to ONE executable SQL string
    * (project/filter/group/order/limit in table space) and run via
    * spark.sql — the reference's service surface (Legend.scala:140-152). */
  def m5ServiceSql(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "customer").createOrReplaceTempView("customer")
    ServiceGen.runService(s, model, "tpch::service::SegmentStats")
  }

  /** M11: the full governed pipeline — lift, validate, derive — then an
    * audit aggregate per derived order year. */
  def m6Pipeline(s: SparkSession, dir: String): DataFrame = {
    val p = GraftPipeline(model, OrdersMapping)
    val governed = p.derive(p.validate(Tables(s, dir, "orders")))
    governed
      .groupBy(col("orderYear").as("order_year"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(when(col("highValue"), 1L).otherwise(0L)).as("n_high_value"),
        sum(when(size(col(Validator.ViolationColumn)) === 0, 1L).otherwise(0L)).as("n_clean"),
        round(avg(col("o_totalprice")), 2).as("avg_price"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m1_schema_transform" -> (m1SchemaTransform _),
    "m2_expectations" -> (m2Expectations _),
    "m3_validate_agg" -> (m3ValidateAgg _),
    "m4_derivations" -> (m4Derivations _),
    "m5_service_sql" -> (m5ServiceSql _),
    "m6_pipeline" -> (m6Pipeline _))

  /** DuckDB oracles. Rule predicates are written out longhand (the
    * compiled rule SQL may carry Spark-only literal suffixes like `0.0D`),
    * with identical null semantics: violated = NOT coalesce(rule, FALSE). */
  val oracles: Map[String, String] = {
    val ordersClean =
      """coalesce(o_orderkey IS NOT NULL, FALSE)
        |      AND coalesce(o_custkey IS NOT NULL, FALSE)
        |      AND coalesce(o_orderstatus IS NOT NULL, FALSE)
        |      AND coalesce(o_orderstatus IS NULL OR o_orderstatus IN ('O','F','P'), FALSE)
        |      AND coalesce(o_totalprice IS NOT NULL, FALSE)
        |      AND coalesce(o_orderdate IS NOT NULL, FALSE)
        |      AND coalesce(o_orderpriority IS NOT NULL, FALSE)
        |      AND coalesce(o_orderpriority IS NULL OR o_orderpriority IN
        |        ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW'), FALSE)
        |      AND coalesce(o_totalprice > 0.0, FALSE)
        |      AND coalesce(o_totalprice <= 400000.0, FALSE)""".stripMargin
    Map(
      "m1_schema_transform" ->
        """SELECT c_name AS name, c_nationkey AS nationKey, c_custkey AS custKey,
          |  c_acctbal AS acctBal, c_mktsegment AS mktSegment
          |FROM customer""".stripMargin,
      // DuckDB sum() over integers yields HUGEINT, which the driver's
      // pandas hasher renders as float ("6.0" vs Spark's "6") — every
      // integer sum below is cast back to BIGINT for that reason.
      "m2_expectations" ->
        """SELECT '[name] is mandatory' AS rule,
          |  CAST(sum(CASE WHEN NOT coalesce(c_name IS NOT NULL, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS violations
          |FROM customer
          |UNION ALL
          |SELECT '[nationKey] is mandatory',
          |  CAST(sum(CASE WHEN NOT coalesce(c_nationkey IS NOT NULL, FALSE) THEN 1 ELSE 0 END) AS BIGINT)
          |FROM customer
          |UNION ALL
          |SELECT '[custKey] is mandatory',
          |  CAST(sum(CASE WHEN NOT coalesce(c_custkey IS NOT NULL, FALSE) THEN 1 ELSE 0 END) AS BIGINT)
          |FROM customer
          |UNION ALL
          |SELECT '[mktSegment] not allowed value',
          |  CAST(sum(CASE WHEN NOT coalesce(c_mktsegment IS NULL OR c_mktsegment IN
          |    ('AUTOMOBILE','BUILDING','FURNITURE','MACHINERY','HOUSEHOLD'), FALSE)
          |    THEN 1 ELSE 0 END) AS BIGINT)
          |FROM customer
          |UNION ALL
          |SELECT 'positive account balance',
          |  CAST(sum(CASE WHEN NOT coalesce(c_acctbal >= 0.0, FALSE) THEN 1 ELSE 0 END) AS BIGINT)
          |FROM customer
          |UNION ALL
          |SELECT 'customer name format',
          |  CAST(sum(CASE WHEN NOT coalesce(c_name LIKE 'Customer#%', FALSE) THEN 1 ELSE 0 END) AS BIGINT)
          |FROM customer""".stripMargin,
      "m3_validate_agg" ->
        s"""SELECT o_orderstatus AS status, count(*) AS total,
           |  CAST(sum(CASE WHEN $ordersClean THEN 1 ELSE 0 END) AS BIGINT) AS clean,
           |  CAST(sum(CASE WHEN NOT ($ordersClean) THEN 1 ELSE 0 END) AS BIGINT) AS dirty
           |FROM orders GROUP BY 1""".stripMargin,
      "m4_derivations" ->
        """SELECT CASE WHEN c_acctbal < 0 THEN 'NEGATIVE'
          |  WHEN c_acctbal < 5000 THEN 'LOW' ELSE 'HIGH' END AS balanceBand,
          |  count(*) AS n, round(avg(length(c_name)), 4) AS avg_name_len
          |FROM customer GROUP BY 1""".stripMargin,
      "m5_service_sql" ->
        """SELECT c_mktsegment AS segment, count(c_custkey) AS numCustomers,
          |  round(avg(c_acctbal), 2) AS avgBal
          |FROM customer WHERE c_acctbal IS NOT NULL
          |GROUP BY c_mktsegment
          |ORDER BY numCustomers DESC, segment ASC LIMIT 3""".stripMargin,
      "m6_pipeline" ->
        s"""SELECT year(o_orderdate) AS order_year, count(*) AS n_orders,
           |  CAST(sum(CASE WHEN o_totalprice > 300000.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_high_value,
           |  CAST(sum(CASE WHEN $ordersClean THEN 1 ELSE 0 END) AS BIGINT) AS n_clean,
           |  round(avg(o_totalprice), 2) AS avg_price
           |FROM orders GROUP BY 1""".stripMargin)
  }
}
