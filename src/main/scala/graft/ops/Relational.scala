package graft.ops

import graft.Tables
import graft.functions.Exact
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational operator pack (SURVEY §2.2, R1–R17).
  *
  * Every query is declarative DataFrame code: Catalyst gets full freedom
  * for pushdown / pruning / join planning. Dimension sides are explicitly
  * `broadcast()`-hinted; fact⨝fact joins shuffle on their keys and rely on
  * AQE for skew handling. Money/avg aggregates are rounded at fixed scale
  * so results are stable across summation orders (driver compares against
  * a DuckDB oracle computing the same rounded value).
  *
  * Reference behaviours covered: the generated-SQL query surface of
  * Legend services/mappings (reference Legend.scala:105-152) is plain
  * Spark SQL relational algebra — this pack is that surface exercised
  * directly, Spark-first.
  */
object Relational {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  /** R2: TPC-H Q1-style scan + hash aggregate with map-side partial agg. */
  /** Money sums in exact scaled-integer space like q4/q6 (r12): the
    * float-sum form diverged from DuckDB in the 11th significant digit
    * at sf10 (2.8e11 magnitude — summation-order rounding; integers
    * cannot). Averages divide two exact integers, so every engine gets
    * the identical double. */
  def q1Agg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
      .withColumn("qty_l", Exact.roundLong(col("l_quantity")))
      .withColumn("price_e2", Exact.e2(col("l_extendedprice")))
      .withColumn("disc_e2", Exact.e2(col("l_discount")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("qty_l")).cast("double").as("sum_qty"),
        (sum(col("price_e2")) / lit(100.0)).as("sum_base_price"),
        (sum(col("price_e2") * (lit(100L) - col("disc_e2"))) / lit(10000.0)).as("sum_disc_price"),
        round(sum(col("qty_l")).cast("double") / count(lit(1)), 4).as("avg_qty"),
        round(sum(col("disc_e2")).cast("double") / (count(lit(1)) * lit(100.0)), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** R1: filter + projection — both must reach the parquet scan
    * (PushedFilters + pruned ReadSchema; asserted in PlanSpec). */
  def q2FilterProject(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= to_timestamp(lit("1999-01-01")) && col("l_discount") > lit(0.07))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"), col("l_discount"))

  /** R3: dim⨝fact with an explicit broadcast hint — no shuffle of the fact side. */
  def q3BroadcastJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        count(lit(1)).as("num_customers"),
        // exact e2 integer sum (r12 proactive: the q1 ulp-drift class —
        // 2-decimal doubles summed at growing magnitude)
        (sum(Exact.e2(col("c_acctbal"))) / lit(100.0)).as("total_acctbal"))

  /** R4: fact⨝fact shuffle join + aggregate (TPC-H Q3 flavour).
    * Revenue is aggregated in exact scaled-integer space (cents × discount
    * basis points) — at 100 TB, summation order is nondeterministic, so
    * money aggregates in floating point are not reproducible; integers are. */
  def q4JoinAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .filter(col("o_orderdate") < to_timestamp(lit("1997-01-01")))
      .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .withColumn("rev_e4",
        Exact.e2(col("l_extendedprice")) *
          (lit(100L) - Exact.e2(col("l_discount"))))
      .groupBy(col("o_orderkey"), col("o_orderpriority"))
      .agg(sum(col("rev_e4")).as("sum_e4"))
      .filter(col("sum_e4") > lit(1000000000L))
      .select(col("o_orderkey"), col("o_orderpriority"),
        (col("sum_e4") / lit(10000.0)).as("revenue"))

  /** R5: five-way join. Fixed-cardinality dims (nation=25, region=5) are
    * broadcast; customer is SF-scaled so it shuffle-joins on o_custkey
    * (AQE may still pick broadcast from runtime stats at small SF — at
    * 100 TB it must not, and without the hint it won't). */
  def q5MultiJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      // revenue in exact scaled-integer space like q4/q6 (r12: the
      // float form drifted an ulp at sf10's 1e11 magnitudes)
      .agg((sum(Exact.e2(col("l_extendedprice")) *
          (lit(100L) - Exact.e2(col("l_discount")))) / lit(10000.0))
          .as("revenue"),
        count(lit(1)).as("num_items"))

  /** R6: conditional aggregation (TPC-H Q14 flavour). part is SF-scaled
    * (SF×200k rows) so no broadcast hint — shuffle join on partkey, AQE
    * free to pick broadcast only when runtime stats say the side is small. */
  /** Revenue in exact scaled-integer space like q4: the float-sum form
    * diverged from DuckDB in the 11th significant digit at sf1 (3e11
    * magnitude, summation-order rounding) — integers cannot. */
  def q6CondAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
      .withColumn("rev_e4",
        Exact.e2(col("l_extendedprice")) *
          (lit(100L) - Exact.e2(col("l_discount"))))
      .agg(
        (sum(when(col("p_type") === lit("PROMO"), col("rev_e4")).otherwise(lit(0L)))
          / lit(10000.0)).as("promo_revenue"),
        (sum(col("rev_e4")) / lit(10000.0)).as("total_revenue"))

  /** R7: windowed rank per bounded partition (per-customer, never global). */
  def q7WindowRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t(s, dir, "orders")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 2)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rk"))
  }

  /** R8: left-semi join (EXISTS) — no payload columns move for the right side. */
  def q8SemiJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders").filter(col("o_totalprice") > lit(150000.0)),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))

  /** R9: left-anti join (NOT EXISTS). */
  def q9AntiJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))

  /** R10: distinct aggregate — Spark expands to a two-phase agg, partials kept. */
  def q10Distinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("distinct_parts"),
        countDistinct(col("l_suppkey")).as("distinct_supps"),
        count(lit(1)).as("cnt"))

  /** R11: rollup (grouping sets); subtotal rows are disambiguated from
    * genuine NULL key values via GROUPING() flags, not a sentinel string. */
  def q11Rollup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping(col("l_returnflag")).cast("int").as("g_rf"),
        grouping(col("l_linestatus")).cast("int").as("g_ls"),
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        count(lit(1)).as("cnt"))
      .select(
        col("l_returnflag").as("returnflag"),
        col("l_linestatus").as("linestatus"),
        col("g_rf"), col("g_ls"), col("sum_qty"), col("cnt"))

  /** R12: global top-k — TakeOrderedAndProject (per-partition heaps),
    * never a full sort; deterministic via orderkey tiebreak. */
  def q12TopK(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

  /** R13: per-key average as a join (TPC-H Q17 flavour) — the scalar
    * subquery becomes a shuffle-once reaggregation joined back on key. */
  def q13AvgSubquery(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val avgQ = li.groupBy(col("l_partkey").as("ap_partkey"))
      .agg(avg(col("l_quantity")).as("avg_qty"))
    li.join(avgQ, col("l_partkey") === col("ap_partkey"))
      .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
      // exact scaled-integer sum (r12, ulp drift at sf10); the avg-qty
      // FILTER stays float — each per-partkey avg divides a small exact
      // integer sum by an exact count, identical in every engine
      .agg((sum(Exact.e2(col("l_extendedprice"))) / lit(100.0))
          .as("low_qty_revenue"),
        count(lit(1)).as("low_qty_items"))
  }

  /** R14: union + aggregate. */
  def q14Union(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val urgent = o.filter(col("o_orderpriority") === lit("1-URGENT"))
    val high = o.filter(col("o_orderpriority") === lit("2-HIGH"))
    urgent.union(high)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"),
        // exact scaled-integer sum (r12, ulp drift at sf10)
        (sum(Exact.e2(col("o_totalprice"))) / lit(100.0)).as("total"))
  }

  /** R15: time-bucketed aggregation on the events stream table (batch
    * mirror of the streaming tumbling window). Bucket emitted as a
    * formatted string so oracle comparison is representation-stable. */
  def q15EventsWindow(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      // group on a pure-integer hour index and render the display string
      // AFTER aggregation. r14 moved the formatter post-agg (13-char
      // string per fact row dominated at 100M rows); r15 replaced
      // date_trunc('hour') on the grouping path with epoch-micros
      // integer division — the truncation ran Java time logic per row,
      // the division is one codegen'd long op. Exact equivalence needs
      // session TZ = UTC (GraftSession pins it) and non-negative epochs
      // (div truncates toward zero; the corpus is 2024+).
      .groupBy(expr("unix_micros(ts) div 3600000000").as("hour_idx"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        // exact e2 integer sum (r12 proactive: the q1 ulp-drift class)
        (sum(Exact.e2(col("value"))) / lit(100.0)).as("total_value"))
      .select(date_format(timestamp_micros(col("hour_idx") * lit(3600000000L)),
          "yyyy-MM-dd HH").as("hour"),
        col("event_type"), col("cnt"), col("total_value"))

  /** R16: left outer join + two-level aggregate (TPC-H Q13 flavour). */
  def q16OuterJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))

  /** R17/ST3 batch mirror: gap-based sessionization via lag window —
    * a new session starts after >30 min idle; sessions counted per user. */
  def q17Sessions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    t(s, dir, "events")
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > lit(1800000000L), lit(1L))
          .otherwise(lit(0L)))
      .groupBy(col("user_id"))
      .agg(sum(col("new_session")).as("num_sessions"), count(lit(1)).as("num_events"))
  }

  /** R21: sliding-frame window aggregate — moving sum/count over the
    * previous 3 + current events per user. Money in exact cents: Spark
    * maintains sliding frames incrementally (add/remove), which drifts
    * from a recompute in floating point but is exact in integers. */
  def q21MovingWindow(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(-3, Window.currentRow)
    t(s, dir, "events")
      .withColumn("cents", Exact.e2(col("value")))
      .select(col("event_id"), col("user_id"),
        sum(col("cents")).over(w).as("msum_cents"),
        count(lit(1)).over(w).as("n_window"))
  }

  /** R22: EXACT per-group median without a per-group sort of the fact
    * table. l_quantity has a bounded value domain (50 distinct), so the
    * median comes from value-frequency counts: one map-side-combined
    * aggregate over the fact (the only fact-sized shuffle, carrying ≤
    * |groups|×|domain| rows), then a cumulative-sum window and the
    * median selection over that TINY relation. This is the shape that
    * survives 100 TB — `percentile()` (exact) sorts every group's
    * values, `median() OVER` buffers them; counting needs neither.
    * Even-cardinality groups average the two middle values (single
    * IEEE add + halve — engine-portable, no interpolation formula). */
  def q22ExactMedian(s: SparkSession, dir: String): DataFrame = {
    val counts = t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_quantity"))
      .agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy(col("l_returnflag")).orderBy(col("l_quantity").asc)
    val wAll = Window.partitionBy(col("l_returnflag"))
    counts
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("n", sum(col("c")).over(wAll))
      .groupBy(col("l_returnflag"))
      .agg(
        min(when(col("cum") >= expr("(n + 1) DIV 2"), col("l_quantity"))).as("lo"),
        min(when(col("cum") >= expr("(n + 2) DIV 2"), col("l_quantity"))).as("hi"),
        max(col("n")).as("n_rows"))
      .select(col("l_returnflag"),
        ((col("lo") + col("hi")) / 2).as("median_qty"), col("n_rows"))
  }

  /** R23: pivot (long → wide) — per-status quantity totals spread into
    * one column per return flag. The pivot VALUES are passed explicitly:
    * without them Spark runs a separate distinct-collect job just to
    * discover the columns, an extra pass over the fact table that a
    * 100 TB pipeline never wants (and nondeterministic column order
    * besides). Executes as ONE conditional aggregate with map-side
    * partials — same plan family as q6. Sums stay exact: l_quantity is
    * integral-valued, and integer-valued double sums are associative
    * below 2^53, so no cross-engine rounding is needed. */
  def q23Pivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_linestatus"))
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(sum(col("l_quantity")))

  /** R24: set operations — INTERSECT / EXCEPT with their distinct-set
    * semantics (UNION is R14). Cohort arithmetic over order years:
    * customers active in both 1997 and 1998, and churned (1997 only).
    * Spark plans both as left-semi/anti joins over distinct keys —
    * shuffles on the key like any fact join, no row-multiset pitfalls.
    * Labeled counts union into two rows (a 1×1 cross join of the two
    * scalars would read as a cartesian in plan audits). */
  def q24SetOps(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    def activeIn(y: Int) =
      o.filter(year(col("o_orderdate")) === y).select(col("o_custkey"))
    activeIn(1997).intersect(activeIn(1998))
      .agg(lit("active_both").as("cohort"), count(lit(1)).as("n"))
      .union(activeIn(1997).except(activeIn(1998))
        .agg(lit("churned").as("cohort"), count(lit(1)).as("n")))
  }

  /** R25: binned range join — events matched to every maintenance-style
    * window containing them, with NO equi key (the join Spark would
    * plan as a nested-loop cartesian + filter). Windows derive
    * deterministically from the data (every 50th event opens a 2-hour
    * window); [[RangeJoin.pointInInterval]] grids both sides (bin =
    * window length → each window lands in ≤ 2 cells) and equi-joins on
    * the cell, shuffled like any fact join. Timestamps stay raw long
    * nanos end to end — exact arithmetic on both engines. */
  def q25RangeJoin(s: SparkSession, dir: String): DataFrame = {
    val TwoHoursMicros = 7200L * 1000000L
    val e = t(s, dir, "events")
      .select(col("event_id"), unix_micros(col("ts")).as("tsu"))
    val windows = e.filter(col("event_id") % 50 === 0)
      .select(col("event_id").as("window_id"), col("tsu").as("w_start"),
        (col("tsu") + TwoHoursMicros).as("w_end"))
    RangeJoin.pointInInterval(e, "tsu", windows, "w_start", "w_end", TwoHoursMicros)
      .select(col("window_id"), col("event_id"))
  }

  /** R26: the TPC-H Q21 pattern — EXISTS + NOT EXISTS correlated
    * subqueries against the SAME fact table, the hardest relational
    * decorrelation shape. Here: suppliers who returned a line on a
    * multi-supplier order where NO other supplier returned one —
    * "sole blame" counts. Rather than decorrelating to two fact⨝fact
    * semi/anti joins (two full shuffles of lineitem on the same key),
    * both correlated conditions fold into ONE per-order aggregate:
    *   EXISTS other supplier      ⟺ min(l_suppkey) ≠ max(l_suppkey)
    *   NOT EXISTS other R-supplier ⟺ min(R suppkey) = max(R suppkey)
    *     (null-safe: an order with no R line yields NULL = NULL → dropped)
    * A qualifying order credits its sole R-supplier with its R-line
    * count, so numwait = sum of per-order R-line counts. Plain
    * min/max/count — full map-side combine, no count-distinct Expand,
    * exactly one fact-sized Exchange; the top-20 stays a TakeOrdered
    * with a deterministic (count, suppkey) tiebreak. */
  def q26ExistsNotExists(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val rSupp = when(col("l_returnflag") === "R", col("l_suppkey"))
    li.groupBy(col("l_orderkey"))
      .agg(
        min(col("l_suppkey")).as("s_min"),
        max(col("l_suppkey")).as("s_max"),
        min(rSupp).as("r_min"),
        max(rSupp).as("r_max"),
        count(rSupp).as("r_lines"))
      .filter(col("s_min") =!= col("s_max") && col("r_min") === col("r_max"))
      .groupBy(col("r_min").as("l_suppkey"))
      .agg(sum(col("r_lines")).as("numwait"))
      .orderBy(col("numwait").desc, col("l_suppkey").asc)
      .limit(20)
  }

  /** R27: exact quantiles of a CONTINUOUS (unbounded-domain) measure —
    * q22's value-frequency trick needs a bounded domain; this is the
    * two-pass histogram form that works on any domain. See [[Quantile]]
    * for the scale contract (driver holds histogram counts only, no
    * global sort, final selection is candidate-bin-bounded). */
  def q27ExactQuantile(s: SparkSession, dir: String): DataFrame =
    Quantile.exactQuantiles(t(s, dir, "lineitem"), "l_returnflag",
        "l_extendedprice", qs = Seq(0.25, 0.5, 0.75))
      .withColumnsRenamed(Map("g" -> "l_returnflag"))

  /** R28: unpivot / wide→long (the inverse of R23) — the pivoted
    * quantity matrix melts back to (status, flag, sum) rows via the
    * native `unpivot` (Spark plans it as an Expand over the aggregated
    * relation — rows × 3, zero extra shuffles beyond q23's single
    * aggregate). NULL cells are filtered explicitly on BOTH engines:
    * Spark's unpivot keeps null measures where DuckDB's UNPIVOT drops
    * them — pinning the filter removes the cross-engine divergence. */
  def q28Unpivot(s: SparkSession, dir: String): DataFrame =
    q23Pivot(s, dir)
      .unpivot(Array(col("l_linestatus")), Array(col("A"), col("N"), col("R")),
        "l_returnflag", "sum_qty")
      .filter(col("sum_qty").isNotNull)

  /** R29: semi-structured JSON extraction — every event pipeline carries
    * a JSON properties column; schema-on-read extraction must happen in
    * the scan stage, not in a post-hoc parser. The native
    * [[graft.text.JsonGetInt]] kernel replaces `from_json` (JsonToStructs
    * is CodegenFallback — an interpreted island that broke the scan's
    * whole-stage-codegen span and the PlanSpec invariant): one byte-walk
    * per row inside codegen, `from_json`-identical semantics pinned by
    * TextSpec's 60-case cross-check. Project + parse + aggregate partials
    * all run map-side, so the only Exchange carries (event_type,
    * partial-agg) rows — never raw JSON. At 100 TB the parse cost is
    * linear and embarrassingly parallel; malformed documents yield NULL
    * instead of failing the scan. Averages are sum/count divisions of
    * exact integer sums — bit-identical cross-engine, no rounding needed. */
  def q29JsonExtract(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "events")
      .select(col("event_type"),
        graft.text.TextFunctions.jsonGetInt(col("props"), "k").as("k"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        count(col("k")).as("k_present"),
        sum(col("k")).as("k_sum"),
        (sum(col("k")).cast("double") / count(col("k"))).as("k_avg"),
        min(col("k")).as("k_min"),
        max(col("k")).as("k_max"))
  }

  /** R30: ordered funnel conversion (signup → view → click → purchase)
    * with a per-step conversion window — the event-analytics staple.
    * Semantics: first-occurrence strict funnel — a user reaches stage k
    * iff their FIRST stage-k event lands strictly after their first
    * stage-(k-1) event and within 7 days of it, cumulatively from
    * signup. ONE fact-sized Exchange: a per-user conditional-min
    * aggregate (map-side combined, carries 4 timestamps per user), then
    * a global single-row reduction of the tiny per-user relation — the
    * same two-phase shape DuckDB plans, and the one that survives
    * 100 TB (no window over the fact, no per-user sort). Timestamp
    * arithmetic in exact long micros on both engines. */
  /** Per-step conversion window for the R30 funnel: 7 days in micros
    * (shared with the ST13 streaming twin). */
  val FunnelStepBoundUs: Long = 7L * 24 * 3600 * 1000000L

  /** Per-user funnel stage flags under the R30 rule — factored out so
    * the ST13 streaming spec can use the identical batch mirror. NULL
    * comparisons (missing stages) coalesce to false. */
  def funnelFlags(events: DataFrame): DataFrame = {
    def firstTs(tp: String) =
      min(when(col("event_type") === tp, unix_micros(col("ts"))))
    def within(later: org.apache.spark.sql.Column, earlier: org.apache.spark.sql.Column) =
      later > earlier && later - earlier <= lit(FunnelStepBoundUs)
    val perUser = events
      .groupBy(col("user_id"))
      .agg(firstTs("signup").as("t1"), firstTs("view").as("t2"),
        firstTs("click").as("t3"), firstTs("purchase").as("t4"))
    val s2 = within(col("t2"), col("t1"))
    val s3 = s2 && within(col("t3"), col("t2"))
    val s4 = s3 && within(col("t4"), col("t3"))
    perUser.select(col("user_id"),
      col("t1").isNotNull.as("s1"),
      coalesce(s2, lit(false)).as("s2"),
      coalesce(s3, lit(false)).as("s3"),
      coalesce(s4, lit(false)).as("s4"))
  }

  def q30Funnel(s: SparkSession, dir: String): DataFrame =
    funnelFlags(t(s, dir, "events")).agg(
      sum(when(col("s1"), 1L).otherwise(0L)).as("n_signup"),
      sum(when(col("s2"), 1L).otherwise(0L)).as("n_view"),
      sum(when(col("s3"), 1L).otherwise(0L)).as("n_click"),
      sum(when(col("s4"), 1L).otherwise(0L)).as("n_purchase"))

  /** R31: sliding-window distinct users (trailing-7-day DAU per day) —
    * the op a naive engine recomputes as a per-day COUNT(DISTINCT) over
    * a 7-day self-join (7× re-scan) or a windowed distinct (holds user
    * sets in window state). r15: day-bitmask aggregate — ONE fact-sized
    * Exchange, then a popcount reduce; the interval explode, the
    * ±1-delta shuffle, and the ordered cumulative window are all gone.
    * r16: the BLOCKED multi-word form ([[slidingDau]]) lifted the
    * single-word form's 57-day global-span guard — exact at any
    * calendar span, measured at parity. */
  def q31SlidingDau(s: SparkSession, dir: String): DataFrame =
    slidingDau(t(s, dir, "events"))

  /** r15 single-word day-bitmask form — retained solely as the
    * [[BitmaskAb]] baseline after r16 promoted the arbitrary-span
    * blocked form to [[slidingDau]]. Exact only while the GLOBAL day
    * span ≤ 57 (span + 6 window positions must fit one 64-bit cycle);
    * loud-fails via assert_true beyond that. */
  def slidingDauSingleWord(events: DataFrame): DataFrame = {
    // r15: 64-bit day-bitmask aggregate, the q32 trick one step further.
    // Per user, active days live as bits at (unix_date mod 64) — exact
    // while the GLOBAL day span ≤ 57 (span + 6 window positions must fit
    // the 64-bit cycle; the events corpora span 30 days, and a guard
    // asserts it LOUDLY on wider data). The trailing-7-day coverage is
    // then pure bit algebra: covered = OR of the mask cyclically
    // left-rotated 0..6 — bit d of covered says "this user counts toward
    // day d's DAU7". One fact-sized Exchange (user-keyed min/max/bit_or,
    // Long state, codegen'd, duplicates free via idempotent bit_or — the
    // old distinct wave is unnecessary), then a SINGLE-ROW reduce of 64
    // popcount sums (dau7 per bit) + 64 domain maxes (is the day
    // active) + the global min/max for the guard and for mapping bit
    // positions back to real dates. The interval explode, the ±1-delta
    // shuffle, and the single-partition ordered cumsum of the r12 form
    // (kept as [[slidingDauIntervals]] for the A/B) are all gone.
    // Measured (EventsLayoutProbe sf100, 32 cores): 7.29 → 4.80 s flat,
    // 4.33 → 1.29 s bucketed vs DuckDB's 4.69 s same-day matched pair.
    val perUser = events
      .select(col("user_id"), expr("unix_date(cast(ts as date))").as("d"))
      .groupBy(col("user_id"))
      .agg(min(col("d")).as("dmin"), max(col("d")).as("dmax"),
        expr("bit_or(shiftleft(1L, cast(d % 64 as int)))").as("mask"))
      // Java shift semantics mask the amount to 6 bits, so every rotl
      // term below is well-defined (i is 1..6, never 0 or 64)
      .withColumn("covered", expr(
        (1 to 6).map(i =>
          s"(shiftleft(mask, $i) | shiftrightunsigned(mask, ${64 - i}))")
          .mkString("mask | ", " | ", "")))
    val aggs =
      (0 until 64).map(i => sum(expr(s"shiftright(covered, $i) & 1")).as(s"c$i")) ++
        (0 until 64).map(i => max(expr(s"shiftright(mask, $i) & 1")).as(s"a$i")) ++
        Seq(min(col("dmin")).as("gmin"), max(col("dmax")).as("gmax"))
    val one = perUser.agg(aggs.head, aggs.tail: _*)
      .filter(coalesce(assert_true(col("gmax") - col("gmin") <= lit(57L),
        lit("sliding-DAU bitmask: global day span exceeds 57 — widen to a " +
          "blocked-mask form before trusting this result")), lit(true)))
    val stacked = s"stack(64, ${(0 until 64).map(i => s"$i, c$i, a$i").mkString(", ")})" +
      " as (p, dau7, dom)"
    // bit position p → the unique real day in [gmin, gmax+6] with
    // d mod 64 = p (unique because the guarded span fits one cycle)
    one.select(col("gmin"), expr(stacked))
      .filter(col("dom") > 0)
      .select(
        date_format(date_add(to_date(lit("1970-01-01")),
          (col("gmin") + pmod(col("p") - col("gmin"), lit(64L))).cast("int")),
          "yyyy-MM-dd").as("day"),
        col("dau7"))
  }

  /** Core of R31, on any (user_id, ts) relation — factored out so the
    * OpsSpec can drive planted activity patterns through the identical
    * pipeline. Output days are the ACTIVE days only (a day with no
    * events has no row, even when inside some user's trailing window) —
    * the same domain the oracle's `dom` CTE uses.
    *
    * r16: arbitrary-span BLOCKED day-bitmask sliding DAU — lifts the
    * single-word form's global-span ≤ 57 guard by keying the per-user
    * aggregate on (user, word) where word = unix_date div 64. Bits are
    * ABSOLUTE day positions (bit b of word w = epoch day w·64+b), so no
    * cyclic rotation and no span guard: any calendar works.
    *
    * The fact path stays as lean as the single-word form: ONE
    * fact-sized Exchange into groupBy(user, word) with a single bit_or
    * Long of codegen state. Everything word-boundary-shaped happens on
    * the DEDUPED (user, word) rows (≈ users × span/64 — orders of
    * magnitude below fact):
    *
    *  1. each mask row flat-maps to its coverage contributions —
    *     covered-in-word OR(mask<<0..6) at word w, plus (only when the
    *     top 6 bits are set) the carry OR(mask>>>58..63) into word w+1;
    *  2. a per-(user, word) bit_or re-aggregate dedups the case where a
    *     user's covered bit arrives from two source days in ADJACENT
    *     words (one deduped-sized Exchange — without it the popcount
    *     would double-count that user);
    *  3. groupBy(word) with the same 64 popcount sums + 64 domain maxes
    *     as the single-word reduce (span/64 output rows);
    *     day = w·64 + p directly.
    *
    * Cost vs the single-word form (BitmaskAb, sf100 flat, r16): the two
    * extra deduped-sized hops price at ~1.1× — the premium that buys
    * exactness at ANY calendar span where the old form could only
    * loud-fail past 57 days. Requires unix_date ≥ 0 (modern dates;
    * `div`/`%` are truncation, not floor — same assumption the week
    * index arithmetic documents). */
  def slidingDau(events: DataFrame): DataFrame = {
    val masks = events
      .select(col("user_id"),
        expr("unix_date(cast(ts as date)) div 64").as("w"),
        expr("cast(unix_date(cast(ts as date)) % 64 as int)").as("b"))
      .groupBy(col("user_id"), col("w"))
      .agg(expr("bit_or(shiftleft(1L, b))").as("mask"))
    val cover = (0 to 6).map(i => s"shiftleft(mask, $i)").mkString(" | ")
    val carry = (1 to 6).map(i => s"shiftrightunsigned(mask, ${64 - i})").mkString(" | ")
    val contrib = masks.select(col("user_id"), expr(
      s"""explode(if(shiftrightunsigned(mask, 58) != 0,
         |  array(struct(w AS w, mask AS act, $cover AS cov),
         |        struct(w + 1L AS w, 0L AS act, $carry AS cov)),
         |  array(struct(w AS w, mask AS act, $cover AS cov))))
         |""".stripMargin).as("x"))
      .select(col("user_id"), col("x.w").as("w"), col("x.act").as("act"),
        col("x.cov").as("cov"))
    val perUserWord = contrib
      .groupBy(col("user_id"), col("w"))
      .agg(expr("bit_or(act)").as("act"), expr("bit_or(cov)").as("cov"))
    val aggs =
      (0 until 64).map(i => sum(expr(s"shiftright(cov, $i) & 1")).as(s"c$i")) ++
        (0 until 64).map(i => max(expr(s"shiftright(act, $i) & 1")).as(s"a$i"))
    val byWord = perUserWord.groupBy(col("w")).agg(aggs.head, aggs.tail: _*)
    val stacked = s"stack(64, ${(0 until 64).map(i => s"$i, c$i, a$i").mkString(", ")})" +
      " as (p, dau7, dom)"
    byWord.select(col("w"), expr(stacked))
      .filter(col("dom") > 0)
      .select(
        date_format(date_add(to_date(lit("1970-01-01")),
          (col("w") * 64 + col("p")).cast("int")), "yyyy-MM-dd").as("day"),
        col("dau7"))
  }

  /** Pre-r15 q31 form (distinct → collect_set day array → disjoint
    * contribution intervals → ±1 deltas → ordered cumsum) — retained
    * solely as the layout/A-B baseline; see [[slidingDau]] for why the
    * bitmask form replaced it. */
  def slidingDauIntervals(events: DataFrame): DataFrame = {
    val iv = events
      .select(col("user_id"), date_trunc("day", col("ts")).cast("date").as("day"))
      .distinct()
      .groupBy(col("user_id"))
      .agg(array_sort(collect_set(col("day"))).as("ds"))
      .select(explode(expr(
        """transform(ds, (d, i) -> struct(d AS day,
          |  CASE WHEN i < size(ds) - 1
          |    THEN least(date_add(d, 6), date_sub(element_at(ds, i + 2), 1))
          |    ELSE date_add(d, 6) END AS end_day))""".stripMargin)).as("x"))
      .select(col("x.day").as("day"), col("x.end_day").as("end_day"))
    val deltas = iv
      .select(explode(array(
        struct(col("day").as("d"), lit(1L).as("delta")),
        struct(date_add(col("end_day"), 1).as("d"), lit(-1L).as("delta")))).as("x"))
      .select(col("x.d").as("d"), col("x.delta").as("delta"))
    val byDay = deltas.groupBy(col("d"))
      .agg(sum(col("delta")).as("delta"),
        max(when(col("delta") > 0, 1).otherwise(0)).as("is_dom"))
    val cum = Window.orderBy(col("d").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byDay
      .withColumn("dau7", sum(col("delta")).over(cum))
      .filter(col("is_dom") === 1)
      .select(date_format(col("d"), "yyyy-MM-dd").as("day"), col("dau7"))
  }

  /** R32: cohort retention triangle — users cohorted by their FIRST
    * active week; cell (cohort_week, week_offset) counts the cohort's
    * distinct users active that many weeks later. Shape (r15 bitmask,
    * r16 blocked — see [[retention]]): ONE fact-sized Exchange into a
    * per-(user, word) bit_or Long aggregate, then deduped-sized steps to
    * a triangle-sized popcount aggregate; no distinct wave, no object
    * aggregate, no data-sized explode, and — since r16 — no span guard.
    * Offsets are exact: both engines Monday-truncate weeks, so the day
    * difference is always divisible by 7. */
  def q32Retention(s: SparkSession, dir: String): DataFrame =
    retention(t(s, dir, "events"))

  /** r15 single-word week-bitmask form — retained solely as the
    * [[BitmaskAb]]/[[RetentionAb]] baseline after r16 promoted the
    * arbitrary-span blocked form to [[retention]]. Exact only while
    * every user's week span < 64; loud-fails via assert_true beyond.
    *
    * r15: the 64-bit week-bitmask aggregate replaced the
    * distinct+collect_set pipeline (old form kept as
    * [[retentionCollectSet]] for the A/B). Per user, the weeks-active
    * set is a Long bitmask: ONE fact-sized Exchange (the old form paid
    * two — distinct, then re-shuffle into the set aggregate), pure
    * codegen'd Long state (min/max/bit_or — no ObjectHashAggregate, no
    * sort fallback, no per-row array), duplicates collapse for free
    * (bit_or is idempotent, so the distinct() wave is unnecessary, not
    * just fused), and the triangle count is 64 conditional popcount
    * sums per cohort — no explode of data-sized rows at all. Measured
    * (RetentionAb + EventsLayoutProbe, r15, 32 cores): sf10 1.19 s vs
    * collect_set 1.62 s; sf100 3.9–5.5 s flat vs 8.9 s, 0.95 s on the
    * user-bucketed layout — vs DuckDB's 1.31 s same-day matched pair
    * that is ~3× flat and 0.73× bucketed.
    *
    * Week index is pure integer arithmetic on the grouping path
    * (floor((unix_date − 4) / 7), Monday-aligned exactly like
    * date_trunc('week') in both engines; session TZ is pinned UTC);
    * the display string is rendered post-aggregation on triangle-sized
    * rows, the q15 lesson. Mask bits live at widx MOD 64 — exact while
    * every user's week span < 64 (events corpora span 5 weeks; a whole
    * YEAR is 53) because (widx − cohort) mod 64 ≡ widx − cohort; a
    * wider-span user fails the assert_true LOUDLY rather than aliasing,
    * same contract as the quantile histogram caps. */
  def retentionSingleWord(events: DataFrame): DataFrame = {
    val perUser = events
      // dates are modern (unix_date ≥ 4) so integer div == floor here
      .select(col("user_id"), expr("(unix_date(cast(ts as date)) - 4) div 7").as("w"))
      .groupBy(col("user_id"))
      .agg(min(col("w")).as("cw"), max(col("w")).as("mw"),
        expr("bit_or(shiftleft(1L, cast(w % 64 as int)))").as("mask"))
    // rotate the mask so bit i == "active at week_offset i"; Java shift
    // semantics mask the amount to 6 bits, so the r=0 edge (shift by 64)
    // degenerates to mask|mask — still correct.
    val rel = perUser
      .filter(coalesce(assert_true(col("mw") - col("cw") < lit(64L),
        lit("retention bitmask: a user's active-week span is >= 64 weeks — " +
          "widen to the blocked-mask form before trusting this result")), lit(true)))
      .select(col("cw"), expr(
        "shiftrightunsigned(mask, cast(cw % 64 as int)) | " +
          "shiftleft(mask, cast(64 - cw % 64 as int))").as("rm"))
    val bitSums = (0 until 64).map(i => sum(expr(s"shiftright(rm, $i) & 1")).as(s"o$i"))
    val stacked = s"stack(64, ${(0 until 64).map(i => s"${i}L, o$i").mkString(", ")})" +
      " as (week_offset, n_users)"
    rel.groupBy(col("cw")).agg(bitSums.head, bitSums.tail: _*)
      .select(col("cw"), expr(stacked))
      .filter(col("n_users") > 0)
      .select(
        date_format(date_add(to_date(lit("1970-01-05")), (col("cw") * 7).cast("int")),
          "yyyy-MM-dd").as("cohort_week"),
        col("week_offset"), col("n_users"))
  }

  /** Core of R32, on any (user_id, ts) relation — factored out (r14)
    * so the events-layout probe can drive flat vs user-bucketed scans
    * through the identical pipeline.
    *
    * r16: arbitrary-span BLOCKED week-bitmask retention — lifts the
    * single-word form's per-user span < 64 guard. The weeks-active set
    * lives as ABSOLUTE-position blocked masks keyed (user, word =
    * week div 64): the same ONE fact-sized Exchange with pure Long
    * bit_or state. Three more steps, each on DEDUPED-sized rows
    * (distinct (user, word) ≈ users × span/64, orders of magnitude
    * below fact):
    *
    *  1. cohort week per user — the (user, word) aggregate carries
    *     min(week) alongside the mask (a second Long of codegen state;
    *     the bit-trick alternative `mask & -mask` negate-overflows
    *     under ANSI when only bit 63 is set); cw = min over the user's
    *     rows via a user-partitioned window (one deduped-sized
    *     Exchange; no object aggregate, no fact re-scan).
    *  2. shift the user's blocked bitstring right by cw to make bit
    *     positions RELATIVE offsets: with q = cw div 64, r = cw mod 64,
    *     word w contributes mask >>> r to relative word (w − q) and —
    *     when r > 0 — mask << (64 − r) to relative word (w − q − 1)
    *     (for the cohort word itself no bit below r can be set, cw
    *     being the min, so its low part is always empty and the filter
    *     drops it). The two parts land on DISJOINT bit positions
    *     (0..63−r vs 64−r..63), and each absolute week maps to exactly
    *     one (relative word, bit), so the popcount sum counts each
    *     user once per offset — no per-user re-OR needed.
    *  3. triangle: groupBy(cohort, relative word) with the same 64
    *     popcount sums as the single-word form;
    *     week_offset = rw·64 + p.
    *
    * Exactness needs no guard at any span. Requires unix_date ≥ 4
    * (same modern-dates assumption the week index documents). Cost vs
    * the single-word form (BitmaskAb, sf100 flat, r16): ~1.1× — the
    * user-partitioned window's deduped-sized Exchange+sort is the whole
    * premium, and it prices at zero on the user-bucketed layout (bucket
    * partitioning satisfies the window's distribution, leaving only a
    * local sort of ~words-per-user rows). The premium buys exactness at
    * ANY span where the old form could only loud-fail past 64 weeks. */
  def retention(events: DataFrame): DataFrame = {
    val perUserWord = events
      .select(col("user_id"),
        expr("(unix_date(cast(ts as date)) - 4) div 7").as("wk"))
      .groupBy(col("user_id"), expr("wk div 64").as("w"))
      .agg(expr("bit_or(shiftleft(1L, cast(wk % 64 as int)))").as("mask"),
        min(col("wk")).as("wmin"))
    val userWin = Window.partitionBy(col("user_id"))
    val withCw = perUserWord
      .withColumn("cw", min(col("wmin")).over(userWin))
      .withColumn("q", expr("cw div 64"))
      .withColumn("r", expr("cast(cw % 64 as int)"))
    val rel = withCw.select(col("cw"), expr(
      """explode(filter(array(
        |  struct(w - q AS rw, shiftrightunsigned(mask, r) AS rm),
        |  struct(w - q - 1 AS rw, if(r = 0, 0L, shiftleft(mask, 64 - r)) AS rm)),
        |  s -> s.rm != 0))""".stripMargin).as("x"))
      .select(col("cw"), col("x.rw").as("rw"), col("x.rm").as("rm"))
    val bitSums = (0 until 64).map(i => sum(expr(s"shiftright(rm, $i) & 1")).as(s"o$i"))
    val stacked = s"stack(64, ${(0 until 64).map(i => s"${i}L, o$i").mkString(", ")})" +
      " as (po, n_users)"
    rel.groupBy(col("cw"), col("rw")).agg(bitSums.head, bitSums.tail: _*)
      .select(col("cw"), col("rw"), expr(stacked))
      .filter(col("n_users") > 0)
      .select(
        date_format(date_add(to_date(lit("1970-01-05")), (col("cw") * 7).cast("int")),
          "yyyy-MM-dd").as("cohort_week"),
        (col("rw") * 64 + col("po")).as("week_offset"),
        col("n_users"))
  }

  /** Pre-r15 q32 form (distinct → collect_set → explode) — retained
    * solely as the RetentionAb baseline; see [[retention]] for why the
    * bitmask form replaced it. */
  def retentionCollectSet(events: DataFrame): DataFrame = {
    val perUser = events
      .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("week"))
      .distinct()
      .groupBy(col("user_id"))
      .agg(collect_set(col("week")).as("weeks"))
    perUser
      .select(array_min(col("weeks")).as("cohort"), explode(col("weeks")).as("week"))
      .groupBy(col("cohort"),
        (datediff(col("week"), col("cohort")) / 7).cast("long").as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_week"),
        col("week_offset"), col("n_users"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (q1Agg _),
    "q2_filter_project" -> (q2FilterProject _),
    "q3_broadcast_join" -> (q3BroadcastJoin _),
    "q4_join_agg" -> (q4JoinAgg _),
    "q5_multi_join" -> (q5MultiJoin _),
    "q6_cond_agg" -> (q6CondAgg _),
    "q7_window_rank" -> (q7WindowRank _),
    "q8_semi_join" -> (q8SemiJoin _),
    "q9_anti_join" -> (q9AntiJoin _),
    "q10_distinct" -> (q10Distinct _),
    "q11_rollup" -> (q11Rollup _),
    "q12_topk" -> (q12TopK _),
    "q13_avg_subquery" -> (q13AvgSubquery _),
    "q14_union" -> (q14Union _),
    "q15_events_window" -> (q15EventsWindow _),
    "q16_outer_join" -> (q16OuterJoin _),
    "q17_sessions" -> (q17Sessions _),
    "q18_salted_join" -> (SkewJoin.q18SaltedJoin _),
    "q19_asof_join" -> (AsofJoin.q19AsofJoin _),
    "q20_hotkey_salted_join" -> (SkewJoin.q20HotKeySaltedJoin _),
    "q21_moving_window" -> (q21MovingWindow _),
    "q22_exact_median" -> (q22ExactMedian _),
    "q23_pivot" -> (q23Pivot _),
    "q24_set_ops" -> (q24SetOps _),
    "q25_range_join" -> (q25RangeJoin _),
    "q26_exists_not_exists" -> (q26ExistsNotExists _),
    "q27_exact_quantile" -> (q27ExactQuantile _),
    "q28_unpivot" -> (q28Unpivot _),
    "q29_json_extract" -> (q29JsonExtract _),
    "q30_funnel" -> (q30Funnel _),
    "q31_sliding_dau" -> (q31SlidingDau _),
    "q32_retention" -> (q32Retention _))

  val oracles: Map[String, String] = Map(
    "q32_retention" ->
      // both engines Monday-truncate weeks → the day difference is
      // divisible by 7, so // is exact; count(*) is the distinct-user
      // count because (user, week) is unique after the pairs distinct
      """WITH pairs AS (SELECT DISTINCT user_id,
        |    CAST(date_trunc('week', ts) AS DATE) AS week FROM events),
        |coh AS (SELECT user_id, min(week) AS cohort FROM pairs GROUP BY 1)
        |SELECT strftime(c.cohort, '%Y-%m-%d') AS cohort_week,
        |  CAST((p.week - c.cohort) // 7 AS BIGINT) AS week_offset,
        |  count(*) AS n_users
        |FROM pairs p JOIN coh c ON p.user_id = c.user_id
        |GROUP BY 1, 2""".stripMargin,
    "q31_sliding_dau" ->
      // naive form: per-day correlated COUNT(DISTINCT) over the trailing
      // 7 days — O(|days|) probes, each a scan of the deduped pairs;
      // fine as an oracle, the operator's point is avoiding exactly this
      """WITH days AS (SELECT DISTINCT user_id,
        |    CAST(date_trunc('day', ts) AS DATE) AS day FROM events),
        |dom AS (SELECT DISTINCT day FROM days)
        |SELECT strftime(d.day, '%Y-%m-%d') AS day,
        |  (SELECT count(DISTINCT u.user_id) FROM days u
        |   WHERE u.day BETWEEN d.day - 6 AND d.day) AS dau7
        |FROM dom d""".stripMargin,
    "q30_funnel" ->
      // strict first-occurrence funnel, 7-day per-step window; CASE's
      // ELSE 0 absorbs NULL comparisons (missing stages) identically to
      // Spark's when().otherwise(0); sums cast to BIGINT for the gate's
      // pandas round-trip (DuckDB integer sum is HUGEINT)
      """WITH u AS (SELECT user_id,
        |  min(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) AS t1,
        |  min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS t2,
        |  min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS t3,
        |  min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t4
        |  FROM events GROUP BY 1),
        |f AS (SELECT
        |  t1 IS NOT NULL AS s1,
        |  t2 > t1 AND t2 - t1 <= 604800000000 AS s2,
        |  t3 > t2 AND t3 - t2 <= 604800000000 AS s3,
        |  t4 > t3 AND t4 - t3 <= 604800000000 AS s4
        |  FROM u)
        |SELECT
        |  CAST(sum(CASE WHEN s1 THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
        |  CAST(sum(CASE WHEN s2 THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
        |  CAST(sum(CASE WHEN s2 AND s3 THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
        |  CAST(sum(CASE WHEN s2 AND s3 AND s4 THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase
        |FROM f""".stripMargin,
    "q29_json_extract" ->
      // json_valid guards malformed documents (json_extract_string
      // ERRORS on invalid JSON; the guard makes them NULL, mirroring the
      // kernel's null-on-malformed) and TRY_CAST mirrors its null on
      // non-integer values; sums cast to BIGINT (DuckDB sums ints to
      // HUGEINT, which the gate's pandas round-trip turns into float64)
      """WITH j AS (SELECT event_type,
        |  CASE WHEN json_valid(props) THEN
        |    TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)
        |  END AS k
        |  FROM events)
        |SELECT event_type,
        |  count(*) AS n_events,
        |  count(k) AS k_present,
        |  CAST(sum(k) AS BIGINT) AS k_sum,
        |  CAST(sum(k) AS DOUBLE) / count(k) AS k_avg,
        |  min(k) AS k_min,
        |  max(k) AS k_max
        |FROM j GROUP BY 1""".stripMargin,
    "q27_exact_quantile" ->
      // quantile_disc = inverse-ECDF element selection, DuckDB's exact
      // discrete quantile — bit-identical to the histogram operator's
      // k = ceil(q*n) pick (q literals cast to DOUBLE to match Spark)
      (for (q <- Seq("0.25", "0.5", "0.75")) yield
        s"""SELECT l_returnflag, ${q}::DOUBLE AS q,
           |  quantile_disc(l_extendedprice, $q) AS qval
           |FROM lineitem GROUP BY l_returnflag""".stripMargin)
        .mkString("\nUNION ALL\n"),
    "q22_exact_median" ->
      """WITH c AS (SELECT l_returnflag, l_quantity, count(*) AS c
        |  FROM lineitem GROUP BY 1, 2),
        |s AS (SELECT l_returnflag, l_quantity,
        |    sum(c) OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS cum,
        |    sum(c) OVER (PARTITION BY l_returnflag) AS n
        |  FROM c)
        |SELECT l_returnflag,
        |  (min(CASE WHEN cum >= (n + 1) // 2 THEN l_quantity END) +
        |   min(CASE WHEN cum >= (n + 2) // 2 THEN l_quantity END)) / 2 AS median_qty,
        |  CAST(max(n) AS BIGINT) AS n_rows
        |FROM s GROUP BY 1""".stripMargin,
    "q28_unpivot" ->
      """WITH p AS (SELECT l_linestatus,
        |  sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END) AS A,
        |  sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END) AS N,
        |  sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END) AS R
        |FROM lineitem GROUP BY 1)
        |SELECT l_linestatus, rf AS l_returnflag, v AS sum_qty
        |FROM p UNPIVOT (v FOR rf IN (A, N, R))
        |WHERE v IS NOT NULL""".stripMargin,
    "q26_exists_not_exists" ->
      """SELECT l_suppkey, count(*) AS numwait FROM lineitem l1
        |WHERE l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_returnflag = 'R')
        |GROUP BY l_suppkey
        |ORDER BY numwait DESC, l_suppkey ASC LIMIT 20""".stripMargin,
    "q25_range_join" ->
      // ts is TIMESTAMP(NANOS) parquet; graft's reader truncates to
      // micros (ts div 1000) — epoch_us on DuckDB's TIMESTAMP_NS read
      // yields the same long micros
      """WITH e AS (SELECT event_id, epoch_us(ts) AS tsu FROM events),
        |w AS (SELECT event_id AS window_id, tsu AS w_start,
        |         tsu + 7200000000 AS w_end
        |       FROM e WHERE event_id % 50 = 0)
        |SELECT w.window_id, e.event_id
        |FROM e JOIN w ON e.tsu >= w.w_start AND e.tsu <= w.w_end""".stripMargin,
    "q24_set_ops" ->
      """SELECT 'active_both' AS cohort, count(*) AS n FROM (
        |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
        |  INTERSECT
        |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1998)
        |UNION ALL
        |SELECT 'churned', count(*) FROM (
        |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
        |  EXCEPT
        |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1998)""".stripMargin,
    "q23_pivot" ->
      """SELECT l_linestatus,
        |  sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END) AS A,
        |  sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END) AS N,
        |  sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END) AS R
        |FROM lineitem GROUP BY l_linestatus""".stripMargin,
    "q1_agg" ->
      """WITH e AS (
        |  SELECT l_returnflag, l_linestatus,
        |    CAST(round(l_quantity) AS BIGINT) AS qty_l,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS price_e2,
        |    CAST(round(l_discount * 100) AS BIGINT) AS disc_e2
        |  FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02')
        |SELECT l_returnflag, l_linestatus,
        |  CAST(sum(qty_l) AS DOUBLE) AS sum_qty,
        |  CAST(sum(price_e2) AS BIGINT) / 100.0 AS sum_base_price,
        |  CAST(sum(price_e2 * (100 - disc_e2)) AS BIGINT) / 10000.0 AS sum_disc_price,
        |  round(CAST(sum(qty_l) AS DOUBLE) / count(*), 4) AS avg_qty,
        |  round(CAST(sum(disc_e2) AS DOUBLE) / (count(*) * 100.0), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM e
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q2_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1999-01-01' AND l_discount > 0.07""".stripMargin,
    "q3_broadcast_join" ->
      """SELECT n_name, count(*) AS num_customers,
        |  CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total_acctbal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,
    "q4_join_agg" ->
      """SELECT o_orderkey, o_orderpriority, sum_e4 / 10000.0 AS revenue FROM (
        |  SELECT o_orderkey, o_orderpriority,
        |    sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |      * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS sum_e4
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  WHERE o_orderdate < TIMESTAMP '1997-01-01'
        |  GROUP BY o_orderkey, o_orderpriority
        |  HAVING sum_e4 > 1000000000)""".stripMargin,
    "q5_multi_join" ->
      """SELECT r_name, n_name,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |    * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
        |    / 10000.0 AS revenue,
        |  count(*) AS num_items
        |FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,
    "q6_cond_agg" ->
      """WITH r AS (SELECT p_type,
        |    CAST(round(l_extendedprice * 100) AS BIGINT)
        |      * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev_e4
        |  FROM lineitem JOIN part ON l_partkey = p_partkey)
        |SELECT
        |  CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev_e4 ELSE 0 END) AS BIGINT)
        |    / 10000.0 AS promo_revenue,
        |  CAST(sum(rev_e4) AS BIGINT) / 10000.0 AS total_revenue
        |FROM r""".stripMargin,
    "q7_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
        |  FROM orders) WHERE rk <= 2""".stripMargin,
    "q8_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 150000.0)""".stripMargin,
    "q9_anti_join" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "q10_distinct" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS distinct_parts,
        |  count(DISTINCT l_suppkey) AS distinct_supps,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q11_rollup" ->
      """SELECT l_returnflag AS returnflag,
        |  l_linestatus AS linestatus,
        |  CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
        |  CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
        |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS cnt
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "q12_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q13_avg_subquery" ->
      """SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |    / 100.0 AS low_qty_revenue,
        |  count(*) AS low_qty_items
        |FROM lineitem l JOIN (
        |  SELECT l_partkey AS ap_partkey, avg(l_quantity) AS avg_qty
        |  FROM lineitem GROUP BY l_partkey) a
        |ON l.l_partkey = a.ap_partkey
        |WHERE l.l_quantity < 0.5 * a.avg_qty""".stripMargin,
    "q14_union" ->
      """SELECT o_orderstatus, count(*) AS cnt,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total
        |FROM (
        |  SELECT * FROM orders WHERE o_orderpriority = '1-URGENT'
        |  UNION ALL
        |  SELECT * FROM orders WHERE o_orderpriority = '2-HIGH')
        |GROUP BY o_orderstatus""".stripMargin,
    "q15_events_window" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour, event_type,
        |  count(*) AS cnt,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q16_outer_join" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey)
        |GROUP BY c_count""".stripMargin,
    "q18_salted_join" -> SkewJoin.oracle,
    "q19_asof_join" -> AsofJoin.oracle,
    "q20_hotkey_salted_join" -> SkewJoin.hotKeyOracle,
    "q21_moving_window" ->
      // CAST: DuckDB's windowed integer sum is HUGEINT → pandas float
      """SELECT event_id, user_id,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT) AS msum_cents,
        |  count(*) OVER w AS n_window
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)""".stripMargin,
    "q17_sessions" ->
      """SELECT user_id, CAST(sum(new_session) AS BIGINT) AS num_sessions,
        |  count(*) AS num_events FROM (
        |  SELECT user_id,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) IS NULL
        |      OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)) > 1800000000
        |    THEN 1 ELSE 0 END AS new_session
        |  FROM events)
        |GROUP BY user_id""".stripMargin)
}
