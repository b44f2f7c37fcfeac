package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Exact

/** As-of join (SURVEY §2.2 R19) — for each left row, the single right
  * row with the greatest right-time <= left-time within the same key.
  * Spark has no native ASOF operator; the scalable re-expression is the
  * union-then-window form:
  *
  *   1. tag both sides, union them (schema-aligned),
  *   2. per key, sort by (time, tag) — right rows first at equal times,
  *   3. `last(<right payload>, ignoreNulls)` over rows UNBOUNDED
  *      PRECEDING..CURRENT carries the latest right payload forward,
  *   4. keep left rows.
  *
  * One shuffle on the key, per-key bounded sorting, no join explosion —
  * at 100 TB this beats the range-join alternative (which Spark plans as
  * a broadcast nested loop or cartesian range). Matches DuckDB's native
  * ASOF JOIN semantics, which is exactly what the q19 oracle runs. */
object AsofJoin {

  /** Left rows + `payload` columns from the as-of-matched right row
    * (null when no right row precedes). `leftCols` are carried through;
    * both frames must share the key column name. */
  def asof(left: DataFrame, right: DataFrame, keyCol: String,
           leftTime: String, rightTime: String,
           payload: Seq[String]): DataFrame = {
    val leftCols = left.columns
    val rightTagged = right.select(
      (col(keyCol) +: col(rightTime).as("graft_t") +: lit(0).as("graft_tag") +:
        (payload.map(col) ++
          leftCols.filterNot(c => c == keyCol).map(c => lit(null).as(c)))): _*)
    val leftTagged = left.select(
      (col(keyCol) +: col(leftTime).as("graft_t") +: lit(1).as("graft_tag") +:
        (payload.map(p => lit(null).as(p)) ++
          leftCols.filterNot(c => c == keyCol).map(col))): _*)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("graft_t").asc, col("graft_tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(rightTagged.unionByName(leftTagged)) { (df, p) =>
      df.withColumn(p, last(col(p), ignoreNulls = true).over(w))
    }
    carried.filter(col("graft_tag") === 1)
      .select((leftCols.map(col) ++ payload.map(col)).toIndexedSeq: _*)
  }

  /** R19 gate query: each click as-of joined to the user's latest
    * purchase at-or-before it, aggregated per user. DuckDB oracle uses
    * its native ASOF LEFT JOIN. */
  def q19AsofJoin(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val events = graft.Tables(s, dir, "events")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("ts").as("p_ts"), col("value").as("p_value"))
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    asof(clicks, purchases, "user_id", "ts", "ts", Seq("p_ts", "p_value"))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_clicks"),
        count(col("p_ts")).as("n_matched"),
        sum(unix_micros(col("ts")) - unix_micros(col("p_ts"))).as("sum_gap_us"),
        // exact e2 integer sum (r12 proactive: the q1 ulp-drift class)
        (sum(Exact.e2(col("p_value"))) / lit(100.0)).as("attr_value"))
  }

  val oracle: String =
    """WITH p AS (SELECT user_id, ts AS p_ts, value AS p_value
      |  FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click')
      |SELECT c.user_id AS user_id, count(*) AS n_clicks, count(p_ts) AS n_matched,
      |  CAST(sum(epoch_us(ts) - epoch_us(p_ts)) AS BIGINT) AS sum_gap_us,
      |  CAST(sum(CAST(round(p_value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS attr_value
      |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.p_ts
      |GROUP BY 1""".stripMargin
}
