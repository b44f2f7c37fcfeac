package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned range join (SURVEY §2.2 R25) — point-in-interval matching
  * WITHOUT an equi key, the join shape Spark has no native operator for
  * (a naive formulation plans as BroadcastNestedLoopJoin / cartesian +
  * filter: every point against every interval, quadratic at scale).
  *
  * The bin trick makes it an equi join: overlay a fixed grid on the
  * value domain; every point lands in exactly ONE cell, every interval
  * is exploded into EVERY cell it overlaps (⌈len/bin⌉ + 1 of them — a
  * small constant when the bin is sized near the typical interval
  * length); matching pairs necessarily share a cell, so an ordinary
  * shuffled equi join on the cell id finds all candidates and the
  * residual BETWEEN filter keeps the true matches. Correct for ANY bin
  * size — the knob only tunes interval replication (too small) against
  * per-cell candidate fan-in (too large).
  *
  * At 100 TB this is one shuffle of points + intervals×cells on the
  * cell key — the same contract as any fact join — where the naive plan
  * is O(|points| × |intervals|) comparisons on one node. Points carry no
  * duplication, so results need no dedup.
  */
object RangeJoin {

  /** Join `points` (one row per point, `ptCol`: LONG) to every interval
    * in `intervals` (`startCol`/`endCol`: LONG, inclusive ends) that
    * contains it. All columns of both inputs survive; the grid column
    * is internal. */
  def pointInInterval(points: DataFrame, ptCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val cell = "graft_cell"
    require(!points.columns.contains(cell) && !intervals.columns.contains(cell),
      s"inputs must not already carry a [$cell] column")
    val shared = points.columns.toSet
      .intersect(intervals.columns.toSet)
    require(shared.isEmpty,
      s"points and intervals share column names ${shared.mkString(", ")} — " +
        "alias one side first (the residual filter would be ambiguous)")
    val p = points.withColumn(cell, floorDiv(ptCol, binWidth))
    val iv = intervals.withColumn(cell,
      explode(sequence(floorDiv(startCol, binWidth), floorDiv(endCol, binWidth))))
    p.join(iv, cell)
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop(cell)
  }

  /** Floor division in exact LONG arithmetic. Float paths are out: a
    * nano-scale long exceeds 2^53 and would round at cell boundaries.
    * `div` alone truncates toward zero (wrong for negatives); shifting
    * by the always-non-negative pmod first makes the numerator an exact
    * multiple, so `div` is exact floor division for any sign. */
  private def floorDiv(name: String, d: Long): Column = {
    val q = "`" + name.replace("`", "``") + "`"
    expr(s"(($q - pmod($q, ${d}L)) div ${d}L)")
  }
}
