package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact scaled-integer conversions for money arithmetic, without
  * per-row BigDecimal (round 15).
  *
  * The engine's "exact e2 sums" pattern (sum money as `round(x*100)`
  * longs so summation order can't drift the result — r12) originally
  * used `functions.round`, whose codegen for DOUBLE input is
  * `BigDecimal.valueOf(d).setScale(0, HALF_UP)` — an allocation plus
  * decimal string conversion PER ROW PER COLUMN. On q1's 600M-row scan
  * with three rounded columns that was the dominant cost (ScanFloor
  * r15: the 6-column scan floor is 1.45 s, q1 was 9.0 s — the
  * aggregate, not the reader, owned the gap; swapping in this helper
  * took q1 to 4.3 s).
  *
  * [[roundLong]] computes the same HALF_UP long with two arithmetic
  * ops: `cast(d + 0.5σ)` where σ = sign(d) and the cast truncates
  * toward zero. This is EXACTLY BigDecimal-HALF_UP for |d| < 2^52:
  * x.5 decision boundaries are dyadic (exactly representable), so any
  * double d ≠ x.5 sits strictly on one side, its shortest decimal
  * representation (what BigDecimal.valueOf sees) sits on the same
  * side, and the float add d+0.5 is either exact (same binade,
  * 0.5 a multiple of the spacing) or rounds by ≤ the spacing within
  * the same unit interval — never across the floor boundary. Above
  * 2^52 doubles are already integers and `round` itself is vacuous;
  * the helper's +0.5 tie could flip to the even neighbor there, so
  * callers summing values beyond ~4.5e15 (=$45T per ROW at e2) must
  * not use it — none of the engine's money columns are within 8
  * orders of magnitude of that.
  */
object Exact {

  /** HALF_UP round of a double column to LONG — codegen arithmetic,
    * no BigDecimal. Exact for |values| < 2^52 (see class doc). */
  def roundLong(c: Column): Column =
    (c + when(c >= 0, lit(0.5)).otherwise(lit(-0.5))).cast("long")

  /** Money column → exact e2 (cents) long: `roundLong(c * 100)`. */
  def e2(c: Column): Column = roundLong(c * lit(100))
}
