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
  * toward zero.
  *
  * INPUT-DOMAIN RESTRICTION (r16, corrected after an advisory found
  * the original "never across the floor boundary" claim false): the
  * float add d+0.5 rounds to nearest, so for the handful of doubles
  * that sit within half an ulp BELOW an exact x.5 boundary the sum
  * rounds UP across it — e.g. 0.49999999999999994 + 0.5 == 1.0
  * exactly, so roundLong gives 1 where BigDecimal-HALF_UP (and
  * therefore Spark's `round` and DuckDB's `round`) give 0. roundLong
  * is exact BigDecimal-HALF_UP only for inputs that are never within
  * 1 ulp of an x.5 boundary. That holds by construction for the
  * engine's only call sites — [[e2]]-style scaled money, where the
  * double is (2-decimal value)×100 and so sits within a few ulps of
  * an INTEGER, maximally far from x.5 — but it is NOT a general
  * drop-in for `round`: where exact cross-engine agreement is
  * load-bearing on arbitrary doubles, keep the engine-native round.
  * Separately, above 2^52 doubles are already integers and the +0.5
  * tie could flip to the even neighbor, so callers must stay below
  * ~4.5e15 (=$45T per row at e2); the engine's money columns are 8
  * orders of magnitude below that.
  */
object Exact {

  /** HALF_UP round of a double column to LONG — codegen arithmetic,
    * no BigDecimal. Exact for |values| < 2^52 (see class doc). */
  def roundLong(c: Column): Column =
    (c + when(c >= 0, lit(0.5)).otherwise(lit(-0.5))).cast("long")

  /** Money column → exact e2 (cents) long: `roundLong(c * 100)`. */
  def e2(c: Column): Column = roundLong(c * lit(100))
}
