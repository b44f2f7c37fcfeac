package graft

import org.apache.spark.sql.functions._

/** Checksum gate for results too large to materialize through the
  * parquet compare (q25_range_join: ×100 rows PER DECADE by data
  * construction — 55.67M at sf1, 5.567B at sf10, 556.7B at sf100).
  *
  * Emits an engine-agnostic fingerprint triple over the (window_id,
  * event_id) result: row count plus two independent modular sums
  *   fp_k = SUM( ((window_id mod M_k) * A_k + event_id) mod M_k )
  * accumulated in DECIMAL(38,0) — exact in both engines at any SF
  * (per-row value < 2^31, so even 10^12 rows stay under 38 digits;
  * a BIGINT sum would overflow past ~5×10^18 under ANSI; window_id is
  * mod-reduced before the multiply so the per-row term itself can
  * never overflow either — see the r15 note at the select). DuckDB's
  * mirror (tools/checksum_duckdb.py) computes the identical triple in
  * HUGEINT; all three numbers must agree exactly.
  *
  * Usage: ChecksumVerify <sfDir>
  */
object ChecksumVerify {

  val A1 = 2654435761L; val M1 = 1000000007L
  val A2 = 40503L;      val M2 = 998244353L

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = GraftSession.local("graft-checksum-verify")
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    // Two-level exact sum: BIGINT partials grouped on a row-level key
    // (pure LONG math in the hot loop — a row-wise DECIMAL(38) sum
    // allocates per row and dominated the sf100 wall time), then a
    // DECIMAL(38) sum over the ~131k partials. Identical exact totals.
    // The partial key MUST be row-derived, not task-derived: AQE
    // coalesces the range join's small input shuffle to a handful of
    // partitions while the join OUTPUT is 557G rows at sf100, so a
    // spark_partition_id() partial overflows BIGINT (term < 2^31 needs
    // every group < 4.3e9 rows; measured ARITHMETIC_OVERFLOW). With
    // event_id % 131072 each group is ~n/131072 rows — bounded by data,
    // not by planner geometry — and ANSI sum still throws rather than
    // wraps if a future decade breaks the bound (max(n) shows headroom).
    // window_id is mod-reduced BEFORE the multiply (r15, advisory fix):
    // the raw product window_id * A1 overflows BIGINT once window_id
    // exceeds ~3.47e9 (decades beyond sf100, but the scaladoc claimed
    // "any SF"). pmod(w, M) * A tops out at M1*A1 ≈ 2.66e18 < 2^63, and
    // (w mod M * A + e) ≡ (w*A + e) (mod M), so both fingerprints are
    // unchanged — the DuckDB mirror (HUGEINT, no reduction needed)
    // still agrees exactly. Remaining ceiling: event_id < ~6.5e18.
    val r = graft.ops.Relational.q25RangeJoin(spark, sfDir)
      .select(
        col("event_id"),
        ((pmod(col("window_id"), lit(M1)) * lit(A1) + col("event_id")) % lit(M1)).as("t1"),
        ((pmod(col("window_id"), lit(M2)) * lit(A2) + col("event_id")) % lit(M2)).as("t2"))
      .groupBy(pmod(col("event_id"), lit(131072L)).as("g"))
      .agg(count(lit(1)).as("n"), sum("t1").as("s1"), sum("t2").as("s2"))
      .select(
        sum("n").as("n"), max("n").as("max_group"),
        sum(col("s1").cast("decimal(38,0)")).as("fp1"),
        sum(col("s2").cast("decimal(38,0)")).as("fp2"))
      .first()
    require(r.getLong(1) < 4300000000L,
      s"per-group partial of ${r.getLong(1)} rows is too close to BIGINT " +
        "overflow — widen the partial key modulus")
    val sec = (System.nanoTime() - t0) / 1e9
    println(s"""{"query":"q25_range_join","engine":"graft","sf_dir":"$sfDir","n":${r.getLong(0)},"fp1":"${r.getDecimal(2)}","fp2":"${r.getDecimal(3)}","sec":${Fmt.dec(sec)}}""")
    spark.stop()
  }
}
