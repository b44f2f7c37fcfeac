package graft

import org.apache.spark.sql.functions._

/** Checksum gate for results too large to materialize through the
  * parquet compare (q25_range_join: ×100 rows PER DECADE by data
  * construction — 55.67M at sf1, 5.567B at sf10, 556.7B at sf100).
  *
  * Emits an engine-agnostic fingerprint triple over the (window_id,
  * event_id) result: row count plus two independent modular sums
  *   fp_k = SUM( (window_id * A_k + event_id) mod M_k )
  * accumulated in DECIMAL(38,0) — exact in both engines at any SF
  * (per-row value < 2^31, so even 10^12 rows stay under 38 digits;
  * a BIGINT sum would overflow past ~5×10^18 under ANSI). DuckDB's
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
    val r = graft.ops.Relational.q25RangeJoin(spark, sfDir)
      .select(
        count(lit(1)).as("n"),
        sum(((col("window_id") * lit(A1) + col("event_id")) % lit(M1))
          .cast("decimal(38,0)")).as("fp1"),
        sum(((col("window_id") * lit(A2) + col("event_id")) % lit(M2))
          .cast("decimal(38,0)")).as("fp2"))
      .first()
    val sec = (System.nanoTime() - t0) / 1e9
    println(s"""{"query":"q25_range_join","engine":"graft","sf_dir":"$sfDir","n":${r.getLong(0)},"fp1":"${r.getDecimal(1)}","fp2":"${r.getDecimal(2)}","sec":${Fmt.dec(sec)}}""")
    spark.stop()
  }
}
