package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-engine fingerprint gate for decade-scale query outputs too
  * large to materialize through the parquet compare — the
  * generalization of [[ChecksumVerify]]'s q25 triple to any
  * [[SparkEntry]] key (round 18: the t-pack's fifth-decade receipts,
  * where t6/t11 emit 150M/50M rows at sf1000 and the row-level DuckDB
  * compare would spend its time on parquet IO, not verification).
  *
  * Per key, a CANONICAL column list defines the fingerprint: exact
  * integer columns (strings enter through the same md5-prefix hash
  * both engines already share — [[graft.dedup.Dedup.shingleBaseHash]]
  * here, `('0x' || substr(md5(c),1,15))::BIGINT` in DuckDB) are folded
  * row-wise by a Horner chain mod two primes, then summed exactly with
  * the same two-level partial scheme ChecksumVerify documents (BIGINT
  * partials on a row-derived key, DECIMAL(38) total). Any float column
  * is carried as a SEPARATE third fingerprint (scaled by 1e6 and
  * rounded): the discrete gate cannot be invalidated by a last-ulp
  * libm divergence between engines, and a float mismatch is reported
  * as exactly that. `tools/scale_checksum_duckdb.py` is the mirror —
  * it reads the SAME oracle SQL the sf0.01 gate runs (from a Verify
  * dump's oracle_sql.json), so the fingerprinted semantics are the
  * gate semantics, only at a decade the row compare can't reach.
  *
  * Horner step: h' = (h * A + pmod(c, M)) mod M, h0 = 0. Each step's
  * product is < M*A ≈ 2.66e18 < 2^63 for (M1, A1), and the DuckDB
  * mirror runs the identical chain in BIGINT before its HUGEINT sum,
  * so both engines compute the same exact value per row at any scale.
  *
  * Usage: ScaleChecksum <sfDir> <key> [key ...]
  * Env: SPARK_GRAFT_CPUS, SPARK_DRIVER_MEM (via tools/run_graft.sh)
  */
object ScaleChecksum {

  val A1 = 2654435761L; val M1 = 1000000007L
  val A2 = 40503L;      val M2 = 998244353L

  /** Columns a key fingerprints: `gate` are exact (integer/string)
    * terms in Horner order; `float` is the optional 1e-6-scaled
    * column for the separate float fingerprint; `part` is the
    * row-derived partial key (bounded by data, not planner geometry —
    * see ChecksumVerify's overflow note). */
  final case class Canon(gate: Seq[Column], float: Option[Column], part: Column)

  private def strHash(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** The fifth-decade t-pack keys. Column names match the oracle SQL
    * aliases (the sf0.01 gate enforces schema equality, so the same
    * names exist on both engines by construction). */
  val canon: Map[String, Canon] = Map(
    "t6_tfidf" -> Canon(
      gate = Seq(col("doc_id"), strHash(col("term")), col("tf"),
        col("df"), col("rk")),
      float = Some(col("tfidf")),
      part = col("doc_id")),
    "t11_novelty" -> Canon(
      gate = Seq(col("doc_id"), col("n_bigrams"), col("novel_bigrams")),
      float = Some(col("novelty_ratio")),
      part = col("doc_id")))

  private def horner(cols: Seq[Column], a: Long, m: Long): Column =
    cols.foldLeft(lit(0L)) { (h, c) =>
      (h * lit(a) + pmod(c.cast("long"), lit(m))) % lit(m)
    }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleChecksum <sfDir> <key> [key ...]")
    val sfDir = args(0)
    val keys = args.drop(1).toSeq
    val unknown = keys.filterNot(canon.contains)
    require(unknown.isEmpty, s"no canonical fingerprint for: ${unknown.mkString(",")}")
    val spark = GraftSession.local("graft-scale-checksum")
    spark.sparkContext.setLogLevel("ERROR")
    for (key <- keys) {
      val c = canon(key)
      val t0 = System.nanoTime()
      val df: DataFrame = SparkEntry.queries(key)(spark, sfDir)
      val floatTerm = c.float.map(f =>
        pmod(round(f * lit(1000000L)).cast("long"), lit(M1)))
      val rows = df.select(
        horner(c.gate, A1, M1).as("t1"),
        horner(c.gate, A2, M2).as("t2"),
        floatTerm.getOrElse(lit(0L)).as("tf6"),
        pmod(c.part.cast("long"), lit(131072L)).as("g"))
      val r = rows
        .groupBy(col("g"))
        .agg(count(lit(1)).as("n"), sum("t1").as("s1"), sum("t2").as("s2"),
          sum("tf6").as("sf6"))
        .select(
          sum("n").as("n"), max("n").as("max_group"),
          sum(col("s1").cast("decimal(38,0)")).as("fp1"),
          sum(col("s2").cast("decimal(38,0)")).as("fp2"),
          sum(col("sf6").cast("decimal(38,0)")).as("fpf"))
        .first()
      require(r.getLong(1) < 4300000000L,
        s"per-group partial of ${r.getLong(1)} rows risks BIGINT overflow — " +
          "widen the partial key modulus")
      val sec = (System.nanoTime() - t0) / 1e9
      println(s"""{"query":"$key","engine":"graft","sf_dir":"$sfDir",""" +
        s""""n":${r.getLong(0)},"fp1":"${r.getDecimal(2)}","fp2":"${r.getDecimal(3)}",""" +
        s""""fpf":"${r.getDecimal(4)}","sec":${Fmt.dec(sec)}}""")
    }
    spark.stop()
  }
}
