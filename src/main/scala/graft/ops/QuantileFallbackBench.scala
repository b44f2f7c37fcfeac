package graft.ops

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}

/** The q27 cold-path receipt (round 14): [[Quantile.exactQuantiles]]
  * switches physical form at [[Quantile.MaxInlineGroups]] (64) — below,
  * the collected per-group ranges inline as a codegen'd literal ladder;
  * above, the original broadcast-join form runs. The gate's q27 always
  * takes the inline path (few groups), so the fallback's cost at scale
  * was untested. This sweep times BOTH forms across the boundary on the
  * same data: events.value grouped by pmod(user_id, G) for G on either
  * side of 64, median-of-N per point.
  *
  * Usage: QuantileFallbackBench <sfDir> [groups=8,32,64,65,128,256]
  * Env: GRAFT_BENCH_RUNS (default 3).
  */
object QuantileFallbackBench {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("scale_sf10")
    val groupCounts = if (args.length > 1) args(1).split(",").map(_.trim.toInt).toSeq
                      else Seq(8, 32, 64, 65, 128, 256)
    val runs = sys.env.get("GRAFT_BENCH_RUNS").map(_.toInt).getOrElse(3)
    val spark = GraftSession.local("graft-quantile-fallback-bench")
    spark.sparkContext.setLogLevel("ERROR")

    val events = Tables(spark, dir, "events")
      .select(col("user_id"), col("value")).cache()
    val n = events.count() // materialize once; the sweep times the operator
    println(s"""{"bench":"quantile_fallback","sf_dir":"$dir","rows":$n,"runs":$runs}""")

    for (g <- groupCounts) {
      val grouped = events.withColumn("grp", pmod(col("user_id"), lit(g.toLong)))
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        val r = Quantile.exactQuantiles(grouped, "grp", "value",
          Seq(0.25, 0.5, 0.75)).count()
        require(r == g * 3L, s"expected ${g * 3} rows, got $r")
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val form = if (g <= Quantile.MaxInlineGroups) "inline" else "broadcast"
      println(s"""{"groups":$g,"form":"$form","median_sec":${graft.Fmt.dec(times(times.size / 2), 3)},"all":[${times.map(graft.Fmt.dec(_, 3)).mkString(",")}]}""")
    }
    spark.stop()
  }
}
