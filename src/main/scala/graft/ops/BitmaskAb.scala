package graft.ops

import org.apache.spark.sql.DataFrame

import graft.{GraftSession, Tables}

/** A/B probe for the r16 blocked (arbitrary-span) bitmask forms of
  * q31/q32 vs the r15 single-word forms they generalize.
  *
  * The single-word forms are exact only under span guards (global day
  * span ≤ 57 for q31; per-user week span < 64 for q32) and loud-fail
  * beyond them; the blocked forms key the same Long bit_or aggregate by
  * (user, word) and are exact at ANY span. This probe answers the only
  * question that decides which one ships: does the blocked form pay a
  * measurable premium on the guarded corpora where both are exact?
  * Results are asserted hash-identical before timing; interleaved
  * timing, median of GRAFT_BENCH_RUNS (default 5).
  *
  * Usage: BitmaskAb [sf_dir]
  */
object BitmaskAb {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("scale_sf10")
    val runs = sys.env.get("GRAFT_BENCH_RUNS").map(_.toInt).getOrElse(5)
    val spark = GraftSession.local("graft-bitmask-ab")
    spark.sparkContext.setLogLevel("ERROR")
    val events = Tables(spark, sfDir, "events")

    val packs: Seq[(String, Seq[String], Seq[(String, DataFrame => DataFrame)])] = Seq(
      ("q31", Seq("day", "dau7"), Seq(
        "single_word" -> (Relational.slidingDauSingleWord _),
        "blocked" -> (Relational.slidingDau _))),
      ("q32", Seq("cohort_week", "week_offset", "n_users"), Seq(
        "single_word" -> (Relational.retentionSingleWord _),
        "blocked" -> (Relational.retention _))))

    def hash(df: DataFrame, cols: Seq[String]): (Long, Long) = {
      val r = df.selectExpr("count(*)", s"sum(hash(${cols.mkString(", ")}))").first()
      (r.getLong(0), r.getLong(1))
    }
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    packs.foreach { case (q, cols, forms) =>
      val hashes = forms.map { case (n, f) => n -> hash(f(events), cols) }
      require(hashes.map(_._2).distinct.size == 1, s"$q forms disagree: $hashes")
      forms.foreach { case (_, f) =>
        f(events).write.mode("overwrite").format("noop").save() // warm
      }
      val times = scala.collection.mutable.Map[String, List[Double]]()
        .withDefaultValue(Nil)
      (1 to runs).foreach { _ =>
        forms.foreach { case (name, f) =>
          times(name) ::= time(f(events).write.mode("overwrite").format("noop").save())
        }
      }
      val line = forms.map { case (name, _) =>
        val ts = times(name).sorted
        s"$name=${graft.Fmt.dec(ts(ts.size / 2))} s [${ts.map(graft.Fmt.dec(_)).mkString(",")}]"
      }.mkString("  ")
      println(s"[ab] $q rows=${hashes.head._2._1}  $line  (median of $runs)")
    }
    spark.stop()
  }
}
