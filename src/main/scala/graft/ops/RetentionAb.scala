package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}

/** A/B probe for q32_retention's aggregate shape (round 14).
  *
  * The production form feeds the deduped (user, week) pairs into
  * `collect_set` — an ObjectHashAggregate, outside whole-stage codegen
  * — only to derive cohort = array_min(weeks) and re-explode. The
  * candidate derives the cohort with a codegen'd hash aggregate
  * (groupBy(user).min(week), partial-aggregated to one row per user
  * map-side) and joins it back to the pairs: same Exchange count (the
  * pair set is already user-clustered after the distinct, and
  * ReuseExchange shares the scan), but every operator stays in
  * codegen. Results are asserted identical before timing.
  */
object RetentionAb {

  /** Candidate: cohort via hash-agg min + join, no object aggregate. */
  def retentionMinJoin(events: DataFrame): DataFrame = {
    val pairs = events
      .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("week"))
      .distinct()
    val cohorts = pairs.groupBy(col("user_id")).agg(min(col("week")).as("cohort"))
    pairs.join(cohorts, "user_id")
      .groupBy(col("cohort"),
        (datediff(col("week"), col("cohort")) / 7).cast("long").as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_week"),
        col("week_offset"), col("n_users"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("scale_sf10")
    val runs = sys.env.get("GRAFT_BENCH_RUNS").map(_.toInt).getOrElse(3)
    val spark = GraftSession.local("graft-retention-ab")
    spark.sparkContext.setLogLevel("ERROR")
    val events = Tables(spark, sfDir, "events")

    val forms: Seq[(String, DataFrame => DataFrame)] = Seq(
      "collect_set" -> (Relational.retentionCollectSet _),
      "min_join" -> (retentionMinJoin _),
      "bitmask_1word" -> (Relational.retentionSingleWord _),
      "bitmask_blocked" -> (Relational.retention _))

    def hash(df: DataFrame): Long = df
      .selectExpr("sum(hash(cohort_week, week_offset, n_users))").first().getLong(0)
    val hashes = forms.map { case (n, f) => n -> hash(f(events)) }
    require(hashes.map(_._2).distinct.size == 1,
      s"forms disagree: $hashes")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    forms.foreach { case (_, f) =>
      f(events).write.mode("overwrite").format("noop").save()  // warm
    }
    val times = scala.collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
    (1 to runs).foreach { _ =>
      forms.foreach { case (name, f) =>
        times(name) ::= time(f(events).write.mode("overwrite").format("noop").save())
      }
    }
    forms.foreach { case (name, _) =>
      val ts = times(name).sorted
      println(s"[ab] $name median=${graft.Fmt.dec(ts(ts.size / 2))} s all=" +
        ts.map(graft.Fmt.dec(_)).mkString(","))
    }
    spark.stop()
  }
}
