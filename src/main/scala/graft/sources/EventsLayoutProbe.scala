package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}

/** Events-table layout receipt (round 14): q31/q32's only fact-sized
  * shuffle is the distinct() over (user_id, day|week) pairs. On a
  * user_id-bucketed events table that Exchange VANISHES — bucket
  * partitioning on user_id satisfies the distinct's clustered
  * distribution (user_id is a prefix of the grouping key), and the
  * downstream per-user aggregate rides the same partitioning — so the
  * whole pipeline runs with ZERO fact-sized shuffles: the only
  * Exchanges left carry calendar-bounded day/cohort rows. This is the
  * layout a production event store maintains anyway (user-keyed
  * ingest, point lookup); the probe measures what the events-pack perf
  * flags cost ONLY because the gate reads flat parquet.
  *
  * Protocol (mirrors [[BucketProbe]]): write the scaled events twice
  * (flat parquet vs user_id-bucketed table), pin the plan deltas with
  * AQE off, assert results hash-identical, interleaved timing median
  * of N. Usage: EventsLayoutProbe [sf_dir]; GRAFT_BENCH_RUNS=N.
  */
object EventsLayoutProbe {

  val Buckets = 32

  private def shuffles(df: DataFrame): Seq[ShuffleExchangeLike] =
    df.queryExecution.executedPlan.collect { case s: ShuffleExchangeLike => s }

  private def resultHash(df: DataFrame, cols: String*): Long =
    df.selectExpr(s"sum(hash(${cols.mkString(", ")}))").first().getLong(0)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("scale_sf10")
    val runs = sys.env.get("GRAFT_BENCH_RUNS").map(_.toInt).getOrElse(5)
    val spark = GraftSession.local("graft-events-layout-probe")
    spark.sparkContext.setLogLevel("ERROR")

    val flat = Tables(spark, sfDir, "events")
    spark.sql("DROP TABLE IF EXISTS graft_events_bucketed")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), "graft_events_bucketed")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    val tWrite0 = System.nanoTime()
    Bucketed.writeBucketed(flat.select(col("user_id"), col("ts")),
      "graft_events_bucketed", "user_id", Buckets)
    val writeSec = (System.nanoTime() - tWrite0) / 1e9
    val bucketed = spark.table("graft_events_bucketed")
    println(s"[setup] bucketed write ${graft.Fmt.dec(writeSec)} s ($Buckets buckets)")

    import graft.ops.Relational
    val forms: Seq[(String, DataFrame => DataFrame)] = Seq(
      "q31_sliding_dau" -> (Relational.slidingDau _),
      "q32_retention" -> (Relational.retention _))

    // ---- plan pins (AQE off — PlanAudit's convention): on the
    // bucketed layout NO shuffle may carry user_id (the fact-sized
    // distinct + per-user aggregate both read bucket partitioning);
    // the flat layout must show the user_id Exchange as the control.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    forms.foreach { case (name, f) =>
      def stats(d: DataFrame) = {
        val sh = shuffles(f(d))
        (sh.size, sh.count(_.output.exists(_.name == "user_id")))
      }
      val ((fn, fu), (bn, bu)) = (stats(flat), stats(bucketed))
      println(s"[plan] $name flat: $fn shuffles ($fu carrying user_id); " +
        s"bucketed: $bn shuffles ($bu carrying user_id)")
      require(fu >= 1, s"control: flat $name must shuffle on user_id")
      require(bu == 0,
        s"bucketed $name must not shuffle user_id — the distinct reads bucket partitioning")
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    // ---- result equality ----
    require(resultHash(Relational.slidingDau(flat), "day", "dau7") ==
      resultHash(Relational.slidingDau(bucketed), "day", "dau7"),
      "q31 results differ between layouts")
    require(resultHash(Relational.retention(flat),
        "cohort_week", "week_offset", "n_users") ==
      resultHash(Relational.retention(bucketed),
        "cohort_week", "week_offset", "n_users"),
      "q32 results differ between layouts")

    // ---- interleaved timing, median of N ----
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val layouts: Seq[(String, DataFrame)] = Seq("flat" -> flat, "bucketed" -> bucketed)
    forms.foreach { case (_, f) =>
      layouts.foreach { case (_, d) =>
        f(d).write.mode("overwrite").format("noop").save()
      }
    }
    val times = scala.collection.mutable.Map[(String, String), List[Double]]()
      .withDefaultValue(Nil)
    (1 to runs).foreach { _ =>
      forms.foreach { case (qname, f) =>
        layouts.foreach { case (lname, d) =>
          times((qname, lname)) ::=
            time(f(d).write.mode("overwrite").format("noop").save())
        }
      }
    }
    forms.foreach { case (qname, _) =>
      val line = layouts.map { case (lname, _) =>
        val ts = times((qname, lname)).sorted
        s"$lname=${graft.Fmt.dec(ts(ts.size / 2))} s"
      }.mkString("  ")
      println(s"[time] $qname  $line  (median of $runs)")
    }
    spark.sql("DROP TABLE IF EXISTS graft_events_bucketed")
    spark.stop()
  }
}
