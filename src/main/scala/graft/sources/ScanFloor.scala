package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}

/** Parquet-reader floor probe (round 15, verdict item: re-pin the
  * q1/q15 sf100 dispositions with a measured scan receipt).
  *
  * Times "read the SAME columns the query reads, do almost nothing"
  * plans so the reader cost is isolated from the aggregate cost:
  *
  *  - `lineitem_floor` reads q1's seven columns and computes one
  *    count + one sum — if this floor is within ~20% of q1's full
  *    time, q1 is reader-bound and its ratio vs an in-process
  *    columnar engine is a local-mode constant, not a plan defect.
  *  - `events_floor` reads q15's three columns likewise.
  *  - `lineitem_2col` / `events_1col` read a narrow projection as the
  *    control: a floor that does NOT drop when columns drop would
  *    mean the cost is row-group overhead, not bytes.
  *
  * Protocol mirrors the other probes: warm pass, median of N
  * interleaved runs, noop sink. Usage: ScanFloor [sf_dir];
  * GRAFT_BENCH_RUNS=N, SPARK_GRAFT_CPUS=32.
  */
object ScanFloor {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("scale_sf100")
    val runs = sys.env.get("GRAFT_BENCH_RUNS").map(_.toInt).getOrElse(5)
    val spark = GraftSession.local("graft-scan-floor")
    spark.sparkContext.setLogLevel("ERROR")

    val li = Tables(spark, sfDir, "lineitem")
    val ev = Tables(spark, sfDir, "events")

    val probes: Seq[(String, () => DataFrame)] = Seq(
      "lineitem_floor" -> (() => li
        .select(col("l_shipdate"), col("l_returnflag"), col("l_linestatus"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("s"))),
      "lineitem_2col" -> (() => li
        .select(col("l_quantity"), col("l_discount"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("s"))),
      "events_floor" -> (() => ev
        .select(col("ts"), col("event_type"), col("value"))
        // mod keeps the per-row timestamp op (q15's div class) without
        // overflowing the Long sum at 100M rows of ~1.7e18 micros
        .agg(count(lit(1)).as("n"),
          sum(unix_micros(col("ts")) % lit(3600000000L)).as("s"),
          sum(col("value")).as("v"))),
      "events_1col" -> (() => ev
        .select(col("value"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))))

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    probes.foreach { case (_, f) => f().write.mode("overwrite").format("noop").save() }
    val times = scala.collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
    (1 to runs).foreach { _ =>
      probes.foreach { case (name, f) =>
        times(name) ::= time(f().write.mode("overwrite").format("noop").save())
      }
    }
    probes.foreach { case (name, _) =>
      val ts = times(name).sorted
      println(s"[floor] $name median=${graft.Fmt.dec(ts(ts.size / 2))} s all=" +
        ts.map(graft.Fmt.dec(_)).mkString(","))
    }
    spark.stop()
  }
}
