package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** q5 join-strategy probe at scale (optimization round 19, r18 verdict
  * item 7): the r18 round declined shuffled-hash for q5 on a ~5%
  * sf0.1 measurement, but at 100 TB a fact⨝fact SMJ-vs-SHJ choice is a
  * spill-behavior question (guide §3.1/§5), not a 5% question — this
  * probe prices it at a data-dominated SF, interleaved same-JVM, with
  * each strategy QUERY-SCOPED (conf set around the run, restored
  * after; never session-wide):
  *
  *   smj  — the shipped plan (preferSortMergeJoin default true).
  *   shj  — spark.sql.join.preferSortMergeJoin=false; the planner may
  *          still keep SMJ if its size conditions
  *          (canBuildLocalHashMap/muchSmaller) fail — the probe prints
  *          the join operators actually planned so a vacuous A/B is
  *          visible.
  *   aqe  — spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold
  *          sized to the post-shuffle partition (AQE rewrites SMJ→SHJ
  *          at runtime per partition when the build side fits) — the
  *          production-preferred knob: per-partition, runtime-sized,
  *          no static estimate trusted.
  *
  * Usage: runMain graft.ops.ShjProbe [sfDir] [runs]
  */
object ShjProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = if (args.length > 1) args(1).toInt else 3
    val spark = graft.GraftSession.local("graft-shj-probe")
    spark.sparkContext.setLogLevel("ERROR")
    val conf = spark.conf

    def q5(): DataFrame = Relational.q5MultiJoin(spark, sfDir)

    def scoped[T](kvs: (String, String)*)(body: => T): T = {
      val saved = kvs.map { case (k, _) => k -> conf.getOption(k) }
      kvs.foreach { case (k, v) => conf.set(k, v) }
      try body
      finally saved.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None) => conf.unset(k)
      }
    }

    val forms: Seq[(String, Seq[(String, String)])] = Seq(
      "smj" -> Nil,
      "shj" -> Seq("spark.sql.join.preferSortMergeJoin" -> "false"),
      "aqe" -> Seq(
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold" -> "419430400"))

    def joinOps(df: DataFrame): String = {
      val plan = df.queryExecution.executedPlan.toString()
      Seq("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
        .map(j => s"$j=${j.r.findAllIn(plan).size}").mkString(" ")
    }
    // static join mix per form (the aqe form's rewrite is runtime-only,
    // so its static line matches smj — the wall clock is its receipt)
    forms.foreach { case (tag, kvs) =>
      scoped(kvs: _*)(println(s"[shj-probe] $tag static plan: ${joinOps(q5())}"))
    }
    // result equality across forms: strategies must not change values
    val rows = forms.map { case (tag, kvs) =>
      tag -> scoped(kvs: _*)(
        q5().orderBy(col("r_name"), col("n_name")).collect().toSeq)
    }
    require(rows.forall(_._2 == rows.head._2),
      "join-strategy variants disagree on q5's result")
    println(s"[shj-probe] all forms result-identical (${rows.head._2.size} rows)")

    def time(kvs: Seq[(String, String)]): Double = scoped(kvs: _*) {
      val t0 = System.nanoTime()
      q5().write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    forms.foreach { case (_, kvs) => time(kvs) } // warm all
    val samples = (1 to runs).map(_ => forms.map { case (tag, kvs) => tag -> time(kvs) })
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    forms.zipWithIndex.foreach { case ((tag, _), i) =>
      val m = med(samples.map(_(i)._2))
      println(f"[shj-probe] $tag%-4s median: $m%.3f s over $runs interleaved runs ($sfDir)")
    }
    spark.stop()
  }
}
