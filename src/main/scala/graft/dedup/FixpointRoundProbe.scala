package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Plan + cost receipt for the connected-components fixpoint round
  * (optimization round 18). The gate queries d6/d8/d10 construct their
  * label fixpoint EAGERLY (each round is checkpointed), so
  * `graft.Explain` on the final DataFrame only shows a scan of
  * checkpoint blocks — the per-round plan the fixpoint actually pays
  * never appears in a query explain. This probe runs ONE contraction
  * round over the REAL candidate graph of the given SF dir in both
  * forms — the r17 expression (inlined verbatim below) and the current
  * [[Dedup.starRound]] — and prints each one's FINAL adaptive plan
  * (ReusedExchange visible) plus same-window wall times. Both forms are
  * executed against the same checkpointed edge relation, warm, in one
  * JVM, alternating A/B/A/B.
  *
  * Usage: runMain graft.dedup.FixpointRoundProbe [sfDir] [runsPerForm]
  */
object FixpointRoundProbe {

  /** The r17 round expression, verbatim (two Exchanges per star phase,
    * large-star subtree duplicated under small-star's consumers,
    * intermediate ls.distinct()) — kept here as the probe's A side. */
  private def legacyRound(edges: DataFrame): DataFrame = {
    val sym = edges.select(col("hi").as("u"), col("lo").as("v"))
      .union(edges.select(col("lo").as("u"), col("hi").as("v")))
    val mins = sym.groupBy(col("u")).agg(min(col("v")).as("mn"))
      .select(col("u"), least(col("u"), col("mn")).as("m"))
    val ls = sym.filter(col("v") > col("u"))
      .join(mins, "u")
      .select(col("v").as("hi"), col("m").as("lo"))
      .distinct()
    val smins = ls.groupBy(col("hi")).agg(min(col("lo")).as("m"))
    ls.join(smins, "hi")
      .select(col("lo").as("n"), col("m"))
      .union(smins.select(col("hi").as("n"), col("m")))
      .filter(col("n") =!= col("m"))
      .select(col("n").as("hi"), col("m").as("lo"))
      .distinct()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val runs = if (args.length > 1) args(1).toInt else 5
    val spark = graft.GraftSession.local("graft-fixpoint-probe")
    spark.sparkContext.setLogLevel("ERROR")
    val pairs = DedupQueries.d2MinhashPairs(spark, sfDir)
    // canonical oriented edge set, materialized exactly as the fixpoint does
    val (edges, _) = Dedup.checkpointedByMode(
      pairs.select(greatest(col("a"), col("b")).as("hi"),
          least(col("a"), col("b")).as("lo"))
        .filter(col("hi") =!= col("lo")).distinct())
    println(s"edges: ${edges.count()} rows ($sfDir)")

    def time(fn: => DataFrame): (DataFrame, Double) = {
      val t0 = System.nanoTime()
      val df = fn
      df.write.mode("overwrite").format("noop").save()
      (df, (System.nanoTime() - t0) / 1e9)
    }
    // warmup both
    time(legacyRound(edges)); time(Dedup.starRound(edges))
    val samples = (1 to runs).map { _ =>
      (time(legacyRound(edges))._2, time(Dedup.starRound(edges))._2)
    }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    val (a, b) = (med(samples.map(_._1)), med(samples.map(_._2)))
    println(f"legacy round median:   $a%.3f s over $runs runs")
    println(f"starRound median:      $b%.3f s over $runs runs (${b / a}%.2fx)")

    // FINAL adaptive plans: execute the Dataset itself so its own
    // QueryExecution finalizes. foreach(_ => ()) materializes every row
    // ON THE EXECUTORS and discards it — unlike the r18 collect(), the
    // graph-sized round output never lands on the driver (r18 advisory:
    // pointing the probe at a big SF dir could OOM the driver). A noop
    // write would not do here: it plans its OWN QueryExecution, leaving
    // this Dataset's adaptive plan unfinalized.
    val legacyDf = legacyRound(edges); legacyDf.foreach(_ => ())
    println("==== LEGACY round, final adaptive plan ====")
    legacyDf.explain("formatted")
    val newDf = Dedup.starRound(edges); newDf.foreach(_ => ())
    println("==== starRound (current), final adaptive plan ====")
    newDf.explain("formatted")
    spark.stop()
  }
}
