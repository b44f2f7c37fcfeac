package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Wide-input micro-probe for the interpreted-HOF audit (optimization
  * round 19, r18 verdict item 6). The r18 round found one asymptotic
  * defect hiding inside a HOF lambda (array_sort re-evaluated under
  * slice); this probe prices the remaining HOF sites that sit on
  * data-sized relations, interleaved same-JVM old/new:
  *
  *   1. [[Dedup.estimatedJaccard]] — evaluated once per band-join match
  *      on d9's probe path (and the streaming index probes). Old form:
  *      aggregate(zip_with(...)) — CodegenFallback, per-element lambda
  *      dispatch. New form (round 19): numHashes static GetArrayItem
  *      comparisons — whole-stage codegen.
  *   2. The ST6 nearDupKey row-local minhash ladder
  *      (shingleBaseHashes → minhashFromBase): numHashes+1 interpreted
  *      transforms per row. Measured to price the documented
  *      off-hot-path disposition, not to change it (the streaming key
  *      has no aggregate to hand the work to).
  *
  * Usage: runMain graft.dedup.HofProbe [rows] [runs]
  */
object HofProbe {

  /** The pre-r19 estimatedJaccard, verbatim — the probe's A side. */
  private def estimatedJaccardHof(a: Column, b: Column, numHashes: Int): Column =
    aggregate(zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v).cast("double") / numHashes

  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(2000000L)
    val runs = if (args.length > 1) args(1).toInt else 5
    val spark = graft.GraftSession.local("graft-hof-probe")
    spark.sparkContext.setLogLevel("ERROR")
    val n = DedupQueries.NumHashes

    // synthetic signature pairs: deterministic, ~half the components
    // equal per pair, materialized so the probe times the expression,
    // not the generator
    val sig = (salt: Int) => array((0 until n).map { i =>
      when(lit((i + salt) % 2 == 0), col("id") * (2 * i + 1) % 1000)
        .otherwise((col("id") * (3 * i + salt + 1) + salt) % 1000)
    }: _*)
    val base = spark.range(rows)
      .select(col("id"), sig(0).as("sa"), sig(1).as("sb"))
      .localCheckpoint()

    def time(c: Column): Double = {
      val t0 = System.nanoTime()
      base.select(c.as("est")).write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    val oldC = estimatedJaccardHof(col("sa"), col("sb"), n)
    val newC = Dedup.estimatedJaccard(col("sa"), col("sb"), n)
    // equality first: the unroll must be value-identical
    val diff = base.select(oldC.as("o"), newC.as("m"))
      .filter(col("o") =!= col("m")).count()
    println(s"[hof-probe] estimatedJaccard old-vs-new diff rows: $diff of $rows")
    time(oldC); time(newC) // warm both
    val samples = (1 to runs).map(_ => (time(oldC), time(newC)))
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    val (a, b) = (med(samples.map(_._1)), med(samples.map(_._2)))
    println(f"[hof-probe] estimatedJaccard HOF form:      $a%.3f s median of $runs ($rows rows)")
    println(f"[hof-probe] estimatedJaccard unrolled form: $b%.3f s median of $runs (${b / a}%.2fx)")

    // ST6 nearDupKey ladder: per-row cost on synthetic text (docs-free
    // so the probe needs no SF dir); ~60 tokens/row
    val text = concat_ws(" ", (0 until 60).map(i =>
      concat(lit(s"w$i"), (col("id") * (i + 3)) % 50)): _*)
    val docs = spark.range(rows / 20).select(text.as("text")).localCheckpoint()
    def timeKey(): Double = {
      val t0 = System.nanoTime()
      docs.select(graft.streaming.Streaming.nearDupKey(col("text")).as("k"))
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    timeKey()
    val kMed = med((1 to runs).map(_ => timeKey()))
    println(f"[hof-probe] ST6 nearDupKey ladder: $kMed%.3f s median of $runs " +
      f"(${rows / 20} rows, ${kMed * 1e9 / (rows / 20)}%.0f ns/row)")
    spark.stop()
  }
}
