package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

/** Exact discrete quantiles over an UNBOUNDED value domain (R27).
  *
  * q22's exact median exploits a bounded integer domain (value-frequency
  * counting). This operator removes that precondition with the two-pass
  * histogram shape: no global sort, no per-group sort of the fact table,
  * and the driver only ever holds histogram counts — never data rows.
  *
  *  - Pass 1 (engine-side): per-group [min, max], broadcast back onto the
  *    fact to assign each row a fixed-width bin index. The histogram
  *    aggregate is the only fact-sized shuffle and it is map-side
  *    combined — the Exchange carries (group, bin, count) partials,
  *    bounded by |groups| × bins regardless of corpus size.
  *  - Driver: walks the cumulative histogram (|groups| × bins scalars,
  *    the operator's bounded-collect contract) and locates, for each
  *    requested quantile, its candidate bin and the rank remaining
  *    within that bin.
  *  - Pass 2: rows of candidate bins ONLY (≈ 1/bins of each group) are
  *    re-aggregated by exact value (q22-style value-frequency), and a
  *    cumulative window per (group, quantile) selects the k-th smallest
  *    element. Selection, not interpolation: the result is an element of
  *    the input, so the answer is bit-exact across engines.
  *
  * Rank semantics match DuckDB's `quantile_disc` (inverse ECDF):
  * k = max(1, ceil(q·n)). Callers should pass quantiles that are exactly
  * representable doubles (0.25, 0.5, 0.75, …) so ceil(q·n) is the same
  * integer in every engine; 0.95·n style products can straddle an
  * integer boundary differently per engine.
  *
  * At 100 TB: pass 2's window partitions hold the distinct values of one
  * histogram bin (≤ group_rows / bins — raise `bins` to tighten; 8192
  * keeps a 10^12-row group's bin near 10^8 rows, and a second refinement
  * round could be added for pathological single-bin pileups).
  */
object Quantile {

  /** Hard ceiling on driver-held histogram cells (≤ |groups| × bins).
    * 4M cells ≈ tens of MB of Row objects — comfortably inside any
    * driver. With the default 8192 bins this admits ~500 groups; a
    * higher-cardinality group column must either lower `bins` or raise
    * `maxDriverCells` explicitly (an informed opt-in, not a silent OOM). */
  val DefaultMaxDriverCells: Int = 4 * 1000 * 1000

  /** Group-cardinality ceiling for the inlined-literal bin/filter forms.
    * Measured, not assumed (QuantileFallbackBench, sf10, 10M rows,
    * round 14): inline wins through 32 groups (4.1 s vs broadcast's
    * ~3 s amortized floor) but DEGRADES ~7× at 64 (22.9 s vs 2.7 s for
    * the broadcast form at 65) — a 64-deep per-row when-ladder blows
    * the JIT/codegen budget long before Spark formally splits the
    * stage. The r12 default of 64 was set by codegen-split reasoning
    * alone; the bench moved it to the measured crossover. */
  val MaxInlineGroups: Int = 32

  def exactQuantiles(df: DataFrame, groupCol: String, valCol: String,
                     qs: Seq[Double], bins: Int = 8192,
                     maxDriverCells: Int = DefaultMaxDriverCells): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles must be in (0, 1], got $qs")
    require(maxDriverCells > 0, s"maxDriverCells must be positive, got $maxDriverCells")
    val spark = df.sparkSession

    // g.isNotNull is load-bearing for BOTH physical forms (r13 advisor
    // fix): the broadcast-join form drops null-group rows implicitly
    // (inner join on g), but the inline when-ladder's `g === lit(...)`
    // evaluates NULL for a null g, falls through to the NaN default,
    // and floor(NaN).cast(long) THROWS under the sessions' ANSI-default
    // mode — failing the whole query whenever |groups| ≤ MaxInlineGroups
    // and the group column contains nulls. Filtering here makes the two
    // forms exclude null-group rows identically.
    val base = df
      .select(col(groupCol).as("g"), col(valCol).cast("double").as("v"))
      .filter(col("v").isNotNull && col("g").isNotNull)
    val ext = base.groupBy(col("g"))
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
    // The per-group ranges are driver-bounded by the SAME contract as
    // the histogram (every group owns ≥1 histogram cell, so |groups| ≤
    // |cells| ≤ maxDriverCells) — collect them once, enforced.
    val extRows = ext.limit(maxDriverCells + 1).collect()
    require(extRows.length <= maxDriverCells,
      s"exactQuantiles: group cardinality exceeds the driver-collect " +
        s"bound (> $maxDriverCells groups). Lower `bins`, raise " +
        s"`maxDriverCells` explicitly, or pre-aggregate '$groupCol'.")
    // Bin assignment. Two physically different forms of the same
    // arithmetic, chosen by group cardinality (r12, measured at sf10):
    //  - ≤ MaxInlineGroups: the collected ranges are INLINED as a
    //    when-ladder of literals — pure codegen'd arithmetic on the
    //    scan, no join. The broadcast hash join this replaces cost ~5 s
    //    of q27's 12 s at 60M rows (row materialization on every fact
    //    row for a 3-row build side); the ladder form runs the same
    //    histogram in 1.2 s.
    //  - above that (ladder depth would strain codegen): the original
    //    broadcast join — same plan shape as before, still bounded.
    // Degenerate all-equal groups (hi == lo) collapse to bin 0; the max
    // value lands exactly on the upper fence, so clamp to bins-1.
    val inline = extRows.length <= MaxInlineGroups
    val withBin =
      if (inline) {
        val loL = extRows.foldLeft(lit(Double.NaN)) { (acc, r) =>
          when(col("g") === lit(r.get(0)), lit(r.getDouble(1))).otherwise(acc) }
        val wL = extRows.foldLeft(lit(Double.NaN)) { (acc, r) =>
          val w = (r.getDouble(2) - r.getDouble(1)) / bins
          // width 1.0 for degenerate groups: (v - lo) / 1 = 0 for every
          // member row (v == lo), reproducing the bin-0 collapse
          when(col("g") === lit(r.get(0)), lit(if (w == 0.0) 1.0 else w)).otherwise(acc) }
        base.select(col("g"), col("v"),
          least(floor((col("v") - loL) / wL).cast("long"), lit(bins - 1L)).as("bin"))
      } else {
        val width = (col("hi") - col("lo")) / bins
        val binExpr = when(col("hi") === col("lo"), lit(0L))
          .otherwise(least(floor((col("v") - col("lo")) / width).cast("long"),
            lit(bins - 1L)))
        base.join(broadcast(ext), "g")
          .select(col("g"), col("v"), binExpr.as("bin"))
      }

    // the only fact-sized aggregate; bounded output, bounded collect.
    // The limit(cap+1) ENFORCES the bounded-collect contract: the driver
    // never fetches more than maxDriverCells+1 rows even when the group
    // column turns out to be high-cardinality — it fails loudly instead
    // of OOMing the driver.
    val hist = withBin.groupBy(col("g"), col("bin")).agg(count(lit(1)).as("c"))
    val gField = hist.schema.head
    val histRows = hist.limit(maxDriverCells + 1).collect()
    require(histRows.length <= maxDriverCells,
      s"exactQuantiles: histogram exceeds the driver-collect bound " +
        s"(> $maxDriverCells (group, bin) cells with bins=$bins). The group " +
        s"column '$groupCol' is too high-cardinality for this operator's " +
        s"contract — lower `bins`, raise `maxDriverCells` explicitly, or " +
        s"pre-aggregate the group column.")
    val byGroup = histRows.groupBy(_.get(0))

    // driver: candidate bin + rank-within-bin per (group, quantile)
    val specRows = byGroup.iterator.flatMap { case (gVal, rows) =>
      val sorted = rows.map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
      val n = sorted.map(_._2).sum
      qs.map { q =>
        var k = math.max(1L, math.ceil(q * n).toLong) // inverse ECDF rank
        val (bin, kIn) = {
          var i = 0
          while (k > sorted(i)._2) { k -= sorted(i)._2; i += 1 }
          (sorted(i)._1, k)
        }
        Row(gVal, q, bin, kIn)
      }
    }.toSeq
    val spec = spark.createDataFrame(
      spark.sparkContext.parallelize(specRows, 1),
      StructType(Seq(gField.copy(name = "g"), StructField("q", DoubleType),
        StructField("bin", LongType), StructField("k_in", LongType))))

    // pass 2: candidate-bin rows only → value-frequency → rank select.
    // The selection is a sorted-array fold per (group, quantile) rather
    // than a cumulative window: the (value, count) list is bounded by
    // one bin's distinct values (the operator contract), and the fold
    // drops the window's extra Exchange + sort — two shuffle waves
    // total, both map-side combined. The HOF runs post-aggregate on
    // bounded data, so interpretation cost is nil.
    val sel = aggregate(
      array_sort(collect_list(struct(col("v"), col("c")))),
      struct(lit(0L).as("cum"), lit(null).cast("double").as("ans")),
      (acc, x) => struct(
        (acc.getField("cum") + x.getField("c")).as("cum"),
        when(acc.getField("ans").isNull &&
            acc.getField("cum") + x.getField("c") >= col("k_in"), x.getField("v"))
          .otherwise(acc.getField("ans")).as("ans")),
      acc => acc.getField("ans"))
    // Inline path: pre-filter to candidate bins with the same literal
    // ladder trick (each group has ≤ |qs| candidate bins) so the
    // broadcast join probes ~rows/bins survivors instead of paying the
    // per-row join tax on the full fact a second time.
    val probe =
      if (inline) {
        val candByG = specRows.groupBy(_.get(0)).view
          .mapValues(_.map(_.getLong(2)).distinct).toMap
        val candFilter = candByG.foldLeft(lit(false)) { case (acc, (gVal, bs)) =>
          when(col("g") === lit(gVal), col("bin").isInCollection(bs)).otherwise(acc) }
        withBin.filter(candFilter)
      } else withBin
    probe
      .join(broadcast(spec), Seq("g", "bin"))
      .groupBy(col("g"), col("q"), col("k_in"), col("v"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("g"), col("q"), col("k_in"))
      .agg(sel.as("qval"))
      .select(col("g"), col("q"), col("qval"))
  }
}
