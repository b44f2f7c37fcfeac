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

  def exactQuantiles(df: DataFrame, groupCol: String, valCol: String,
                     qs: Seq[Double], bins: Int = 8192,
                     maxDriverCells: Int = DefaultMaxDriverCells): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles must be in (0, 1], got $qs")
    require(maxDriverCells > 0, s"maxDriverCells must be positive, got $maxDriverCells")
    val spark = df.sparkSession

    val base = df
      .select(col(groupCol).as("g"), col(valCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
    val ext = base.groupBy(col("g"))
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
    // degenerate all-equal groups (hi == lo) collapse to bin 0; the max
    // value lands exactly on the upper fence, so clamp to bins-1
    val width = (col("hi") - col("lo")) / bins
    val binExpr = when(col("hi") === col("lo"), lit(0L))
      .otherwise(least(floor((col("v") - col("lo")) / width).cast("long"), lit(bins - 1L)))
    val withBin = base.join(broadcast(ext), "g")
      .select(col("g"), col("v"), binExpr.as("bin"))

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
    withBin
      .join(broadcast(spec), Seq("g", "bin"))
      .groupBy(col("g"), col("q"), col("k_in"), col("v"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("g"), col("q"), col("k_in"))
      .agg(sel.as("qval"))
      .select(col("g"), col("q"), col("qval"))
  }
}
