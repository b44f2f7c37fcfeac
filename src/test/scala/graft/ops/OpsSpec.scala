package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Semantics of the scale-technique operators (R18 salted join, R19
  * as-of join). */
class OpsSpec extends SparkTestBase {

  import spark.implicits._

  test("AQE splits a skewed shuffle-join partition at runtime (the non-rewrite skew path)") {
    // q18/q20 are the explicit-plan forms; this pins the THIRD skew tool
    // the docs point to — AQE's runtime skew-join split — by forcing the
    // detection thresholds down to toy scale and checking the final
    // adaptive plan actually split the hot partition.
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "2KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val old = confs.map { case (k, _) => k -> spark.conf.get(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // one pathological key (50k rows) beside 100 cold keys (10 each)
      val skewed = spark.range(50000).select(lit(0L).as("k"), col("id").as("payload"))
        .union(spark.range(1000).select((col("id") % 100 + 1).as("k"), col("id")))
      val dim = spark.range(101).select(col("id").as("k2"), (col("id") * 2).as("v"))
      val joined = skewed.join(dim, col("k") === col("k2"))
      // execute THIS dataset's plan (count() would build a different
      // query execution and leave this AdaptiveSparkPlan unfinalized)
      assert(joined.collect().length == 51000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true") && finalPlan.contains("skewed"),
        s"expected AQE to mark and split the skewed partition:\n$finalPlan")
    } finally old.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("R18: salted join result is identical to the plain join") {
    val li = graft.Tables(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
    val orders = graft.Tables(spark, sfDir, "orders")
      .select("o_orderkey", "o_orderpriority")
    val plain = li.join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val salted = SkewJoin.saltedEquiJoin(li, orders, "l_orderkey", "o_orderkey", 8)
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(plain == salted)
    assert(plain.nonEmpty)
  }

  test("R18: salt column does not leak into the output") {
    val out = SkewJoin.q18SaltedJoin(spark, sfDir)
    assert(!out.columns.contains("graft_salt"))
  }

  test("R20: hot-key salting matches plain join; only hot keys replicate") {
    val probe = (1 to 100).map(i => (if (i <= 60) 1L else i.toLong, i)).toDF("k", "v")
    val build = (1L to 100L).map(k => (k, s"p$k")).toDF("bk", "payload")
    val plain = probe.join(build, col("k") === col("bk"))
      .groupBy("k").agg(count(lit(1)).as("n")).as[(Long, Long)].collect().toMap
    val salted = SkewJoin.saltedHotKeyJoin(probe, build, "k", "bk",
      saltParts = 4, hotThreshold = 10)
      .groupBy("k").agg(count(lit(1)).as("n")).as[(Long, Long)].collect().toMap
    assert(salted == plain)
    assert(salted(1L) == 60)  // the hot key survives intact
  }

  test("R19: as-of picks the latest right row at-or-before each left time") {
    def ts(m: Long) = new Timestamp(m * 60000)
    val left = Seq((1L, ts(10), "a"), (1L, ts(30), "b"), (1L, ts(5), "c"), (2L, ts(10), "d"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, ts(8), 100.0), (1L, ts(10), 200.0), (1L, ts(25), 300.0))
      .toDF("k", "rt", "v")
      .select(col("k"), col("rt"), col("rt").as("m_t"), col("v").as("m_v"))
    val out = AsofJoin.asof(left, right.select("k", "rt", "m_t", "m_v"),
      "k", "t", "rt", Seq("m_t", "m_v"))
      .select(col("tag"), col("m_v")).collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("a").contains(200.0))  // ts(10): matches the ts(10) purchase (>= semantics)
    assert(out("b").contains(300.0))  // ts(30): latest is ts(25)
    assert(out("c").isEmpty)          // ts(5): nothing at or before
    assert(out("d").isEmpty)          // key 2: no right rows
  }

  test("R19: as-of join plan has no cartesian or range explosion") {
    val plan = AsofJoin.q19AsofJoin(spark, sfDir).queryExecution.sparkPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("P5: token-budget fill equals a driver-side global prefix scan (any bucket count)") {
    import spark.implicits._
    val docs = (1L to 200L).map(i => (i, (i % 17) + 1)).toDF("doc_id", "n_tokens")
    // driver-side reference: sort by the SAME deterministic hash, scan
    val ordered = docs
      .withColumn("h", graft.ops.Sampling.hashBucket(col("doc_id"), Int.MaxValue))
      .orderBy(col("h").asc, col("doc_id").asc)
      .select("doc_id", "n_tokens").as[(Long, Long)].collect()
    def reference(budget: Long): Seq[(Long, Long, Long)] = {
      var cum = 0L
      ordered.iterator.map { case (id, n) => cum += n; (id, n, cum) }
        .takeWhile(_._3 <= budget).toSeq
    }
    for (budget <- Seq(0L, 37L, 500L, 100000L); buckets <- Seq(1, 7, 64)) {
      val got = graft.ops.Sampling.tokenBudgetFill(docs, budget, buckets)
        .as[(Long, Long, Long)].collect().sortBy(_._3).toSeq
      assert(got == reference(budget), s"budget=$budget buckets=$buckets")
    }
    // budget >= total selects everything; budget 0 selects nothing
    assert(graft.ops.Sampling.tokenBudgetFill(docs, 100000L).count() == 200)
    assert(graft.ops.Sampling.tokenBudgetFill(docs, 0L).count() == 0)
  }

  test("R25: binned range join equals the naive point-in-interval join") {
    import spark.implicits._
    // points on a messy grid, intervals of varied lengths (some longer
    // than the bin -- correctness must not depend on the bin size),
    // negative values included (floor-division sign semantics)
    val points = Seq(-2500L, -1L, 0L, 1L, 999L, 1000L, 1500L, 7999L, 8000L, 12345L)
      .zipWithIndex.map { case (ts, i) => (i.toLong, ts) }.toDF("pid", "pt")
    val intervals = Seq(
      (100L, -3000L, -2000L), (101L, -10L, 10L), (102L, 0L, 999L),
      (103L, 500L, 9000L),    (104L, 8000L, 8000L), (105L, 20000L, 30000L))
      .toDF("iid", "lo", "hi")
    val binned = RangeJoin.pointInInterval(points, "pt", intervals, "lo", "hi", binWidth = 1000L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val naive = points.join(intervals, col("pt") >= col("lo") && col("pt") <= col("hi"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(binned == naive && naive.nonEmpty)
    // inclusive boundaries and the point-sized interval both matched
    assert(naive.contains((8L, 104L)) && naive.contains((2L, 102L)))
  }

  test("R25: the binned plan is an equi join on the cell, never a nested loop") {
    val plan = graft.SparkEntry.queries("q25_range_join")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join must not plan as a nested loop:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
      || plan.contains("BroadcastHashJoin"), s"expected an equi join on the cell:\n$plan")
  }

  test("P6: mixture sampling hits targets exactly, clamps to stratum size, drops untargeted") {
    import spark.implicits._
    val docs = (1L to 300L).map(i => (i, if (i <= 200) "en" else if (i <= 280) "de" else "xx"))
      .toDF("doc_id", "lang")
    val targets = Map("en" -> 50, "de" -> 500) // de target exceeds its 80 rows
    val out = Sampling.mixtureSample(docs, "lang", targets, salts = 4)
    val counts = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(counts == Map("en" -> 50L, "de" -> 80L)) // exact-k; clamp; xx dropped
    // two-phase salted draw equals the naive single-window draw
    val naive = docs
      .withColumn("h", Sampling.hashBucket(col("doc_id"), Int.MaxValue))
      .withColumn("rank", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
          .orderBy(col("h").asc, col("doc_id").asc)))
      .filter(col("rank") <= org.apache.spark.sql.functions.element_at(
        org.apache.spark.sql.functions.typedLit(targets), col("lang")))
      .select("doc_id", "lang", "rank")
    assert(out.collect().toSet == naive.collect().toSet)
    // deterministic across plans
    assert(Sampling.mixtureSample(docs, "lang", targets, salts = 7).collect().toSet ==
      out.collect().toSet)
  }

  private def quantilesOf(vals: Seq[Double], qs: Seq[Double], bins: Int = 16): Map[Double, Double] = {
    import spark.implicits._
    Quantile.exactQuantiles(
        vals.map(("g", _)).toDF("grp", "x"), "grp", "x", qs, bins)
      .select("q", "qval").as[(Double, Double)].collect().toMap
  }

  /** inverse-ECDF reference: k-th smallest, k = max(1, ceil(q*n)) */
  private def ref(vals: Seq[Double], q: Double): Double =
    vals.sorted.apply((math.max(1L, math.ceil(q * vals.size).toLong) - 1L).toInt)

  test("R27: exact quantile matches inverse ECDF on odd/even/duplicate-heavy/all-equal") {
    val cases = Seq(
      Seq(5.0, 1.0, 3.0, 2.0, 4.0),                    // odd n
      Seq(8.0, 6.0, 7.0, 5.0),                          // even n
      Seq(1.0, 1.0, 1.0, 1.0, 9.0, 9.0, 2.0, 1.0),      // duplicate-heavy
      Seq(4.2, 4.2, 4.2),                               // all equal (zero-width)
      Seq(42.0),                                        // single row
      (1 to 100).map(_.toDouble))                       // value-per-bin pressure
    for (vals <- cases; q <- Seq(0.25, 0.5, 0.75, 1.0)) {
      val got = quantilesOf(vals, Seq(q))(q)
      assert(got == ref(vals, q), s"vals=$vals q=$q: got $got, want ${ref(vals, q)}")
    }
  }

  test("R27: quantile result is always an element of the input (selection, not interpolation)") {
    val vals = Seq(1.5, 2.25, 100.125, -3.5, 0.0, 7.75)
    val out = quantilesOf(vals, Seq(0.25, 0.5, 0.75))
    out.values.foreach(v => assert(vals.contains(v)))
  }

  test("R27: bounded-collect contract is ENFORCED — high-cardinality group fails loudly") {
    import spark.implicits._
    // 300 groups × 4 bins > a 1000-cell cap: the operator must refuse
    // BEFORE pulling the histogram, not OOM the driver
    val wide = (1 to 1200).map(i => (s"g${i % 300}", i.toDouble)).toDF("grp", "x")
    val ex = intercept[IllegalArgumentException] {
      Quantile.exactQuantiles(wide, "grp", "x", Seq(0.5), bins = 4,
        maxDriverCells = 1000).collect()
    }
    assert(ex.getMessage.contains("high-cardinality"))
    // same data under the cap still answers correctly
    val ok = Quantile.exactQuantiles(wide, "grp", "x", Seq(0.5), bins = 4,
        maxDriverCells = 1200 * 4)
      .filter(col("g") === "g7").select("qval").as[Double].collect()
    val g7 = (1 to 1200).filter(i => i % 300 == 7).map(_.toDouble)
    assert(ok.toSeq == Seq(ref(g7, 0.5)))
  }

  test("R27: null group keys are excluded identically in both physical forms (ANSI-safe)") {
    import spark.implicits._
    // r13 regression (advisor): the inline when-ladder fell through to
    // NaN for a null g, and floor(NaN).cast(long) throws under the
    // sessions' ANSI-default mode. Both forms must instead DROP null-g
    // rows (the broadcast join's implicit semantics).
    val rows = Seq((Option("a"), 1.0), (Option("a"), 2.0), (Option("a"), 3.0),
      (Option.empty[String], 99.0), (Option.empty[String], 7.0))
    // inline form (2 groups incl. null ≤ MaxInlineGroups)
    val inl = Quantile.exactQuantiles(rows.toDF("grp", "x"), "grp", "x", Seq(0.5), bins = 4)
      .select("g", "qval").as[(String, Double)].collect().toSet
    assert(inl == Set(("a", 2.0))) // null group absent, not thrown
    // broadcast form: widen past MaxInlineGroups with null rows present
    val wide = (1 to 200).map(i => (Option(s"g${i % 100}"), i.toDouble)) ++
      Seq((Option.empty[String], 5.0))
    val bc = Quantile.exactQuantiles(wide.toDF("grp", "x"), "grp", "x", Seq(1.0), bins = 4)
    assert(bc.filter(col("g").isNull).count() == 0)
    assert(bc.count() == 100)
  }

  test("R31: sliding DAU (day-bitmask form) equals a naive per-day distinct recount") {
    import spark.implicits._
    // activity patterns that stress the disjoint-interval construction:
    // A every day; B a single day; C two days exactly 7 apart (adjacent
    // intervals); D overlapping (0 and 3); E a gap wider than the window
    // epoch-based (NOT Timestamp.valueOf, which parses in the JVM
    // default tz): the expected dates below assume the UTC calendar the
    // session pins, so the instants must be tz-independent too
    val base = new java.sql.Timestamp(
      java.time.Instant.parse("2024-03-01T12:00:00Z").toEpochMilli)
    def at(day: Int) = new java.sql.Timestamp(base.getTime + day * 86400000L)
    val rows =
      (0 to 9).map(d => (1L, at(d))) ++
        Seq((2L, at(2))) ++
        Seq((3L, at(0)), (3L, at(7))) ++
        Seq((4L, at(0)), (4L, at(3))) ++
        Seq((5L, at(0)), (5L, at(20))) ++
        Seq((1L, at(4)))                       // duplicate (user, day)
    val df = rows.toDF("user_id", "ts")
    val got = Relational.slidingDau(df)
      .as[(String, Long)].collect().toMap
    // naive recount straight off the planted set
    val active: Map[Long, Set[Int]] = rows.groupBy(_._1)
      .map { case (u, rs) =>
        u -> rs.map(r => ((r._2.getTime - base.getTime) / 86400000L).toInt).toSet
      }
    val domain = active.values.flatten.toSet
    val expected = domain.map { d =>
      val day = java.time.LocalDate.of(2024, 3, 1).plusDays(d.toLong).toString
      day -> active.count { case (_, ds) => ds.exists(a => a <= d && a > d - 7) }.toLong
    }.toMap
    assert(got == expected)
    // a day inside user 5's window but with no events anywhere has no row
    assert(!got.contains("2024-03-11") && got.contains("2024-03-21"))
  }

  test("R31/R32: randomized activity vs brute force — mod-64 wraps (r15) and multi-word wide calendars (r16)") {
    import spark.implicits._
    // the bitmask forms store bits at (day|week index) mod 64 — the
    // adversarial case is a corpus whose index range straddles a
    // multiple of 64, where the cyclic rotation must still reconstruct
    // exact offsets. Base days chosen to force both: 19772 mod 64 = 60
    // (day wrap inside a 30-day span); epoch day 20150 sits at week
    // index 2878 ≡ 62 (mod 64) (week wrap inside a 5-week span). Plus a
    // no-wrap control and a tiny dense corpus.
    val cases = Seq(
      (19772L, 30, 20, 7L),  // day-index wrap
      (20150L, 35, 15, 11L), // week-index wrap
      (19723L, 28, 10, 3L),  // no wrap (2024-01-01)
      (19999L, 12, 4, 5L),   // small dense
      // r16 wide calendars — beyond the retired single-word guards
      // (global day span > 57; per-user week spans ≥ 64): the blocked
      // forms must stay exact where the old forms could only throw
      (19723L, 400, 12, 13L),  // ~57 weeks
      (19000L, 1100, 10, 17L), // ~3 years, week span > 2 words
      (18000L, 4000, 6, 19L))  // ~11 years, day span > 62 words
    for ((baseDay, spanDays, nUsers, seed) <- cases) {
      val rng = new scala.util.Random(seed)
      val rows = for {
        u <- 1 to nUsers
        _ <- 0 until (1 + rng.nextInt(8))
      } yield (u.toLong, baseDay + rng.nextInt(spanDays))
      val df = rows.map { case (u, d) =>
        // mid-day instant so date truncation is unambiguous in UTC
        (u, new java.sql.Timestamp(d * 86400000L + 43200000L))
      }.toDF("user_id", "ts")

      val active: Map[Long, Set[Long]] =
        rows.groupBy(_._1).map { case (u, rs) => u -> rs.map(_._2).toSet }
      // --- q31 brute force: per active day, users active in [d-6, d]
      val domain = active.values.flatten.toSet
      val expDau = domain.map { d =>
        java.time.LocalDate.ofEpochDay(d).toString ->
          active.count { case (_, ds) => ds.exists(a => a <= d && a > d - 7) }.toLong
      }.toMap
      val gotDau = Relational.slidingDau(df).as[(String, Long)].collect().toMap
      assert(gotDau == expDau, s"q31 mismatch for base=$baseDay seed=$seed")

      // --- q32 brute force: Monday weeks, cohort = min week
      def week(d: Long): Long = Math.floorDiv(d - 4, 7)
      val perUserWeeks = active.map { case (u, ds) => u -> ds.map(week) }
      val expRet = perUserWeeks.toSeq
        .flatMap { case (_, ws) => val c = ws.min; ws.map(w => (c, w - c)) }
        .groupBy(identity).map { case ((c, o), xs) =>
          (java.time.LocalDate.ofEpochDay(c * 7 + 4).toString, o) -> xs.size.toLong
        }
      val gotRet = Relational.retention(df)
        .as[(String, Long, Long)].collect()
        .map { case (cw, o, n) => (cw, o) -> n }.toMap
      assert(gotRet == expRet, s"q32 mismatch for base=$baseDay seed=$seed")
    }
  }

  test("R31/R32 r16: exact across the retired 57-day / 64-week single-word boundaries") {
    import spark.implicits._
    // planted — not randomized — corpora that straddle the EXACT spans
    // where the r15 single-word forms stop being representable. The
    // brute force is span-agnostic; the retained single-word baselines
    // must still loud-fail (never alias) beyond their guards.
    def ts(d: Long) = new java.sql.Timestamp(d * 86400000L + 43200000L)
    val base = 19723L // 2024-01-01, a Monday
    // q31: global day spans 57 (last guarded), 58 (first beyond), 64, 65
    for (span <- Seq(57L, 58L, 64L, 65L)) {
      val rows = Seq((1L, base), (1L, base + span), (2L, base + span / 2),
        (2L, base + span), (3L, base + 3))
      val df = rows.map { case (u, d) => (u, ts(d)) }.toDF("user_id", "ts")
      val active = rows.groupBy(_._1).map { case (u, rs) => u -> rs.map(_._2).toSet }
      val expDau = active.values.flatten.toSet.map { (d: Long) =>
        java.time.LocalDate.ofEpochDay(d).toString ->
          active.count { case (_, ds) => ds.exists(a => a <= d && a > d - 7) }.toLong
      }.toMap
      val got = Relational.slidingDau(df).as[(String, Long)].collect().toMap
      assert(got == expDau, s"q31 blocked mismatch at day span $span")
      if (span > 57)
        intercept[Exception] {
          Relational.slidingDauSingleWord(df).collect()
        }
    }
    // q32: per-user week spans 63 (last guarded), 64, 70, 128 (bit
    // lands in the third word)
    for (wspan <- Seq(63L, 64L, 70L, 128L)) {
      val rows = Seq((1L, base), (1L, base + wspan * 7), (1L, base + 14),
        (2L, base + 7), (2L, base + 7 + (wspan - 1) * 7))
      val df = rows.map { case (u, d) => (u, ts(d)) }.toDF("user_id", "ts")
      def week(d: Long) = Math.floorDiv(d - 4, 7)
      val expRet = rows.groupBy(_._1).toSeq
        .flatMap { case (_, rs) =>
          val ws = rs.map(r => week(r._2)).toSet; val c = ws.min
          ws.map(w => (c, w - c))
        }
        .groupBy(identity).map { case ((c, o), xs) =>
          (java.time.LocalDate.ofEpochDay(c * 7 + 4).toString, o) -> xs.size.toLong
        }
      val got = Relational.retention(df).as[(String, Long, Long)].collect()
        .map { case (cw, o, n) => (cw, o) -> n }.toMap
      assert(got == expRet, s"q32 blocked mismatch at week span $wspan")
      if (wspan >= 64)
        intercept[Exception] {
          Relational.retentionSingleWord(df).collect()
        }
    }
  }

  test("R31: one scan, no Window, no fact-sized sort in the bitmask plan") {
    val df = graft.SparkEntry.queries("q31_sliding_dau")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"expected 1 scan, got $scans:\n$plan")
  }

  test("R27: no global sort in the plan; driver holds only histogram counts") {
    val plan = graft.SparkEntry.queries("q27_exact_quantile")(spark, sfDir)
      .queryExecution.executedPlan.toString
    // the only Sorts allowed are the candidate-bin window's local sort
    // (partition-by group,q) — a RangePartitioning exchange would mean a
    // global sort of the fact slipped in
    assert(!plan.contains("rangepartitioning"), s"global sort leaked into q27:\n$plan")
  }
}
