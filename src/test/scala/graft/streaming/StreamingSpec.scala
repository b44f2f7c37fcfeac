package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

import java.sql.Timestamp

/** Structured Streaming semantics (SURVEY §2.7 ST1–ST3), MemoryStream-
  * driven. The batch/stream mirrors are the contract: ST2 results match
  * the q15-style batch window on the same data; ST3 session counts match
  * the q17 lag-window logic. */
class StreamingSpec extends SparkTestBase {

  import spark.implicits._

  private def ts(minutes: Long): Timestamp = new Timestamp(minutes * 60 * 1000)

  private def runBatches[A](q: StreamingQuery, stream: MemoryStream[A],
                            batches: Seq[Seq[A]]): Unit = {
    batches.foreach { b =>
      stream.addData(b)
      q.processAllAvailable()
    }
    q.stop()
  }

  /** Start `ds` with a foreachBatch sink that collects every (batchId,
    * row) into a thread-safe buffer — the pattern the stateful-operator
    * tests need when "latest per key" cannot be recovered from an
    * unordered memory sink. */
  private def collectStream[T](ds: org.apache.spark.sql.Dataset[T])
      : (StreamingQuery, scala.collection.mutable.ArrayBuffer[(Long, T)]) = {
    val buf = scala.collection.mutable.ArrayBuffer[(Long, T)]()
    val q = ds.writeStream.outputMode(OutputMode.Update())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[T], id: Long) =>
        val rows = batch.collect()
        buf.synchronized { rows.foreach(r => buf += ((id, r))) }
        ()
      }.start()
    (q, buf)
  }

  test("ST1: in-flight validation appends the violations column") {
    val input = MemoryStream[(String, Double)](spark)
    val df = input.toDF().toDF("name", "bal")
    val validated = Streaming.validateStream(df, Seq(
      "[name] is mandatory" -> "name IS NOT NULL",
      "positive balance" -> "bal >= 0.0"))
    val q = validated.writeStream.format("memory").queryName("st1_out")
      .outputMode(OutputMode.Append()).start()
    input.addData(Seq(("ok", 5.0), ("neg", -2.0)))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("st1_out")
      .select(col("name"), col("graft_violations"))
      .as[(String, Seq[String])].collect().toMap
    assert(rows("ok").isEmpty)
    assert(rows("neg") == Seq("positive balance"))
  }

  test("ST4: streaming exact dedup keeps first arrivals across batches, matches batch d1 keep-set") {
    val input = MemoryStream[(Long, String, Timestamp)](spark)
    val docs = input.toDF().toDF("doc_id", "text", "ts")
    val q = Streaming.dedupStream(docs, watermark = "1 hour")
      .writeStream.format("memory").queryName("st4_out")
      .outputMode(OutputMode.Append()).start()
    runBatches(q, input, Seq(
      Seq((1L, "alpha", ts(0)), (2L, "beta", ts(1)), (3L, "alpha", ts(2))), // 3 dups 1
      Seq((4L, "beta", ts(10)), (5L, "gamma", ts(11))),                     // 4 dups 2
      Seq((6L, "alpha", ts(20)))))                                          // 6 dups 1
    val kept = spark.table("st4_out").select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq
    // contract: exactly one representative per content hash (within-batch
    // winner is arbitrary), and LATER-batch duplicates never pass
    assert(kept.map(_._2).sorted == Seq("alpha", "beta", "gamma"),
      s"expected one representative per text, got $kept")
    assert(!kept.exists(r => r._1 == 4L || r._1 == 6L),
      s"cross-batch duplicates must be dropped, got $kept")
    // batch mirror: d1's groupBy elects the same set of content hashes
    val batch = Seq((1L, "alpha"), (2L, "beta"), (3L, "alpha"),
      (4L, "beta"), (5L, "gamma"), (6L, "alpha")).toDF("doc_id", "text")
    val d1Hashes = batch.groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("keep_id"))
      .select(col("h")).as[String].collect().toSet
    val streamHashes = spark.table("st4_out")
      .select(col("content_hash")).as[String].collect().toSet
    assert(streamHashes == d1Hashes)
  }

  test("ST5: stream-stream interval join matches the batch join mirror") {
    val clicks = MemoryStream[(Long, Timestamp)](spark)
    val views = MemoryStream[(Long, Timestamp)](spark)
    val joined = Streaming.intervalJoin(
      clicks.toDF().toDF("user", "ts"), views.toDF().toDF("user", "ts"),
      keyCol = "user", tsCol = "ts", watermark = "10 minutes", boundSeconds = 120)
      .select(col("l_user").as("user"), col("l_ts").as("click_ts"), col("r_ts").as("view_ts"))
    val q = joined.writeStream.format("memory").queryName("st5_out")
      .outputMode(OutputMode.Append()).start()
    val clickData = Seq((1L, ts(10)), (2L, ts(12)))
    val viewData = Seq(
      (1L, ts(9)),   // within 120s of user 1's click -> joins
      (1L, ts(5)),   // too early -> no join
      (2L, ts(12)),  // same instant -> joins
      (2L, ts(13)))  // after the click -> no join (trailing window)
    clicks.addData(clickData); q.processAllAvailable()
    views.addData(viewData); q.processAllAvailable()
    // advance both watermarks far enough that all pairs are final
    clicks.addData(Seq((99L, ts(120)))); views.addData(Seq((99L, ts(200))))
    q.processAllAvailable(); q.stop()
    val got = spark.table("st5_out")
      .as[(Long, Timestamp, Timestamp)].collect().toSet
    // batch mirror: plain interval join over the same rows
    val bc = clickData.toDF("user", "click_ts")
    val bv = viewData.toDF("user", "view_ts")
    val mirror = bc.join(bv, bc("user") === bv("user")
        && col("view_ts") >= col("click_ts") - expr("INTERVAL 120 SECONDS")
        && col("view_ts") <= col("click_ts"))
      .select(bc("user"), col("click_ts"), col("view_ts"))
      .as[(Long, Timestamp, Timestamp)].collect().toSet
    assert(got == mirror && got.size == 2, s"stream $got != batch $mirror")
  }

  test("ST2: watermarked tumbling window matches the batch mirror") {
    val input = MemoryStream[(Timestamp, String, Double)](spark)
    val events = input.toDF().toDF("ts", "event_type", "value")
    val q = Streaming.tumblingCounts(events, watermark = "30 minutes")
      .writeStream.format("memory").queryName("st2_out")
      .outputMode(OutputMode.Append()).start()
    val hour0 = Seq(
      (ts(5), "click", 1.0), (ts(20), "click", 2.5), (ts(40), "view", 4.0))
    val hour1 = Seq((ts(70), "click", 8.0))
    // late batches push the watermark past hour 1 so hours 0 and 1
    // finalize (watermark updates at batch END, so emission needs one
    // more batch after the advancing event)
    val flush1 = Seq((ts(200), "view", 0.5))
    val flush2 = Seq((ts(210), "view", 0.5))
    runBatches(q, input, Seq(hour0, hour1, flush1, flush2))
    val streamed = spark.table("st2_out")
      .select("hour", "event_type", "cnt", "total_value")
      .as[(String, String, Long, Double)].collect().toSet
    val batchMirror = (hour0 ++ hour1).toDF("ts", "event_type", "value")
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("total_value"))
      .as[(String, String, Long, Double)].collect().toSet
    assert(streamed == batchMirror)
  }

  test("ST2: events older than the watermark are dropped, not re-aggregated") {
    val input = MemoryStream[(Timestamp, String, Double)](spark)
    val events = input.toDF().toDF("ts", "event_type", "value")
    val q = Streaming.tumblingCounts(events, watermark = "30 minutes")
      .writeStream.format("memory").queryName("st2_late_out")
      .outputMode(OutputMode.Append()).start()
    val onTime = Seq((ts(5), "click", 1.0), (ts(20), "click", 2.0))
    val advance1 = Seq((ts(200), "view", 1.0)) // watermark -> 170 at batch end
    val advance2 = Seq((ts(210), "view", 1.0)) // hour-0 window finalizes + emits
    val late = Seq((ts(10), "click", 100.0))   // 160 min behind the watermark
    val flush = Seq((ts(300), "view", 1.0), (ts(310), "view", 1.0))
    runBatches(q, input, Seq(onTime, advance1, advance2, late, flush))
    val hour0 = spark.table("st2_late_out")
      .filter(col("hour") === "1970-01-01 00")
      .select("event_type", "cnt", "total_value")
      .as[(String, Long, Double)].collect().toSet
    // the late row (value 100.0) must have been dropped: hour 0 holds
    // only the on-time aggregate, and it was emitted exactly once
    assert(hour0 == Set(("click", 2L, 3.0)))
  }

  test("ST13: streaming funnel matches batch q30 flags under out-of-order cross-batch arrival") {
    val B = graft.ops.Relational.FunnelStepBoundUs
    def tsUs(us: Long): Timestamp = {
      val t = new Timestamp(us / 1000000 * 1000)
      t.setNanos(((us % 1000000) * 1000).toInt)
      t
    }
    val day = 24L * 3600 * 1000000
    val input = MemoryStream[(Long, String, Timestamp)](spark)
    val (q, buf) = collectStream(Streaming.funnelStream(input.toDS()))
    val batch1 = Seq(
      (1L, "signup", tsUs(0)), (1L, "view", tsUs(1 * day)),          // u1 clean funnel…
      (2L, "view", tsUs(10 * day)), (2L, "signup", tsUs(9 * day)),   // u2 in-batch disorder
      (3L, "signup", tsUs(0)), (3L, "view", tsUs(B)),                // u3 exactly at the bound (inclusive)
      (4L, "signup", tsUs(5)), (4L, "view", tsUs(5)),                // u4 equal stamps: strict > fails
      (5L, "signup", tsUs(0)), (5L, "click", tsUs(1 * day)),         // u5 purchase precedes click in time
      (5L, "purchase", tsUs(day / 2)), (5L, "error", tsUs(2 * day)), // …and unknown types are ignored
      (6L, "view", tsUs(0)), (6L, "click", tsUs(1 * day)))           // u6 never signed up
    val batch2 = Seq(
      (1L, "click", tsUs(2 * day)), (1L, "purchase", tsUs(3 * day)),
      (2L, "signup", tsUs(0)),                     // u2 LATE earlier signup → 10-day gap KILLS s2
      (3L, "click", tsUs(B + B + 1)))              // u3 one micro past the bound from t2=B → s3 false
    runBatches(q, input, Seq(batch1, batch2))
    val latest = buf.groupBy(_._2.user_id).map { case (u, rs) => u -> rs.maxBy(_._1)._2 }
    assert(latest(1L) == Streaming.FunnelProgress(1L, true, true, true, true))
    assert(latest(2L) == Streaming.FunnelProgress(2L, true, false, false, false))
    assert(latest(3L) == Streaming.FunnelProgress(3L, true, true, false, false))
    assert(latest(4L) == Streaming.FunnelProgress(4L, true, false, false, false))
    assert(latest(5L) == Streaming.FunnelProgress(5L, true, false, false, false))
    assert(latest(6L) == Streaming.FunnelProgress(6L, false, false, false, false))
    // the batch mirror (q30's funnelFlags on the union) agrees per user
    val union = (batch1 ++ batch2).toDF("user_id", "event_type", "ts")
    val mirror = graft.ops.Relational.funnelFlags(union)
      .as[(Long, Boolean, Boolean, Boolean, Boolean)].collect()
      .map(r => r._1 -> Streaming.FunnelProgress(r._1, r._2, r._3, r._4, r._5)).toMap
    latest.foreach { case (u, p) => assert(p == mirror(u), s"user $u") }
  }

  test("ST13: streaming funnel over the real events table sums to batch q30 counts") {
    val events = graft.Tables(spark, sfDir, "events")
      .select(col("user_id"), col("event_type"), col("ts"))
      .as[(Long, String, Timestamp)].collect().toSeq
    // arbitrary 3-way split that scatters each user's events across batches
    val batches = Seq(
      events.zipWithIndex.filter(_._2 % 3 == 0).map(_._1),
      events.zipWithIndex.filter(_._2 % 3 == 1).map(_._1),
      events.zipWithIndex.filter(_._2 % 3 == 2).map(_._1))
    val input = MemoryStream[(Long, String, Timestamp)](spark)
    val (q, buf) = collectStream(Streaming.funnelStream(input.toDS()))
    runBatches(q, input, batches)
    val latest = buf.groupBy(_._2.user_id).map { case (_, rs) => rs.maxBy(_._1)._2 }
    val streamed = (
      latest.count(_.s1).toLong, latest.count(_.s2).toLong,
      latest.count(_.s3).toLong, latest.count(_.s4).toLong)
    val batch = graft.ops.Relational.q30Funnel(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect().head
    assert(streamed == batch)
    assert(streamed._1 > 0)
  }

  test("ST14: streaming DAU deltas converge to the batch interval decomposition under late re-splits") {
    def tsd(day: Int): Timestamp = new Timestamp(day * 86400000L)
    val input = MemoryStream[(Long, Timestamp)](spark)
    val (q, tagged) = collectStream(Streaming.slidingDauStream(input.toDS()))
    def buf = tagged.map(_._2)
    // u1 gets days 0 and 20 first (two far intervals), THEN a late day 3
    // lands inside the first window and re-splits [0,6] into [0,2]+[3,9];
    // u2 duplicates a day across batches (no-op); u3 single day
    val batch1 = Seq((1L, tsd(0)), (1L, tsd(20)), (2L, tsd(5)), (3L, tsd(8)))
    val batch2 = Seq((1L, tsd(3)), (2L, tsd(5)))
    runBatches(q, input, Seq(batch1, batch2))
    val summed = buf.groupBy(_.day).view.mapValues(_.map(_.delta).sum)
      .filter(_._2 != 0L).toMap
    // batch mirror: the same decomposition straight off the final day sets
    val finalDays = Map(1L -> List(0, 3, 20), 2L -> List(5), 3L -> List(8))
    def expectedDeltas(days: List[Int]): Map[Int, Long] = {
      val iv = days.zip(days.drop(1).map(Option(_)) :+ None).map { case (d, n) =>
        (d, n.map(x => math.min(d + 6, x - 1)).getOrElse(d + 6))
      }
      iv.flatMap { case (s, e) => Seq(s -> 1L, (e + 1) -> -1L) }
        .groupMapReduce(_._1)(_._2)(_ + _)
    }
    val expected = finalDays.values.map(expectedDeltas)
      .reduce((a, b) => (a.keySet ++ b.keySet).map(k =>
        k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap)
      .filter(_._2 != 0L)
    assert(summed == expected)
    // and the cumulative sum over the day domain is the sliding DAU
    val domain = finalDays.values.flatten.toSet
    val counts = domain.map { d =>
      d -> finalDays.count { case (_, ds) => ds.exists(a => a <= d && a > d - 7) }.toLong
    }.toMap
    val allDays = summed.keySet ++ domain
    val cum = allDays.toSeq.sorted.foldLeft((0L, Map.empty[Int, Long])) {
      case ((run, acc), d) =>
        val r = run + summed.getOrElse(d, 0L)
        (r, acc + (d -> r))
    }._2
    domain.foreach(d => assert(cum(d) == counts(d), s"day $d"))
  }

  test("ST14: scattered replay of the real events table reproduces q31's per-day counts") {
    val events = graft.Tables(spark, sfDir, "events")
      .select(col("user_id"), col("ts"))
      .as[(Long, Timestamp)].collect().toSeq
    val batches = Seq(
      events.zipWithIndex.filter(_._2 % 3 == 0).map(_._1),
      events.zipWithIndex.filter(_._2 % 3 == 1).map(_._1),
      events.zipWithIndex.filter(_._2 % 3 == 2).map(_._1))
    val input = MemoryStream[(Long, Timestamp)](spark)
    val (q, tagged) = collectStream(Streaming.slidingDauStream(input.toDS()))
    def buf = tagged.map(_._2)
    runBatches(q, input, batches)
    val summed = buf.groupBy(_.day).view.mapValues(_.map(_.delta).sum).toMap
    val batchDau = graft.ops.Relational.q31SlidingDau(spark, sfDir)
      .as[(String, Long)].collect().toMap
    // evaluate the running sum over delta days ∪ the batch day domain: an
    // active day adjacent to the previous interval's end has net delta 0
    // (the +1 start cancels the -1 end) and so never appears as a key
    val domainDays = batchDau.keySet.map(d => java.time.LocalDate.parse(d).toEpochDay.toInt)
    val cum = (summed.keySet ++ domainDays).toSeq.sorted
      .foldLeft((0L, Map.empty[Int, Long])) {
        case ((run, acc), d) =>
          val r = run + summed.getOrElse(d, 0L)
          (r, acc + (d -> r))
      }._2
    batchDau.foreach { case (dayStr, n) =>
      val epochDay = java.time.LocalDate.parse(dayStr).toEpochDay.toInt
      assert(cum(epochDay) == n, s"day $dayStr")
    }
    assert(batchDau.nonEmpty)
  }

  test("r16 mask-state twins: identical emitted deltas to the list-state forms on a scattered replay") {
    // the A/B variants must be behaviorally indistinguishable — only the
    // per-user state representation differs (blocked 64-bit masks vs
    // sorted int lists); StreamBench carries the state-bytes receipt
    val events = graft.Tables(spark, sfDir, "events")
      .select(col("user_id"), col("ts"))
      .as[(Long, Timestamp)].collect().toSeq
    val batches = Seq(
      events.zipWithIndex.filter(_._2 % 3 == 0).map(_._1),
      events.zipWithIndex.filter(_._2 % 3 == 1).map(_._1),
      events.zipWithIndex.filter(_._2 % 3 == 2).map(_._1))
    def dauDeltas(mk: org.apache.spark.sql.Dataset[(Long, Timestamp)] =>
        org.apache.spark.sql.Dataset[Streaming.DauDelta]) = {
      val in = MemoryStream[(Long, Timestamp)](spark)
      val (q, tagged) = collectStream(mk(in.toDS()))
      runBatches(q, in, batches)
      tagged.map(_._2).groupBy(d => d.day).view
        .mapValues(_.map(_.delta).sum).filter(_._2 != 0L).toMap
    }
    assert(dauDeltas(Streaming.slidingDauStream(_)) ==
      dauDeltas(Streaming.slidingDauStreamListState(_)))
    def retDeltas(mk: org.apache.spark.sql.Dataset[(Long, Timestamp)] =>
        org.apache.spark.sql.Dataset[Streaming.RetentionDelta]) = {
      val in = MemoryStream[(Long, Timestamp)](spark)
      val (q, tagged) = collectStream(mk(in.toDS()))
      runBatches(q, in, batches)
      tagged.map(_._2).groupBy(d => (d.cohort_day, d.week_offset)).view
        .mapValues(_.map(_.delta).sum).filter(_._2 != 0L).toMap
    }
    assert(retDeltas(Streaming.retentionStream(_)) ==
      retDeltas(Streaming.retentionStreamListState(_)))
    // encode/decode roundtrip incl. negative-word and wide-span values
    val rng = new scala.util.Random(7)
    for (_ <- 1 to 50) {
      val vals = Seq.fill(1 + rng.nextInt(40))(rng.nextInt(40000)).distinct.sorted
      assert(Streaming.maskDecode(Streaming.maskEncode(vals)) == vals.toList)
    }
    assert(Streaming.maskDecode(Streaming.maskEncode(Nil)) == Nil)
  }

  test("ST13/ST14: idle state expires from ADVANCING EVENT TIME; a returning DAU user cannot double-count") {
    val day = 24L * 3600 * 1000L // ms
    def tsd(d: Long): Timestamp = new Timestamp(d * day)
    // --- funnel expiry: u1 signs up day 1; u2's far-future events push
    // the watermark past u1's 28-day horizon; u1's return then emits
    // FRESH flags (s1 from a view-only state is false — expired state
    // forgot the signup)
    val fIn = MemoryStream[(Long, String, Timestamp)](spark)
    val fq = Streaming.funnelStream(fIn.toDS(), expiry = true)
      .writeStream.format("memory").queryName("st13_expiry_out")
      .outputMode(OutputMode.Update()).start()
    runBatches(fq, fIn, Seq(
      Seq((1L, "signup", tsd(1))),
      Seq((2L, "signup", tsd(100))),   // watermark → ~day 100 at batch end
      Seq((2L, "view", tsd(101))),     // timeout fires: u1 dropped
      Seq((1L, "view", tsd(102)))))    // u1 returns: fresh state, no signup
    val u1 = spark.table("st13_expiry_out")
      .as[(Long, Boolean, Boolean, Boolean, Boolean)].collect()
      .filter(_._1 == 1L)
    assert(u1.toSet == Set((1L, true, false, false, false), (1L, false, false, false, false)))
    // --- DAU expiry: u1 active day 1, expired after u2 advances the
    // watermark ~100 days; u1 returns on day 102 — far past day 1+7, so
    // the fresh interval [102,108] cannot overlap the emitted [1,7] and
    // the cumulative count at any day stays exact
    val dIn = MemoryStream[(Long, Timestamp)](spark)
    val (dq, dTagged) = collectStream(Streaming.slidingDauStream(dIn.toDS(), expiry = true))
    def buf = dTagged.map(_._2)
    runBatches(dq, dIn, Seq(
      Seq((1L, tsd(1))),
      Seq((2L, tsd(100))),
      Seq((2L, tsd(101))),             // timeout fires: u1's day-set dropped
      Seq((1L, tsd(102)))))            // fresh state: emits [102,108] only
    val summed = buf.groupBy(_.day).view.mapValues(_.map(_.delta).sum).filter(_._2 != 0L).toMap
    // u1 contributes [1,7] and [102,108]; u2 [100,106]∪[101,107] = capped
    // decomposition {[100,100],[101,107]}; nothing overlaps u1's old run
    assert(summed == Map(1 -> 1L, 8 -> -1L, 100 -> 1L, 102 -> 1L, 108 -> -1L, 109 -> -1L))
  }

  test("ST14 expiry: frozen-prefix prune keeps a continuously active user exact; late pre-watermark days are dropped") {
    val day = 24L * 3600 * 1000L
    // events at 01:00 of each day so the 10-min watermark delay stays
    // inside the same day (cutoff day == max seen day)
    def tsh(d: Int): Timestamp = new Timestamp(d * day + 3600000L)
    val dIn = MemoryStream[(Long, Timestamp)](spark)
    val (dq, tagged) = collectStream(Streaming.slidingDauStream(dIn.toDS(), expiry = true))
    runBatches(dq, dIn, Seq(
      Seq((7L, tsh(50)), (7L, tsh(51)), (7L, tsh(52))),  // watermark → day 52; state prunes to {52}
      (53 to 57).map(d => (7L, tsh(d))),                 // → day 57; prunes to {57}
      Seq((7L, tsh(59)), (7L, tsh(60))),                 // skip 58; prunes to {59,60}
      Seq((7L, tsh(58)))))                               // LATE: below the day-60 watermark (60 01:00 − 10 min) → dropped
    val summed = tagged.map(_._2).groupBy(_.day).view
      .mapValues(_.map(_.delta).sum).filter(_._2 != 0L).toMap
    // the emitted corrections telescope across prunes to the decomposition
    // of the TRUE day set WITHOUT the dropped late day — if the prune were
    // unsound (or the late day re-entered against pruned state) the sums
    // would diverge at the prune boundaries
    val expected = Streaming.dauDeltas(((50 to 57) ++ Seq(59, 60)).toList)
      .filter(_._2 != 0L).map { case (d, v) => d -> v }
    assert(summed == expected, s"got $summed expected $expected")
  }

  test("ST15: streaming retention retracts the old cohort when an earlier first-week arrives late") {
    val day = 24L * 3600 * 1000L
    def tsd(d: Int): Timestamp = new Timestamp(d * day)
    val input = MemoryStream[(Long, Timestamp)](spark)
    val (q, tagged) = collectStream(Streaming.retentionStream(input.toDS()))
    // u1 first appears in the week of day 14 (a Thursday — epoch day 0
    // was a Thursday → week starts day 11), active again in the week of
    // day 21 (offset 1); THEN a late event from the week of day 0
    // arrives: the cohort moves to that week (day 0 → Monday start at
    // day -3) and offsets recompute from the new cohort
    runBatches(q, input, Seq(
      Seq((1L, tsd(14)), (1L, tsd(21))),
      Seq((2L, tsd(14))),
      Seq((1L, tsd(0)))))
    val summed = tagged.map(_._2)
      .groupBy(d => (d.cohort_day, d.week_offset)).view
      .mapValues(_.map(_.delta).sum).filter(_._2 != 0L).toMap
    // final truth straight off the pure cell function over the full sets
    val u1 = Streaming.retentionCells(List(-3, 11, 18))
    val u2 = Streaming.retentionCells(List(11))
    val expected = (u1.keySet ++ u2.keySet).map(k =>
      k -> (u1.getOrElse(k, 0L) + u2.getOrElse(k, 0L))).toMap
    assert(summed == expected, s"got $summed expected $expected")
    // and the retraction really happened: u1's original (11, 0) cell was
    // asserted then withdrawn, so it survives only via u2
    assert(summed((11, 0)) == 1L)
  }

  test("ST15: scattered replay of the real events table reproduces q32's retention triangle") {
    val events = graft.Tables(spark, sfDir, "events")
      .select(col("user_id"), col("ts"))
      .as[(Long, Timestamp)].collect().toSeq
    val batches = Seq(
      events.zipWithIndex.filter(_._2 % 3 == 0).map(_._1),
      events.zipWithIndex.filter(_._2 % 3 == 1).map(_._1),
      events.zipWithIndex.filter(_._2 % 3 == 2).map(_._1))
    val input = MemoryStream[(Long, Timestamp)](spark)
    val (q, tagged) = collectStream(Streaming.retentionStream(input.toDS()))
    runBatches(q, input, batches)
    val summed = tagged.map(_._2)
      .groupBy(d => (d.cohort_day, d.week_offset)).view
      .mapValues(_.map(_.delta).sum).filter(_._2 != 0L).toMap
    val batchTriangle = graft.ops.Relational.q32Retention(spark, sfDir)
      .as[(String, Long, Long)].collect()
      .map { case (cw, off, n) =>
        (java.time.LocalDate.parse(cw).toEpochDay.toInt, off.toInt) -> n }
      .toMap
    assert(summed == batchTriangle, s"stream $summed != batch $batchTriangle")
    assert(summed.nonEmpty)
  }

  test("ST2: file-source stream over the real events table matches the batch window") {
    // readStream from parquet (the production source shape), windows in
    // Complete mode so every window is present for the full comparison
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"))
    val raw = spark.read.parquet(dir.toString)
    // the one production normalization (nanos-long | NTZ | timestamp →
    // TimestampType); sharing it means the next ts-encoding drift is
    // fixed in exactly one place
    val toMicros = graft.Tables.normalizeEventsTs _
    val stream = toMicros(spark.readStream.schema(raw.schema).parquet(dir.toString))
    val q = Streaming.tumblingCounts(stream)
      .writeStream.format("memory").queryName("st2_file_out")
      .outputMode(OutputMode.Complete()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("st2_file_out")
      .as[(String, String, Long, Double)].collect().toSet
    val batch = toMicros(raw)
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("total_value"))
      .as[(String, String, Long, Double)].collect().toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("ST9: streaming CMS equals the batch sketch over everything ingested") {
    val input = MemoryStream[(Long, String)](spark)
    val docs = input.toDF().toDF("doc_id", "text")
    val q = Streaming.cmsStream(docs)
      .writeStream.format("memory").queryName("st9_out")
      .outputMode(OutputMode.Update()).start()
    val b1 = Seq((1L, "apple apple banana"), (2L, "cherry apple"))
    val b2 = Seq((3L, "banana banana date apple"))
    runBatches(q, input, Seq(b1, b2))
    // Update-mode memory sink appends each update; latest per cell wins
    val streamed = spark.table("st9_out").as[(Int, Int, Long)].collect()
      .groupBy(r => (r._1, r._2)).map { case (k, vs) => k -> vs.map(_._3).max }
    val batch = (b1 ++ b2).toDF("doc_id", "text")
      .transform(d => Streaming.cmsStream(d))
      .as[(Int, Int, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(streamed == batch)
    // state is the fixed sketch geometry, never per-term
    assert(batch.size <= graft.text.TextQueries.CmsDepth * graft.text.TextQueries.CmsWidth)
  }

  test("ST11: streaming chunk CMS flags cross-batch boilerplate; equals the batch sketch") {
    import graft.text.TextQueries.{cmsHash, CmsDepth}
    val header = (1 to 8).map(i => s"hdr$i").mkString(" ") // one chunk wide
    val input = MemoryStream[(Long, String)](spark)
    val docs = input.toDF().toDF("doc_id", "text")
    val q = Streaming.chunkCmsStream(docs)
      .writeStream.format("memory").queryName("st11_out")
      .outputMode(OutputMode.Update()).start()
    val b1 = Seq((1L, s"$header alpha beta"), (2L, s"$header gamma delta"))
    val b2 = Seq((3L, s"$header epsilon zeta"), (4L, "omega psi chi"))
    runBatches(q, input, Seq(b1, b2))
    q.stop()
    val cells = spark.table("st11_out").as[(Int, Int, Long)].collect()
      .groupBy(r => (r._1, r._2)).map { case (k, vs) => k -> vs.map(_._3).max }
    // sketch estimate (min over depth rows) for the planted header chunk:
    // CMS never underestimates, and here it should be exactly 3
    val est = (0 until CmsDepth).map { d =>
      val (dd, w) = spark.range(1)
        .select(lit(d).as("d"), cmsHash(lit(header), d).as("w"))
        .as[(Int, Int)].head()
      cells.getOrElse((dd, w), 0L)
    }.min
    assert(est >= 3L, s"boilerplate chunk estimate $est must cover its true count 3")
    // streamed state equals the batch sketch over everything ingested
    val batch = (b1 ++ b2).toDF("doc_id", "text")
      .transform(d => Streaming.chunkCmsStream(d))
      .as[(Int, Int, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(cells == batch)
  }

  test("ST12: per-group quota admission caps each group at its target across batches") {
    val input = MemoryStream[(String, Long)](spark)
    val q = Streaming.quotaStream(input.toDS(), Map("en" -> 3, "de" -> 2))
      .writeStream.format("memory").queryName("st12_out")
      .outputMode(OutputMode.Update()).start()
    val b1 = Seq(("en", 1L), ("en", 2L), ("de", 10L), ("xx", 99L))
    val b2 = Seq(("en", 3L), ("en", 4L), ("de", 11L), ("de", 12L))
    runBatches(q, input, Seq(b1, b2))
    q.stop()
    val updates = spark.table("st12_out").as[(String, Seq[Long], Long)].collect()
    val admitted = updates.groupBy(_._1)
      .map { case (g, us) => g -> us.flatMap(_._2).toSet }
    // en: first 3 arrivals (1,2 then 3); 4 rejected. de: 10 then 11; 12 rejected.
    assert(admitted == Map("en" -> Set(1L, 2L, 3L), "de" -> Set(10L, 11L)))
    // untargeted group never admitted, never holds state
    assert(!admitted.contains("xx"))
    // running totals cap at the quota
    assert(updates.filter(_._1 == "en").map(_._3).max == 3L)
    assert(updates.filter(_._1 == "de").map(_._3).max == 2L)
  }

  test("ST8: governed ingest splits each micro-batch into clean and quarantine tables") {
    def resetTable(name: String): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS $name")
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir") + s"/$name")
      loc.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(loc, true)
      ()
    }
    resetTable("st8_clean"); resetTable("st8_quarantine")
    val rules = Seq(
      "[name] is mandatory" -> "name IS NOT NULL",
      "positive balance" -> "bal >= 0.0")
    val input = MemoryStream[(Long, String, Double)](spark)
    val q = Streaming.governedIngest(
        input.toDF().toDF("id", "name", "bal"), rules, "st8_clean", "st8_quarantine")
      .start()
    input.addData(Seq((1L, "ok", 5.0), (2L, null, 3.0)))
    q.processAllAvailable()
    input.addData(Seq((3L, "fine", 1.0), (4L, "neg", -2.0)))
    q.processAllAvailable(); q.stop()
    val clean = spark.table("st8_clean").select("id").as[Long].collect().toSet
    assert(clean == Set(1L, 3L))
    val quarantined = spark.table("st8_quarantine")
      .select(col("id"), col(graft.model.Validator.ViolationColumn))
      .as[(Long, Seq[String])].collect().toMap
    assert(quarantined.keySet == Set(2L, 4L))
    assert(quarantined(2L) == Seq("[name] is mandatory"))
    assert(quarantined(4L) == Seq("positive balance"))
    // batch-id lineage rides in the sink's partition column
    assert(spark.table("st8_clean").select(Streaming.BatchIdColumn)
      .as[Long].collect().toSet == Set(0L, 1L))

    // EXACTLY-ONCE: replay micro-batch 1 — the post-failure rerun Spark
    // performs when the sink completed but the checkpoint didn't — and
    // assert both tables are byte-identical, not doubled
    val before = (spark.table("st8_clean").count(), spark.table("st8_quarantine").count())
    Streaming.governedIngestBatch(
      Seq((3L, "fine", 1.0), (4L, "neg", -2.0)).toDF("id", "name", "bal"),
      batchId = 1L, rules, "st8_clean", "st8_quarantine")
    assert((spark.table("st8_clean").count(), spark.table("st8_quarantine").count()) == before,
      "replayed batch must overwrite its own partition, not append duplicates")
    assert(spark.table("st8_clean").select("id").as[Long].collect().toSet == Set(1L, 3L))
    spark.sql("DROP TABLE IF EXISTS st8_clean")
    spark.sql("DROP TABLE IF EXISTS st8_quarantine")
  }

  test("ST10: streaming IVF maintenance - probe sees all appended vectors, layout frozen") {
    def resetTable(name: String): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS $name")
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir") + s"/$name")
      loc.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(loc, true)
      ()
    }
    resetTable("st10_ivf"); resetTable("st10_ivf_ingest_log")
    val vecs = graft.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val base = vecs.filter(col("vec_id") % 5 =!= 0)
    val idx = graft.sim.IvfIndex.build(base, "vec_id", "embedding",
      nlist = 16, numBuckets = 16, table = "st10_ivf")
    val baseCount = base.count()

    // stream the held-out vectors in over three micro-batches
    val late = vecs.filter(col("vec_id") % 5 === 0)
      .as[(Long, Seq[Double])].collect().toSeq
    val batches = late.grouped(math.max(1, late.size / 3 + 1)).toSeq
    val input = MemoryStream[(Long, Seq[Double])](spark)
    val q = Streaming.ivfMaintain(
        input.toDF().toDF("vec_id", "embedding"), idx, "vec_id", "embedding")
      .start()
    runBatches(q, input, batches)
    q.stop()

    // every streamed vector landed; totals match the full corpus
    assert(spark.table(idx.table).count() == vecs.count())
    // assignment still comes from the FROZEN build-time centroids
    import graft.functions.VectorFunctions.nearestCentroids
    val expected = late.toDF("vec_id", "embedding")
      .select(col("vec_id"),
        org.apache.spark.sql.functions.element_at(
          nearestCentroids(col("embedding"), idx.centroids, 1), 1).as("list_id"))
      .as[(Long, Int)].collect().toMap
    val stored = spark.table(idx.table)
      .filter(col("neighbor_id") % 5 === 0)
      .select(col("neighbor_id"), col("list_id"))
      .as[(Long, Int)].collect().toMap
    assert(stored == expected)
    // bucket layout unchanged: appended files honor the table's bucket
    // spec, so a probe's corpus side still prunes buckets (no full scan)
    val probed = graft.sim.IvfIndex.probe(idx,
      vecs.filter(col("vec_id") < 2), "vec_id", "embedding", nprobe = 2, k = 5)
    val old = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val scan = probed.queryExecution.executedPlan.collectFirst {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }.get
      assert(scan.optionalBucketSet.nonEmpty, "probe scan lost bucket info after appends")
      assert(scan.optionalBucketSet.get.cardinality() < 16)
    } finally spark.conf.set("spark.sql.adaptive.enabled", old)
    // streamed vectors are actually probe-visible (some neighbor id % 5 == 0
    // exists in the corpus-wide top-k of some query or at least the table)
    assert(baseCount < vecs.count())

    // IDEMPOTENT REPLAY: re-running an already-logged batch id appends
    // nothing (the ingest log recorded it), a NEW batch id appends once
    val total = spark.table(idx.table).count()
    val replay = late.take(3).toDF("vec_id", "embedding")
    Streaming.ivfMaintainBatch(replay, batchId = 0L, idx, "vec_id", "embedding")
    assert(spark.table(idx.table).count() == total, "replayed batch id must be skipped")
    Streaming.ivfMaintainBatch(replay, batchId = 99L, idx, "vec_id", "embedding")
    assert(spark.table(idx.table).count() == total + 3)
    assert(spark.table("st10_ivf_ingest_log").select("batch_id").as[Long]
      .collect().toSet.contains(99L))
    spark.sql("DROP TABLE IF EXISTS st10_ivf")
    spark.sql("DROP TABLE IF EXISTS st10_ivf_ingest_log")
  }

  test("ST16: streaming ingest dedup against the persisted index — cross-batch growth, replay-safe") {
    def resetTable(name: String): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS $name")
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir") + s"/$name")
      loc.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(loc, true)
      ()
    }
    Seq("st16_index", "st16_index_ingest_log", "st16_clean").foreach(resetTable)
    val base = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight")).toDF("doc_id", "text")
    val idx = graft.dedup.DedupIndex.build(base, "doc_id", "text", "st16_index",
      numBuckets = 8, k = 3, numHashes = 16, numBands = 4, maxBucket = 100)

    val input = MemoryStream[(Long, String)](spark)
    val q = Streaming.indexedIngest(input.toDF().toDF("doc_id", "text"), idx,
        "doc_id", "text", threshold = 0.5, maxBucket = 100, "st16_clean")
      .start()
    // batch 0: one dup of the build-time history, one novel doc
    input.addData(Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta"),
      (11L, "novel streaming document content appearing for the first time")))
    q.processAllAvailable()
    // batch 1: a dup of batch 0's NOVEL doc — proves the index grew
    // across batches — plus another novel doc
    input.addData(Seq(
      (20L, "novel streaming document content appearing for the first time"),
      (21L, "yet another entirely original piece of streaming text here")))
    q.processAllAvailable(); q.stop()

    val clean = spark.table("st16_clean").select("doc_id").as[Long].collect().toSet
    assert(clean == Set(11L, 21L), s"only novel docs land: $clean")
    // the index now also knows the streamed novel docs
    assert(spark.table(idx.table).select("index_id").distinct()
      .as[Long].collect().toSet == Set(1L, 2L, 11L, 21L))

    // replay batch 1 (the post-failure rerun): logged id → skipped whole
    val before = (spark.table("st16_clean").count(), spark.table(idx.table).count())
    val batch1 =
      Seq((20L, "novel streaming document content appearing for the first time"),
          (21L, "yet another entirely original piece of streaming text here"))
        .toDF("doc_id", "text")
    Streaming.indexedIngestBatch(batch1,
      batchId = 1L, idx, "doc_id", "text", 0.5, 100, "st16_clean")
    assert((spark.table("st16_clean").count(), spark.table(idx.table).count()) == before,
      "replayed batch must change nothing")

    // the CRASH WINDOW: signatures appended but the log row lost (worst
    // case: the whole log gone). The replayed batch finds its own
    // signatures in the index — self-match exclusion must keep the
    // clean table's rows intact, not rewrite partition 1 empty
    spark.sql("DROP TABLE st16_index_ingest_log")
    Streaming.indexedIngestBatch(batch1,
      batchId = 1L, idx, "doc_id", "text", 0.5, 100, "st16_clean")
    assert(spark.table("st16_clean").select("doc_id").as[Long].collect().toSet
      == Set(11L, 21L), "lost-log replay must not drop landed docs")
    // duplicate signature rows are the documented residue; distinct ids
    // are unchanged and a fresh true-duplicate is still caught
    assert(spark.table(idx.table).select("index_id").distinct()
      .as[Long].collect().toSet == Set(1L, 2L, 11L, 21L))
    val lateDup = graft.dedup.DedupIndex.probe(idx,
      Seq((40L, "yet another entirely original piece of streaming text here"))
        .toDF("doc_id", "text"), "doc_id", "text", threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(lateDup == Set((40L, 21L, 1.0)), lateDup)
    Seq("st16_index", "st16_index_ingest_log", "st16_clean").foreach(n =>
      spark.sql(s"DROP TABLE IF EXISTS $n"))
  }

  test("ST16: lost-log replay of a batch holding an INTRA-batch near-dup pair keeps both docs") {
    // round-11 advice (medium): two mutually-near novel docs in ONE
    // batch. On first run neither is in the index, both land (within-
    // batch dups are ST4's layer). After a crash between the signature
    // append and the log write, the replay probes an index holding the
    // batch's OWN signatures: each doc finds its partner (distinct ids,
    // so an identical-id self-match filter does NOT fire), both get
    // flagged dup, and the dynamic partition overwrite would rewrite
    // the batch partition WITHOUT them — silent data loss. The fix
    // excludes every probe match whose index side is in the batch's own
    // id set; this test pins it.
    def resetTable(name: String): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS $name")
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir") + s"/$name")
      loc.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(loc, true)
      ()
    }
    Seq("st16b_index", "st16b_index_ingest_log", "st16b_clean").foreach(resetTable)
    val base = Seq(
      (1L, "historical corpus document number one in the index")).toDF("doc_id", "text")
    val idx = graft.dedup.DedupIndex.build(base, "doc_id", "text", "st16b_index",
      numBuckets = 8, k = 3, numHashes = 16, numBands = 4, maxBucket = 100)
    // 10 and 11: mutually near-duplicate (identical text), both novel
    // vs the index; 12: a dup of the HISTORY, must still be dropped
    val batch = Seq(
      (10L, "twin streaming payload shared by two distinct documents"),
      (11L, "twin streaming payload shared by two distinct documents"),
      (12L, "historical corpus document number one in the index"))
      .toDF("doc_id", "text")
    Streaming.indexedIngestBatch(batch,
      batchId = 0L, idx, "doc_id", "text", 0.5, 100, "st16b_clean")
    assert(spark.table("st16b_clean").select("doc_id").as[Long].collect().toSet
      == Set(10L, 11L), "both within-batch twins land; the history dup does not")

    // crash window: signatures are in the index, the log row is lost
    spark.sql("DROP TABLE st16b_index_ingest_log")
    Streaming.indexedIngestBatch(batch,
      batchId = 0L, idx, "doc_id", "text", 0.5, 100, "st16b_clean")
    assert(spark.table("st16b_clean").select("doc_id").as[Long].collect().toSet
      == Set(10L, 11L),
      "replay must not drop mutually-near-dup twins it landed before the crash")
    // the history dup is still recognized as a dup on replay (the
    // batch-id exclusion must not whitelist INDEX ids outside the batch)
    assert(!spark.table("st16b_clean").select("doc_id").as[Long].collect()
      .contains(12L))
    Seq("st16b_index", "st16b_index_ingest_log", "st16b_clean").foreach(n =>
      spark.sql(s"DROP TABLE IF EXISTS $n"))
  }

  test("ST7: stream-static enrichment matches the batch join; unmatched rows survive") {
    val input = MemoryStream[(Long, String)](spark)
    val events = input.toDF().toDF("event_id", "nation_key")
    val dim = Seq(("FR", "EUROPE"), ("JP", "ASIA")).toDF("nation_key", "region")
    val q = Streaming.enrichStream(events, dim, "nation_key")
      .writeStream.format("memory").queryName("st7_out")
      .outputMode(OutputMode.Append()).start()
    runBatches(q, input, Seq(
      Seq((1L, "FR"), (2L, "JP")),
      Seq((3L, "XX")))) // no dim row: must flow through with null region
    val out = spark.table("st7_out")
      .select("event_id", "region").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "EUROPE", 2L -> "ASIA", 3L -> null))
    // batch mirror on the same rows
    val batch = Seq((1L, "FR"), (2L, "JP"), (3L, "XX")).toDF("event_id", "nation_key")
      .join(dim, Seq("nation_key"), "left")
      .select("event_id", "region").as[(Long, String)].collect().toMap
    assert(out == batch)
  }

  test("ST6: streaming near-dup drops normalization-equivalent docs exact dedup misses") {
    val input = MemoryStream[(Long, String, Timestamp)](spark)
    val docs = input.toDF().toDF("doc_id", "text", "ts")
    val q = Streaming.nearDupStream(docs)
      .writeStream.format("memory").queryName("st6_out")
      .outputMode(OutputMode.Append()).start()
    val a = "the quick brown fox jumps over the lazy dog again and again"
    // same tokens as `a` after lower+split — different raw bytes, so
    // md5(text) differs and ST4's exact dedup would KEEP it
    val aNearDup = "The  quick   brown fox\tjumps over THE lazy dog again and again"
    val b = "completely different content with nothing shared at all here"
    val short = "too short" // < 3 tokens: exact-hash fallback key
    runBatches(q, input, Seq(
      Seq((1L, a, ts(1)), (4L, short, ts(1))),
      Seq((2L, aNearDup, ts(2)), (3L, b, ts(3)), (5L, short, ts(3)))))
    val kept = spark.table("st6_out").select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 4L), s"got $kept") // 2 near-dup-dropped, 5 exact-dropped
    // batch mirror: keep-first by the same key
    val all = Seq((1L, a, ts(1)), (4L, short, ts(1)),
      (2L, aNearDup, ts(2)), (3L, b, ts(3)), (5L, short, ts(3)))
      .toDF("doc_id", "text", "ts")
    val batchKeep = all.withColumn("k", Streaming.nearDupKey(col("text")))
      .groupBy("k").agg(min("doc_id").as("doc_id"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == batchKeep)
    // sanity: the near-dup pair's EXACT hashes differ (ST4 would keep both)
    assert(spark.range(1).select(md5(lit(a)) =!= md5(lit(aNearDup))).as[Boolean].head())
  }

  test("ST3: idle state expires from ADVANCING EVENT TIME (watermark), not wall clock") {
    val input = MemoryStream[StreamEvent](spark)
    val q = Streaming.sessionize(input.toDS(), idleStateTimeout = true)
      .writeStream.format("memory").queryName("st3_expiry_out")
      .outputMode(OutputMode.Update()).start()
    runBatches(q, input, Seq(
      // user 1: 2 events, one session (ts(1) start keeps clear of the
      // epoch-0 initial watermark boundary)
      Seq(StreamEvent(1L, 1L, ts(1)), StreamEvent(1L, 2L, ts(10))),
      // user 2 far in the future; watermark -> 300 min at batch end
      Seq(StreamEvent(2L, 3L, ts(300))),
      // watermark (300) now exceeds user 1's expiry (10 + 60): this
      // batch fires the event-time timeout and drops user 1's state
      Seq(StreamEvent(2L, 4L, ts(310))),
      // user 1 returns: state restarts at (1 session, 1 event) — the
      // un-expired continuation would read (2 sessions, 3 events)
      Seq(StreamEvent(1L, 5L, ts(320)))))
    val user1 = spark.table("st3_expiry_out").as[SessionSummary].collect()
      .filter(_.user_id == 1L).toSet
    assert(user1 == Set(SessionSummary(1L, 1L, 2L), SessionSummary(1L, 1L, 1L)))
    // the whole run used event-time batches only — no wall-clock sleeps:
    // expiry was driven by the watermark, deterministically replayable
  }

  test("ST3: stateful sessionization carries state across batches") {
    val input = MemoryStream[StreamEvent](spark)
    // idle-state timeout off: the batch mirror below has no expiry
    val q = Streaming.sessionize(input.toDS(), idleStateTimeout = false)
      .writeStream.format("memory").queryName("st3_out")
      .outputMode(OutputMode.Update()).start()
    // user 1: events at 0, 10, 50 min -> gap>30 between 10 and 50: 2 sessions
    val batch1 = Seq(
      StreamEvent(1L, 1L, ts(0)), StreamEvent(1L, 2L, ts(10)), StreamEvent(1L, 3L, ts(50)),
      StreamEvent(2L, 4L, ts(0)))
    // batch 2: user 1 at 55 min (5-min gap: same session), user 2 at 100 (new session)
    val batch2 = Seq(StreamEvent(1L, 5L, ts(55)), StreamEvent(2L, 6L, ts(100)))
    runBatches(q, input, Seq(batch1, batch2))
    val updates = spark.table("st3_out").as[SessionSummary].collect()
    val latest = updates.groupBy(_.user_id)
      .map { case (u, rows) => u -> rows.maxBy(_.num_events) }
    assert(latest(1L) == SessionSummary(1L, 2L, 4L))
    assert(latest(2L) == SessionSummary(2L, 2L, 2L))
    // batch mirror (q17 lag-window logic) agrees on the same data
    val all = (batch1 ++ batch2).toDF()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    val mirror = all
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session", when(col("prev_ts").isNull ||
        unix_micros(col("ts")) - unix_micros(col("prev_ts")) > Streaming.SessionGapMicros,
        1L).otherwise(0L))
      .groupBy(col("user_id"))
      .agg(sum(col("new_session")).as("num_sessions"), count(lit(1)).as("num_events"))
      .as[SessionSummary].collect().map(s => s.user_id -> s).toMap
    assert(latest(1L) == mirror(1L) && latest(2L) == mirror(2L))
  }
}
