package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** An event on the stream (events table schema, micros-precision ts). */
final case class StreamEvent(user_id: Long, event_id: Long, ts: java.sql.Timestamp)

/** Per-user sessionization state carried across micro-batches. */
final case class SessionState(lastTsMicros: Long, numSessions: Long, numEvents: Long)

/** Per-user session summary emitted each update. */
final case class SessionSummary(user_id: Long, num_sessions: Long, num_events: Long)

/** Structured Streaming operators (SURVEY §2.7, ST1–ST3).
  *
  * Batch/stream unification is the point: ST1 reuses the model
  * subsystem's Validator unchanged (expectations are Column expressions,
  * which stream as-is), ST2 is the streaming form of the q15 batch
  * window, ST3 is the stateful form of the q17 lag-window batch mirror —
  * the specs (StreamingSpec) assert stream results equal the batch
  * mirrors on the same data.
  *
  * Scale notes: watermarks bound state for the window agg; session state
  * is O(active users) with idle-state expiry via event-time timeout;
  * everything keys by user/window so state shards across executors.
  */
object Streaming {

  /** ST1: validate a stream in flight — appends the violations array
    * column; works on any streaming DataFrame because validation is a
    * pure expression tree (no UDF, no state). */
  def validateStream(df: DataFrame, expectations: Seq[(String, String)]): DataFrame =
    graft.model.Validator.validate(df, expectations)

  /** ST2: watermarked tumbling-window aggregate (streaming mirror of
    * q15_events_window). Late data beyond the watermark is dropped;
    * append mode emits a window only once it is final. */
  def tumblingCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("total_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH").as("hour"),
        col("event_type"), col("cnt"), col("total_value"))

  /** ST4: streaming exact dedup — the streaming twin of d1_exact_dedup.
    * Content-hash keyed dropDuplicatesWithinWatermark: the first arrival
    * of each hash passes through, later copies are dropped, and the
    * dedup state holds one entry per hash only within the watermark
    * horizon — bounded state, unlike a bare dropDuplicates whose state
    * grows with the stream's lifetime (fatal at 100 TB/day ingest). The
    * horizon IS the operator contract: a duplicate arriving more than
    * `watermark` after its original may pass (standard streaming-dedup
    * semantics; an exact batch d1 pass downstream catches stragglers). */
  def dedupStream(docs: DataFrame, tsCol: String = "ts",
                  watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("content_hash", md5(col("text")))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("content_hash")

  /** ST6: streaming NEAR-dup suppression — the streaming face of the
    * D2 MinHash family. Each document's dedup key is its per-row
    * MinHash band key (same md5 + affine-mix constants as the batch
    * pipeline, computed as array expressions — no window/aggregate, so
    * it streams); a later document whose band key was seen within the
    * watermark horizon is dropped. Catches duplicates exact hashing
    * misses (whitespace/case-only edits normalize to the same token
    * stream → same signature) with single-band recall semantics: a
    * band collides iff all its mins agree — run B parallel pipelines
    * keyed on different bands for higher recall, exactly as batch LSH
    * uses B bands. Docs too short to shingle fall back to exact
    * content-hash dedup (prefixed key — never collides with band
    * keys). State: one entry per distinct key within the horizon.
    *
    * PRECISION caveat — this is SUPPRESSION, not verified dedup: a
    * band collision between genuinely distinct documents drops the
    * later one without a Jaccard check (a pair at similarity J
    * collides with probability ~J^numHashes; the default 8 puts a
    * J=0.6 pair at ~1.7%). Where false drops are unacceptable, use
    * this stage to TAG (join the key back) and verify downstream with
    * the batch D4 Jaccard pass instead of dropping in-stream. */
  def nearDupStream(docs: DataFrame, tsCol: String = "ts",
                    watermark: String = "1 hour",
                    numHashes: Int = 8): DataFrame = {
    docs
      .withColumn("band_key", nearDupKey(col("text"), numHashes))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("band_key")
  }

  /** The ST6 key as a plain column expression (shared by the batch
    * mirror in specs). */
  def nearDupKey(text: org.apache.spark.sql.Column, numHashes: Int = 8): org.apache.spark.sql.Column = {
    val sh = graft.text.TextFunctions.shingles(graft.text.TextFunctions.tokens(text), 3)
    val sig = graft.dedup.Dedup.minhashFromBase(graft.dedup.Dedup.shingleBaseHashes(sh), numHashes)
    when(size(sh) === 0, concat(lit("x:"), md5(text)))
      .otherwise(concat_ws("|", sig.cast("array<string>")))
  }

  /** ST5: watermarked stream-stream interval join — each left event
    * picks up right-side events for the same key within the trailing
    * `boundSeconds` window. Both sides carry watermarks and the join
    * condition bounds event time on BOTH ends, so Spark can expire join
    * state once the watermark passes a row's last possible match — the
    * state-bounding contract without which a stream-stream join
    * accumulates one side forever. Append mode: a pair emits once its
    * window is final. */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   keyCol: String, tsCol: String,
                   watermark: String, boundSeconds: Long): DataFrame = {
    // flat l_/r_ prefixes, not structs: packing the watermarked ts into
    // a struct duplicates the event-time column and Spark rejects a
    // stream with more than one
    val l = left.withWatermark(tsCol, watermark)
      .select(left.columns.map(c => col(c).as(s"l_$c")).toIndexedSeq: _*)
    val r = right.withWatermark(tsCol, watermark)
      .select(right.columns.map(c => col(c).as(s"r_$c")).toIndexedSeq: _*)
    l.join(r,
      col(s"l_$keyCol") === col(s"r_$keyCol") &&
        col(s"r_$tsCol") >= col(s"l_$tsCol") - expr(s"INTERVAL $boundSeconds SECONDS") &&
        col(s"r_$tsCol") <= col(s"l_$tsCol"))
  }

  /** ST9: streaming count-min sketch — the t10 batch sketch maintained
    * continuously. CMS's merge algebra (cell-wise addition) makes the
    * streaming form a plain streaming aggregation in Update mode: each
    * micro-batch's partial cells fold into the stored cells, state is
    * EXACTLY depth×width rows forever (no watermark needed — the state
    * cannot grow), and the stored sketch at any point equals the batch
    * sketch over everything ingested so far. This is the bounded-memory
    * heavy-hitter monitor a 100 TB/day token firehose needs: frequency
    * estimates without per-term state. */
  def cmsStream(docs: DataFrame, textCol: String = "text"): DataFrame = {
    import graft.text.TextFunctions.tokens
    cmsAggregate(docs.select(explode(tokens(col(textCol))).as("term")))
  }

  /** ST11: streaming passage-boilerplate monitor — D7's chunk grain
    * through the SAME CMS algebra as ST9. Chunk hashes stream into the
    * fixed depth×width sketch, so "which passages are recurring across
    * the corpus RIGHT NOW" is answerable with bounded state at any
    * scale — the online form of d7's exact corpus-frequency pass (the
    * sketch never underestimates, so every true boilerplate chunk
    * clears the threshold; rare false positives are re-checked exactly
    * by the next batch d7 run). */
  def chunkCmsStream(docs: DataFrame, textCol: String = "text",
                     chunkWidth: Int = graft.dedup.DedupQueries.ChunkWidth): DataFrame = {
    import graft.text.TextFunctions.{chunks, tokens}
    cmsAggregate(docs.select(
      explode(chunks(tokens(col(textCol)), chunkWidth)).as("term")))
  }

  /** ONE stateful aggregate over a `term` unit stream (chained streaming
    * aggregations are unsupported; a vocab-level pre-aggregate would
    * carry per-term state — exactly what a sketch avoids). Map-side
    * partial aggregation combines each micro-batch's unit stream down
    * to ≤ depth×width partial cells per partition. */
  private def cmsAggregate(units: DataFrame): DataFrame = {
    import graft.text.TextQueries.{cmsHash, CmsDepth}
    units
      .select(posexplode(array((0 until CmsDepth).map(d => cmsHash(col("term"), d)): _*))
        .as(Seq("d", "w")))
      .groupBy(col("d"), col("w"))
      .agg(count(lit(1)).as("cell_count"))
  }

  /** ST8: governed streaming ingest — the reference's batch governance
    * contract (validate rows against the model's expectations, land
    * clean rows in the governed table, quarantine violators with their
    * rule names) run continuously. `foreachBatch` applies the SAME
    * batch Validator to every micro-batch — batch/stream unification
    * means the rule logic exists once — and fans one validation pass
    * out to both destinations (the micro-batch is cached for the two
    * writes, then released). Violation rules ride along in the
    * quarantine table so reprocessing knows WHY each row was held.
    *
    * EXACTLY-ONCE (round-11): both sinks are partitioned by
    * [[BatchIdColumn]] and written with dynamic partition overwrite, so
    * a batch replayed after a sink-completed-but-checkpoint-uncommitted
    * failure REWRITES its own partition instead of appending
    * duplicates — idempotent at any crash point, because overwrite of
    * the same partition with the same (deterministic) batch content is
    * a no-op. The batch-id partition column doubles as ingest lineage
    * and keeps the overwrite file-local (a replay touches only that
    * partition's files, never the table). StreamingSpec replays a batch
    * through [[governedIngestBatch]] and asserts zero duplicates. */
  def governedIngest(stream: DataFrame,
                     rules: Seq[(String, String)],
                     cleanTable: String,
                     quarantineTable: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      governedIngestBatch(batch, batchId, rules, cleanTable, quarantineTable)
    }

  /** The batch-id lineage/idempotence partition column of ST8's sinks. */
  val BatchIdColumn = "_batch_id"

  /** ST8's per-micro-batch body, exposed so the replay contract is
    * directly testable: calling this twice with the same `batchId` and
    * the same rows — exactly what Spark does when a failure lands
    * between sink completion and checkpoint commit — leaves both
    * tables unchanged after the second call. */
  private[graft] def governedIngestBatch(batch: DataFrame, batchId: Long,
      rules: Seq[(String, String)], cleanTable: String,
      quarantineTable: String): Unit = {
    import graft.model.Validator
    val validated = Validator.validate(batch, rules)
      .withColumn(BatchIdColumn, lit(batchId)).cache()
    try {
      landBatchPartition(validated
        .filter(size(col(Validator.ViolationColumn)) === 0)
        .drop(Validator.ViolationColumn), cleanTable)
      landBatchPartition(validated
        .filter(size(col(Validator.ViolationColumn)) > 0), quarantineTable)
    } finally { validated.unpersist(); () }
  }

  /** Land one micro-batch's rows (already carrying [[BatchIdColumn]])
    * idempotently: first batch creates the partitioned table, later
    * batches INSERT OVERWRITE only the partitions present in the data
    * (dynamic mode), so a replay replaces its own earlier attempt. */
  /** Serializes the session-global partitionOverwriteMode flip below:
    * ST8 and ST16 share [[landBatchPartition]], and two concurrent
    * streams (or any other writer flipping the same conf) could
    * otherwise interleave a write under the wrong mode or clobber each
    * other's finally-restore. Coarse (JVM-wide, not per-session) but
    * the flip lasts only for the insertInto. */
  private object OverwriteModeLock

  private def landBatchPartition(df: DataFrame, table: String): Unit = {
    val spark = df.sparkSession
    if (!spark.catalog.tableExists(table))
      df.write.partitionBy(BatchIdColumn).format("parquet").saveAsTable(table)
    else OverwriteModeLock.synchronized {
      // session-conf form: the per-write option spelling is not honored
      // on this insertInto path, and a static overwrite would wipe every
      // earlier batch's partition — restore the previous value after
      val key = "spark.sql.sources.partitionOverwriteMode"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key, "dynamic")
      try df.write.mode("overwrite").insertInto(table)
      finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }

  /** ST10: streaming IVF index maintenance — the persisted ANN index
    * ingests a vector stream. Same batch/stream unification as ST8:
    * `foreachBatch` applies the SAME [[graft.sim.IvfIndex.append]] to
    * every micro-batch, so assignment uses the FROZEN build-time
    * centroids (new vectors land in lists existing probes already
    * search — results stay consistent mid-stream) and every append
    * writes under the table's bucket spec, so probe-side bucket pruning
    * keeps firing as the corpus grows. The operator carries NO streaming
    * state: the bucketed index table IS the state.
    *
    * IDEMPOTENT REPLAY (round-11): applied batch ids are recorded in a
    * tiny side table (`<index>_ingest_log`, one row per batch) written
    * AFTER the data append; a replayed batch id is skipped, so the
    * standard failure mode — sink completed, checkpoint commit did not —
    * appends nothing twice. The residual window is a crash BETWEEN the
    * data append and the log append within one micro-batch, which
    * replays that one batch's rows (at-least-once for exactly that
    * window); duplicate index rows degrade probe ranking not at all
    * (same neighbor twice) and the window closes for real only with a
    * transactional table format — the TableFormat/Delta seam (M9/M14)
    * is where that lands. The log check is O(batches), not O(corpus).
    * Centroid drift under a shifting stream shows up in
    * [[graft.sim.IvfIndex.listSizes]] skew — the rebuild trigger,
    * exactly as in the batch world. */
  def ivfMaintain(vectors: DataFrame, index: graft.sim.IvfIndex.Handle,
                  idCol: String, vecCol: String):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    vectors.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      ivfMaintainBatch(batch, batchId, index, idCol, vecCol)
    }

  /** ST10's per-micro-batch body (see [[ivfMaintain]]); exposed so the
    * replay contract is directly testable. */
  private[graft] def ivfMaintainBatch(batch: DataFrame, batchId: Long,
      index: graft.sim.IvfIndex.Handle, idCol: String, vecCol: String): Unit = {
    val spark = batch.sparkSession
    val log = index.table + "_ingest_log"
    val applied = spark.catalog.tableExists(log) &&
      !spark.table(log).filter(col("batch_id") === batchId).isEmpty
    if (!applied) {
      graft.sim.IvfIndex.append(index, batch, idCol, vecCol)
      spark.range(1).select(lit(batchId).as("batch_id"))
        .write.mode("append").format("parquet").saveAsTable(log)
    }
  }

  /** ST16: streaming ingest dedup against the PERSISTED dedup index
    * (round 11 — the streaming face of [[graft.dedup.DedupIndex]], and
    * the shape a 100 TB/day ingest pipeline actually runs): every
    * micro-batch (1) probes the index — estimated-Jaccard candidates
    * with NO index-side Exchange, per-batch cost independent of corpus
    * size; (2) lands only NOVEL documents in `cleanTable`; (3) appends
    * the novel documents' signatures, so later batches dedup against
    * earlier ones too, not just the build-time history. WITHIN-batch
    * duplicates of a novel document all land (the index only knows a
    * document after its batch commits) — pair with ST4 upstream for
    * intra-batch exactness, the same layering as ST10's contract.
    *
    * Idempotence mirrors ST10: applied batch ids are recorded in the
    * index's ingest log AFTER the clean-write + signature append, and a
    * replayed id is skipped whole. The clean write itself is
    * batch-id-partitioned with dynamic overwrite (ST8's mechanism).
    * The crash window — after the signature append, before the log
    * row — replays the batch against an index that ALREADY holds the
    * batch's own signatures; the probe therefore excludes EVERY match
    * whose index side is one of the batch's own ids (not merely
    * identical-id self-matches: two mutually-near novel docs in one
    * batch would otherwise each flag the other on replay and both be
    * dropped by the partition rewrite), so the replayed `novel` set is
    * identical, the partition rewrite is a no-op, and the only residue
    * is duplicate signature rows (probe cost, never correctness —
    * StreamingSpec replays against a lost log, including an intra-batch
    * near-dup pair, and asserts the clean table unchanged). The id spaces of the stream and the index must
    * be disjoint-for-distinct-documents (the pipeline's id contract);
    * a NEW document reusing an indexed id would be misread as a
    * self-match and land without dedup against that one id. */
  def indexedIngest(stream: DataFrame, index: graft.dedup.DedupIndex.Handle,
                    idCol: String, textCol: String, threshold: Double,
                    maxBucket: Int, cleanTable: String):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      indexedIngestBatch(batch, batchId, index, idCol, textCol, threshold,
        maxBucket, cleanTable)
    }

  /** ST16's per-micro-batch body (see [[indexedIngest]]); exposed so
    * the replay contract is directly testable. */
  private[graft] def indexedIngestBatch(batch: DataFrame, batchId: Long,
      index: graft.dedup.DedupIndex.Handle, idCol: String, textCol: String,
      threshold: Double, maxBucket: Int, cleanTable: String): Unit = {
    val spark = batch.sparkSession
    val log = index.table + "_ingest_log"
    val applied = spark.catalog.tableExists(log) &&
      !spark.table(log).filter(col("batch_id") === batchId).isEmpty
    if (applied) return
    // batch-match exclusion: a replayed batch (crash between signature
    // append and log write) finds the batch's OWN signatures in the
    // index — not just each doc's own (self-match) but also those of
    // its within-batch near-duplicates: two mutually-near novel docs
    // would each flag the other and BOTH vanish from the rewritten
    // partition. Excluding every probe match whose index_id is in the
    // batch's id set makes the replayed novel set identical to the
    // original for every shape (within-batch matches are ST4's layer,
    // exactly as on the first run, when the index couldn't see them).
    val batchIds = batch.select(col(idCol).as("graft_batch_id"))
    val dups = graft.dedup.DedupIndex.probe(
        index, batch, idCol, textCol, threshold)
      .join(broadcast(batchIds), col("index_id") === col("graft_batch_id"),
        "left_anti")
      .select(col("batch_id").as("graft_dup_id")).distinct()
    // the dup id set is bounded by the batch (small side by contract)
    val novel = batch.join(broadcast(dups),
        batch(idCol) === col("graft_dup_id"), "left_anti")
      .withColumn(BatchIdColumn, lit(batchId))
      // one pass feeds both the clean write and the signature append
      .cache()
    try {
      landBatchPartition(novel, cleanTable)
      graft.dedup.DedupIndex.append(index, novel.drop(BatchIdColumn),
        idCol, textCol, maxBucket)
      spark.range(1).select(lit(batchId).as("batch_id"))
        .write.mode("append").format("parquet").saveAsTable(log)
    } finally { novel.unpersist(); () }
  }

  /** ST7: stream-static enrichment join — every streamed row picks up
    * its dimension attributes. The static side is broadcast (explicit
    * hint: dims are fixed-cardinality, never SF-scaled) and re-planned
    * each micro-batch, so a catalog-table dim picks up updates between
    * batches and the operator carries NO streaming state at all — the
    * cheapest possible join a 100 TB/day enrichment pass can run.
    * Left join: an event with no dim row flows through with nulls
    * (dropping events silently on a late-arriving dim is the classic
    * enrichment bug). */
  def enrichStream(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** ST12: streaming per-group quota admission — the stream twin of
    * the p6 target mixture: the first `target(group)` arrivals of each
    * group pass, the rest drop. One long of state per group
    * (`mapGroupsWithState`, no timeout — the group universe IS the
    * mixture spec, so state is bounded by |targets| forever). Admission
    * is by ARRIVAL order within each micro-batch's group iterator —
    * deterministic for a deterministic source; pair with an event-time
    * sort upstream if the source interleaves. Emits (group, admitted
    * ids, running total) per update. */
  def quotaStream(docs: Dataset[(String, Long)], targets: Map[String, Int]):
      Dataset[(String, Seq[Long], Long)] = {
    import docs.sparkSession.implicits._
    docs
      .filter(r => targets.contains(r._1))
      .groupByKey(_._1)
      .mapGroupsWithState[Long, (String, Seq[Long], Long)](
        GroupStateTimeout.NoTimeout) { (group, rows, state) =>
        val admitted0 = state.getOption.getOrElse(0L)
        val quota = targets(group).toLong
        val take = rows.map(_._2).take(math.max(0L, quota - admitted0).toInt).toSeq
        val admitted = admitted0 + take.size
        state.update(admitted)
        (group, take, admitted)
      }
  }

  /** Session gap: 30 minutes (micros) — same constant as q17Sessions. */
  val SessionGapMicros: Long = 1800L * 1000 * 1000

  /** Idle-state expiry horizon: 1 hour of EVENT time after a user's
    * last event, their session state is dropped. */
  val IdleExpiryMs: Long = 3600L * 1000

  /** ST3: stateful sessionization via flatMapGroupsWithState — a new
    * session starts after a >30 min idle gap. Emits the running per-user
    * (num_sessions, num_events) each update (Update output mode).
    *
    * State expires on an EVENT-TIME timeout keyed off the watermark:
    * a user idle for [[IdleExpiryMs]] of event time is dropped once the
    * watermark passes that horizon. The clock being the watermark (not
    * wall clock) makes expiry deterministic under replay/backfill — a
    * re-run at any processing speed expires exactly the same users at
    * exactly the same stream positions, where a processing-time timer
    * would expire whoever the wall clock happened to catch. Bounded
    * state either way: O(users active within the horizon). The
    * watermark delay is the out-of-order tolerance: events later than
    * it are dropped (the price of the expiry guarantee) — size it to
    * the source's real disorder. */
  def sessionize(events: Dataset[StreamEvent],
                 idleStateTimeout: Boolean = true,
                 watermark: String = "10 minutes"): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    val timeoutConf =
      if (idleStateTimeout) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    // EventTimeTimeout requires a watermark on the event-time column
    val src = if (idleStateTimeout) events.withWatermark("ts", watermark) else events
    src
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionSummary](
        OutputMode.Update(), timeoutConf) {
        (userId: Long, batch: Iterator[StreamEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // micro-batch delivery order is not sorted — order explicitly
            val evs = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            if (evs.isEmpty) Iterator.empty
            else {
              val init = state.getOption.getOrElse(SessionState(Long.MinValue, 0L, 0L))
              val next = evs.foldLeft(init) { (st, e) =>
                val tsMicros = e.ts.getTime * 1000
                val newSession =
                  st.lastTsMicros == Long.MinValue ||
                    tsMicros - st.lastTsMicros > SessionGapMicros
                SessionState(tsMicros,
                  st.numSessions + (if (newSession) 1 else 0),
                  st.numEvents + 1)
              }
              state.update(next)
              // expire at last-event-time + horizon; Spark requires the
              // timeout to sit strictly past the current watermark (a
              // late straggler could otherwise set one already elapsed)
              if (idleStateTimeout)
                state.setTimeoutTimestamp(math.max(
                  next.lastTsMicros / 1000 + IdleExpiryMs,
                  state.getCurrentWatermarkMs() + 1))
              Iterator.single(SessionSummary(userId, next.numSessions, next.numEvents))
            }
          }
      }
  }

  /** Funnel stage timestamps carried per user (micros; MaxValue = stage
    * not yet seen) plus the user's last event time (expiry clock).
    * Conditional MIN is commutative and idempotent, so state converges
    * to the batch answer under ANY arrival order or replay — the
    * strongest cross-batch exactness class (same as ST9's sketch merge,
    * stronger than order-sensitive ST12). */
  final case class FunnelState(t1: Long, t2: Long, t3: Long, t4: Long, lastUs: Long)

  /** Per-user funnel progress emitted each update: the same
    * first-occurrence strict 7-day-window stage flags as batch
    * q30_funnel computes. */
  final case class FunnelProgress(
      user_id: Long, s1: Boolean, s2: Boolean, s3: Boolean, s4: Boolean)

  /** Per-step conversion window: shared with batch q30Funnel so the
    * twins cannot drift. */
  val FunnelStepBoundUs: Long = graft.ops.Relational.FunnelStepBoundUs

  /** Funnel idle-expiry horizon: 4 step windows (28 d) of EVENT time.
    * Expiry is LOSSY for a user who returns after it: their earlier
    * stages are forgotten, so the fresh state re-emits flags computed
    * from post-return events only (e.g. an s1=true user re-emits
    * s1=false) — the standard watermark-horizon trade (ST4's
    * batch-pass-catches-stragglers note applies). Size the horizon to
    * how long the product attributes a conversion; a dashboard that
    * must stay exact across returns should OR flags per user instead
    * of taking the latest row. */
  val FunnelExpiryUs: Long = 4L * FunnelStepBoundUs

  /** ST13: streaming funnel tracking — the stream twin of q30_funnel.
    * State is FOUR LONGS per user (first signup/view/click/purchase
    * micros) + the expiry clock, updated by conditional min; each update
    * emits the user's current stage flags under the batch rule (stage k
    * reached iff its first event lands strictly after stage k-1's and
    * within 7 days). A dashboard sums the latest flags per user for live
    * funnel counts. With `expiry = true` a user idle past
    * [[FunnelExpiryUs]] of EVENT time is dropped once the watermark
    * passes that horizon — the same deterministic watermark-clocked
    * expiry as [[sessionize]], bounding state at O(users active within
    * the horizon) at the cost of the lossy-return caveat documented on
    * [[FunnelExpiryUs]]; `expiry = false` keeps state (and exactness)
    * forever, which is also what lets specs replay unwatermarked
    * planted batches. */
  def funnelStream(events: Dataset[(Long, String, java.sql.Timestamp)],
                   expiry: Boolean = false,
                   watermark: String = "10 minutes"): Dataset[FunnelProgress] = {
    import events.sparkSession.implicits._
    val timeoutConf =
      if (expiry) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    val src = if (expiry) events.withWatermark("_3", watermark) else events
    src
      .groupByKey(_._1)
      .flatMapGroupsWithState[FunnelState, FunnelProgress](
        OutputMode.Update(), timeoutConf) { (userId, batch, state) =>
        if (state.hasTimedOut) {
          state.remove()
          Iterator.empty
        } else {
          val M = Long.MaxValue
          val init = state.getOption.getOrElse(FunnelState(M, M, M, M, Long.MinValue))
          val next = batch.foldLeft(init) { (st, e) =>
            val us = tsMicros(e._3)
            val touched = e._2 match {
              case "signup"   => st.copy(t1 = math.min(st.t1, us))
              case "view"     => st.copy(t2 = math.min(st.t2, us))
              case "click"    => st.copy(t3 = math.min(st.t3, us))
              case "purchase" => st.copy(t4 = math.min(st.t4, us))
              case _          => st
            }
            touched.copy(lastUs = math.max(touched.lastUs, us))
          }
          if (next == init) Iterator.empty
          else {
            state.update(next)
            if (expiry)
              state.setTimeoutTimestamp(math.max(
                next.lastUs / 1000 + FunnelExpiryUs / 1000,
                state.getCurrentWatermarkMs() + 1))
            def within(later: Long, earlier: Long) =
              later != M && earlier != M &&
                later > earlier && later - earlier <= FunnelStepBoundUs
            val s1 = next.t1 != M
            val s2 = within(next.t2, next.t1)
            val s3 = s2 && within(next.t3, next.t2)
            val s4 = s3 && within(next.t4, next.t3)
            Iterator.single(FunnelProgress(userId, s1, s2, s3, s4))
          }
        }
      }
  }

  /** Sliding-DAU window length in days — shared with batch q31. */
  val DauWindowDays: Int = 7

  /** Exact micros from a Timestamp: getTime alone floors to millis
    * (collapsing distinct micro-stamps, flipping strict comparisons vs
    * batch unix_micros), and `/` instead of floorDiv would round
    * pre-epoch stamps the wrong way. The ONE copy all stateful
    * operators share — a past review round fixed this subtlety and a
    * later one found it re-inlined three times. */
  private[graft] def tsMicros(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000

  /** Epoch day of a Timestamp under the UTC session clock. */
  private[graft] def tsEpochDay(t: java.sql.Timestamp): Int =
    Math.floorDiv(tsMicros(t), 86400000000L).toInt

  /** Keyset-union count diff (after − before), zero entries dropped —
    * the correction-emission algebra ST14/ST15 share. */
  private[graft] def diffCounts[K](before: Map[K, Long], after: Map[K, Long]): Map[K, Long] =
    (before.keySet ++ after.keySet).iterator
      .map(k => k -> (after.getOrElse(k, 0L) - before.getOrElse(k, 0L)))
      .filter(_._2 != 0L).toMap

  /** A ±1 boundary-delta correction for the sliding-DAU count at
    * `day` (epoch days). Downstream, per-day sums + a cumulative sum
    * over the tiny day domain give every day's trailing-7-day distinct
    * count — identical to batch q31's decomposition. */
  final case class DauDelta(day: Int, delta: Long)

  /** Per-user sliding-DAU state: the user's distinct active days seen
    * so far, sorted ascending. Bounded by the day calendar (≤ a few
    * hundred ints for a year-scale stream); a production deployment
    * additionally expires users idle past the window horizon via
    * event-time timeout exactly as [[sessionize]] does. */
  final case class DauState(days: List[Int])

  /** Disjoint contribution intervals [dᵢ, min(dᵢ+6, dᵢ₊₁−1)] of a
    * sorted active-day list — the same decomposition batch
    * [[graft.ops.Relational.slidingDau]] computes with lead(). */
  private[graft] def dauIntervals(days: List[Int]): List[(Int, Int)] = days match {
    case Nil => Nil
    case _ =>
      days.zip(days.drop(1).map(Option(_)) :+ None).map { case (d, nxt) =>
        val cap = d + DauWindowDays - 1
        (d, nxt.map(n => math.min(cap, n - 1)).getOrElse(cap))
      }
  }

  private[graft] def dauDeltas(days: List[Int]): Map[Int, Long] =
    dauIntervals(days)
      .flatMap { case (s, e) => Seq(s -> 1L, (e + 1) -> -1L) }
      .groupMapReduce(_._1)(_._2)(_ + _)

  /** A ±1 correction to the retention cell (cohort week-start epoch
    * day, week offset). Downstream per-cell sums ARE the live retention
    * triangle — the streaming form of q32's (cohort, offset) counts. */
  final case class RetentionDelta(cohort_day: Int, week_offset: Int, delta: Long)

  /** Per-user retention state: distinct active week-start days, sorted.
    * Calendar-bounded (≤52/yr) like batch q32's collect_set. */
  final case class RetentionState(weeks: List[Int])

  private[graft] def retentionCells(weeks: List[Int]): Map[(Int, Int), Long] =
    weeks match {
      case Nil => Map.empty
      case ws =>
        val cohort = ws.min
        ws.map(w => (cohort, (w - cohort) / 7) -> 1L).toMap
    }

  /** Blocked-bitmask per-user state (r16, the batch q31/q32 bitmask
    * algebra's stream mirror): a sorted int set stored as word-indexed
    * 64-bit masks — `base` is the first word index, `words(i)` holds
    * bits for values in [ (base+i)·64, (base+i)·64+63 ]. For a
    * year-active user this is 6 longs instead of ~365 ints; the delta
    * algebra is unchanged (states decode to the same sorted list the
    * list-state forms hold). Encode trims leading/trailing empty words
    * so a pruned state stays small. */
  final case class MaskState(base: Long, words: Array[Long])

  private[graft] def maskEncode(vals: Seq[Int]): MaskState = {
    if (vals.isEmpty) return MaskState(0L, Array.empty)
    val lo = Math.floorDiv(vals.min, 64)
    val hi = Math.floorDiv(vals.max, 64)
    val words = new Array[Long]((hi - lo + 1).toInt)
    vals.foreach { v =>
      val w = Math.floorDiv(v, 64) - lo
      words(w.toInt) |= 1L << Math.floorMod(v, 64)
    }
    MaskState(lo.toLong, words)
  }

  private[graft] def maskDecode(s: MaskState): List[Int] = {
    val out = scala.collection.mutable.ListBuffer.empty[Int]
    var w = 0
    while (w < s.words.length) {
      var m = s.words(w)
      while (m != 0L) {
        val b = java.lang.Long.numberOfTrailingZeros(m)
        out += ((s.base + w) * 64 + b).toInt
        m &= m - 1
      }
      w += 1
    }
    out.toList
  }

  /** ST15: streaming cohort retention — the stream twin of
    * q32_retention, with blocked-bitmask per-user state (r16: promoted
    * after the A/B in stream_bench_r16.json — parity on the 5-week
    * bench corpus, strictly smaller state on wide calendars; the
    * list-state form is retained as [[retentionStreamListState]]).
    * Emitted-delta semantics are IDENTICAL to the list form (the
    * equality is spec-pinned): per-user distinct active week-starts,
    * stored as masks over the week index ((day − 4)/7, exact for
    * Monday-aligned week starts); each update emits ±1 cell
    * corrections, a late earlier first-week retracts the old cohort's
    * cells. See [[retentionStreamListState]]'s scaladoc for the
    * no-expiry rationale (lifetime cohorts make expiry lossy). */
  def retentionStream(events: Dataset[(Long, java.sql.Timestamp)])
      : Dataset[RetentionDelta] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_._1)
      .flatMapGroupsWithState[MaskState, RetentionDelta](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (_, batch, state) =>
          val oldWeeks = state.getOption.map(maskDecode).getOrElse(Nil)
            .map(w => w * 7 + 4)
          val newWeeks = batch.map { e =>
            val epochDay = tsEpochDay(e._2).toLong
            (epochDay - Math.floorMod(epochDay + 3, 7L)).toInt
          }.toSet -- oldWeeks
          if (newWeeks.isEmpty) Iterator.empty
          else {
            val merged = (oldWeeks ++ newWeeks).sorted
            state.update(maskEncode(merged.map(w => (w - 4) / 7)))
            diffCounts(retentionCells(oldWeeks), retentionCells(merged))
              .iterator.map { case ((c, o), d) => RetentionDelta(c, o, d) }
          }
      }
  }

  /** ST14: streaming sliding-window distinct users — the stream twin
    * of q31_sliding_dau, with blocked-bitmask per-user state (r16:
    * promoted after the A/B in stream_bench_r16.json — on the sf1
    * replay the mask form writes 2.1× less state (2548 vs 5450 KB
    * cumulative, 141 vs 403 KB steady-state delta) at +30% rows/s in
    * no-expiry mode, parity in expiry mode; the list-state form is
    * retained as [[slidingDauStreamListState]]). Emitted ±1
    * boundary-delta semantics are IDENTICAL to the list form
    * (spec-pinned equality); same expiry/prune semantics (decode →
    * prune → re-encode; the trim keeps pruned states word-tight). See
    * [[slidingDauStreamListState]]'s scaladoc for the full delta
    * algebra and the expiry no-double-count proof. */
  def slidingDauStream(events: Dataset[(Long, java.sql.Timestamp)],
                           expiry: Boolean = false,
                           watermark: String = "10 minutes"): Dataset[DauDelta] = {
    import events.sparkSession.implicits._
    val timeoutConf =
      if (expiry) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    val src = if (expiry) events.withWatermark("_2", watermark) else events
    src
      .groupByKey(_._1)
      .flatMapGroupsWithState[MaskState, DauDelta](
        OutputMode.Update(), timeoutConf) {
        (_, batch, state) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val oldDays = state.getOption.map(maskDecode).getOrElse(Nil)
            val newDays = batch.map(e => tsEpochDay(e._2)).toSet -- oldDays
            if (newDays.isEmpty) Iterator.empty
            else {
              val merged = (oldDays ++ newDays).sorted
              val kept =
                if (!expiry) merged
                else {
                  val cutoff = Math.floorDiv(state.getCurrentWatermarkMs(), 86400000L).toInt
                  val idx = merged.lastIndexWhere(_ <= cutoff)
                  if (idx <= 0) merged else merged.drop(idx)
                }
              state.update(maskEncode(kept))
              if (expiry)
                state.setTimeoutTimestamp(math.max(
                  (merged.last.toLong + 1 + DauWindowDays) * 86400000L,
                  state.getCurrentWatermarkMs() + 1))
              diffCounts(dauDeltas(oldDays), dauDeltas(merged))
                .iterator.map { case (d, v) => DauDelta(d, v) }
            }
          }
      }
  }

  /** r16 list-state baseline of [[retentionStream]] (sorted week-start
    * list per user) — retained for the StreamBench A/B.
    *
    * State is the user's distinct active week-start set;
    * each update emits the DIFFERENCE between new and old retention
    * cells as ±1 corrections. A LATE earlier first-week changes the
    * user's cohort: the old cohort's cells retract (−1) and the new
    * cohort's cells assert (+1) in one correction batch — downstream
    * per-cell sums stay exactly the batch triangle under any arrival
    * order. Same retraction-as-negative-delta algebra as ST14.
    *
    * DELIBERATELY no state expiry (unlike ST14's optional one): a
    * returning user whose week-set state was dropped would re-derive a
    * fresh cohort from their next event and re-assert `(cohort', 0)`,
    * double-counting them in the triangle — ST14's non-overlap proof
    * does not transfer because retention cells are keyed by the user's
    * LIFETIME first week, not by disjoint time intervals. Expiry here
    * is inherently lossy; state is bounded per-user anyway (≤52
    * week-starts/yr, the same calendar bound as batch q32's
    * collect_set), so total state grows only with lifetime distinct
    * users — the price of an exact lifetime-cohort metric. Cap it
    * operationally by restarting from a batch q32 backfill per
    * quarter if the user population is unbounded. */
  def retentionStreamListState(events: Dataset[(Long, java.sql.Timestamp)])
      : Dataset[RetentionDelta] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_._1)
      .flatMapGroupsWithState[RetentionState, RetentionDelta](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (_, batch, state) =>
          val old = state.getOption.getOrElse(RetentionState(Nil))
          val newWeeks = batch.map { e =>
            val epochDay = tsEpochDay(e._2).toLong
            // Monday-start week truncation on epoch days (1970-01-01 was
            // a Thursday → day 0 belongs to the week starting day -3)
            (epochDay - Math.floorMod(epochDay + 3, 7L)).toInt
          }.toSet -- old.weeks
          if (newWeeks.isEmpty) Iterator.empty
          else {
            val merged = (old.weeks ++ newWeeks).sorted
            state.update(RetentionState(merged))
            diffCounts(retentionCells(old.weeks), retentionCells(merged))
              .iterator.map { case ((c, o), d) => RetentionDelta(c, o, d) }
          }
      }
  }

  /** r16 list-state baseline of [[slidingDauStream]] (sorted day list
    * per user) — retained for the StreamBench A/B.
    *
    * Each user's state is their sorted active-day set;
    * when a micro-batch adds days, the operator emits the DIFFERENCE
    * between the new and old interval decompositions as ±1 boundary
    * deltas. Corrections are additive integers, so ANY arrival order —
    * including a late day landing between two already-seen days, which
    * re-splits the user's intervals — converges to exactly the batch
    * decomposition of the final day set; a downstream per-day sum +
    * cumulative sum (tiny, calendar-bounded) is the live DAU surface.
    * Retraction-as-negative-delta is the standard incremental-view
    * trick: no per-day user set ever exists anywhere.
    *
    * With `expiry = true` a user idle past `window + watermark` of
    * EVENT time drops their day-set state (watermark-clocked, same as
    * [[sessionize]]). Safe for the delta algebra: emitted deltas are
    * immutable history, and by the time the timeout fires the watermark
    * guarantees any FUTURE on-time day d satisfies d > lastDay + window,
    * so a returning user's fresh state emits intervals that cannot
    * overlap the ones already emitted — no double count. A day later
    * than the watermark allows is the standard horizon caveat (ST4's
    * batch-pass-catches-stragglers note applies). */
  def slidingDauStreamListState(events: Dataset[(Long, java.sql.Timestamp)],
                       expiry: Boolean = false,
                       watermark: String = "10 minutes"): Dataset[DauDelta] = {
    import events.sparkSession.implicits._
    val timeoutConf =
      if (expiry) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    val src = if (expiry) events.withWatermark("_2", watermark) else events
    src
      .groupByKey(_._1)
      .flatMapGroupsWithState[DauState, DauDelta](
        OutputMode.Update(), timeoutConf) {
        (_, batch, state) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val old = state.getOption.getOrElse(DauState(Nil))
            val newDays = batch.map(e => tsEpochDay(e._2)).toSet -- old.days
            if (newDays.isEmpty) Iterator.empty
            else {
              val merged = (old.days ++ newDays).sorted
              // Expiry mode also PRUNES frozen history so a continuously
              // active user's state is O(window + lateness), not
              // O(lifetime): a day with a successor that is itself at or
              // below the watermark day is frozen — its interval can
              // never re-split (any accepted event has day ≥ the
              // watermark day, so nothing lands between them) and its
              // deltas are already-emitted immutable history. Keep from
              // the LAST day ≤ watermark day (its successor can still
              // change); correctness is unaffected because pruned days
              // are absent from both sides of every future before/after
              // diff, and a duplicate of a pruned day cannot re-enter
              // (it would be older than the watermark → dropped).
              val kept =
                if (!expiry) merged
                else {
                  val cutoff = Math.floorDiv(state.getCurrentWatermarkMs(), 86400000L).toInt
                  val idx = merged.lastIndexWhere(_ <= cutoff)
                  if (idx <= 0) merged else merged.drop(idx)
                }
              state.update(DauState(kept))
              if (expiry)
                state.setTimeoutTimestamp(math.max(
                  (merged.last.toLong + 1 + DauWindowDays) * 86400000L,
                  state.getCurrentWatermarkMs() + 1))
              diffCounts(dauDeltas(old.days), dauDeltas(merged))
                .iterator.map { case (d, v) => DauDelta(d, v) }
            }
          }
      }
  }
}
