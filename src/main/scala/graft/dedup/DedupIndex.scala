package graft.dedup

import graft.sources.Bucketed
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent incremental dedup index (SURVEY §2.3 D9, round 11) — the
  * operator a production ingest pipeline actually runs at 100 TB.
  *
  * D1–D8 dedup a corpus against ITSELF: every run rescans everything,
  * which is the wrong shape once the historical corpus is three orders
  * larger than a day's ingest. This is the dedup analog of
  * [[graft.sim.IvfIndex]] (reference capability: the governed-table
  * pattern of Legend.scala applied to dedup state): pay the signature
  * pass over the history ONCE, persist it in join-ready layout, and
  * from then on dedup each incoming batch against the index without
  * touching the corpus.
  *
  * Index row = (index_id, band_key, sig): one row per document per LSH
  * band, carrying the full minhash signature ([[Dedup.bandSigRows]]).
  * The table is BUCKETED by band_key, so a probe joins the (small)
  * batch against the index with NO index-side Exchange — Spark reads
  * bucket files straight into correctly-partitioned tasks and shuffles
  * only the batch (DedupSpec pins the plan property). At 100 TB the
  * index is ~0.5% the corpus size (bands × (key + signature) per doc)
  * and the per-batch cost is the batch's own signature pass + one
  * batch-sized shuffle — independent of corpus size.
  *
  * Candidates verify by ESTIMATED Jaccard (fraction of equal signature
  * components — the unbiased MinHash estimate) AT the band join; exact
  * Jaccard would need document text the index deliberately does not
  * carry. That is the standard scale trade: the estimate's resolution
  * is 1/numHashes, and the banding threshold already concentrates
  * candidates near high similarity.
  *
  * Degenerate-bucket guard: each WRITE (build or append) drops band
  * rows whose bucket exceeds `maxBucket` within that write — the same
  * boilerplate-band cap as D2. A bucket that only crosses the cap
  * ACROSS appends is not re-dropped (the index is append-only);
  * compaction (periodic rebuild) is where that debt clears, exactly as
  * for IVF centroid drift.
  */
object DedupIndex {

  /** Handle: the catalog table plus the signature geometry appends and
    * probes must reproduce. */
  final case class Handle(table: String, numBuckets: Int, k: Int,
                          numHashes: Int, numBands: Int)

  /** Build the index over the base corpus: one signature pass, one
    * write bucketed by band_key. */
  def build(docs: DataFrame, idCol: String, textCol: String, table: String,
            numBuckets: Int, k: Int, numHashes: Int, numBands: Int,
            maxBucket: Int): Handle = {
    // build = overwrite: clear the catalog entry (a managed-table DROP
    // removes its own storage, wherever the catalog resolved it — also
    // the only correct path for qualified names, whose layout is
    // db.db/tbl, not <warehouse>/<db.tbl>) AND, for unqualified names
    // only, any ORPHANED warehouse directory a previous session's
    // in-memory catalog left behind (saveAsTable refuses to adopt one —
    // LOCATION_ALREADY_EXISTS). The orphan delete verifies the
    // directory actually looks like a table dir (only part-*/_*/.*
    // entries) before removing it, so a user directory that merely
    // shares the name fails loudly instead of vanishing.
    val spark = docs.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    if (!table.contains(".")) {
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), table)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) {
        val entries = fs.listStatus(loc).map(_.getPath.getName)
        val tableLike = entries.forall(n =>
          n.startsWith("part-") || n.startsWith("_") || n.startsWith("."))
        require(tableLike, s"refusing to overwrite $loc: directory does " +
          s"not look like a table location (entries: ${entries.take(5).mkString(", ")})")
        fs.delete(loc, true)
      }
    }
    val h = Handle(table, numBuckets, k, numHashes, numBands)
    write(h, docs, idCol, textCol, maxBucket, SaveMode.Overwrite)
    h
  }

  /** Append a new batch's signatures under the same bucket spec —
    * typically called AFTER [[probe]] has flagged (and the caller
    * dropped) the batch's duplicates, so the index stays canonical. */
  def append(index: Handle, docs: DataFrame, idCol: String, textCol: String,
             maxBucket: Int): Unit =
    write(index, docs, idCol, textCol, maxBucket, SaveMode.Append)

  /** Band rows per write task the r17 sf1000 receipt sized the
    * in-memory bucketed-write sort around (160M band rows / 128 tasks
    * ≈ 1.25M rows ≈ 160 MB of sig-carrying rows per task sort). The
    * adaptive cluster factor below reproduces that receipt's shape
    * exactly at the fifth decade (factor 8) while a gate-SF build
    * (160k band rows) collapses to factor 1 — 16 write tasks and 16
    * output files instead of 128 near-empty ones (optimization round
    * 18, guide §2/§6: scale the partitioning to the input, don't pin
    * it to either end). */
  private val TargetRowsPerWriteTask = 1250000L

  private[dedup] def clusterFactor(bandRowsEstimate: Long, numBuckets: Int): Int =
    math.max(1L, math.min(8L,
      math.ceil(bandRowsEstimate.toDouble /
        (TargetRowsPerWriteTask.toDouble * numBuckets)).toLong)).toInt

  private def write(index: Handle, docs: DataFrame, idCol: String,
                    textCol: String, maxBucket: Int, mode: SaveMode): Unit = {
    // r18 small-append short-circuit (r17 verdict #3): a band bucket's
    // size within ONE write is bounded by the batch's row count (each
    // doc emits exactly one row per band, and rows only share a
    // band_key across docs), so a batch of ≤ maxBucket docs can never
    // trip the per-write cap — skip the cap branch outright. The check
    // reads at most maxBucket+1 ids (limit + count, column-pruned), so
    // it costs microseconds at any scale; it exists for the
    // deployment shape an INCREMENTAL index actually serves — frequent
    // small appends against a large history — where the cap
    // aggregate's fixed cost would otherwise dominate the write.
    val canTripCap =
      docs.select(col(idCol)).limit(maxBucket + 1).count() > maxBucket
    // cluster-factor sizing: a sub-cap append is ≤ maxBucket docs by
    // the check above — factor 1 with no further work; a bulk write
    // pays one column-pruned count of the batch (trivial next to the
    // signature pass it precedes) and sizes the write tasks to
    // TargetRowsPerWriteTask
    val factor =
      if (!canTripCap) 1
      else clusterFactor(
        docs.select(col(idCol)).count() * index.numBands, index.numBuckets)
    val rows = Dedup.shingleRows(docs, idCol, textCol, index.k)
    val bandRows = Dedup.bandSigRows(rows, idCol, index.numHashes, index.numBands)
      .select(col(idCol).as("index_id"), col("band_key"), col("sig"))
    Bucketed.writeBucketed(
      capAndCluster(bandRows, maxBucket, index.numBuckets, canTripCap, factor),
      index.table, "band_key", index.numBuckets, mode = mode)
  }

  /** Per-write degenerate-bucket cap + write-ready clustering.
    *
    * The r16 form was `count().over(Window.partitionBy(band_key))` — a
    * full shuffle AND per-partition sort of the complete sig-carrying
    * band relation (160M rows / ~20 GB shuffled at sf1000, ×19.3
    * superlinear: the sort spills) before the bucketed write added its
    * own second sort. The cap only needs the COUNT per band_key, and
    * over-cap keys are by construction few (boilerplate bands): so
    *   1. cluster the band relation on band_key ONCE — this is the only
    *      big-relation exchange, and BOTH branches below hang off the
    *      same node, so Spark's exchange reuse serves the second branch
    *      from the first's shuffle files (the signature pass runs once;
    *      the shuffle store is the materialization — a cache of the
    *      20 GB relation starves execution memory and OOMs, measured
    *      at sf1000);
    *   2. count per band_key on the clustered relation — no further
    *      exchange (grouping key == partitioning key) — and broadcast
    *      anti-join the tiny over-cap key set;
    *   3. cluster into `factor`× the bucket count (factor sized to the
    *      batch, 1–8 — see [[clusterFactor]]): Spark's bucket id is
    *      murmur3(band_key) % numBuckets and fN co-divides N, so every
    *      write task holds exactly one bucket's rows (or all of one
    *      bucket at factor 1) and the bucketed write's own sortBy — the
    *      only sort left in the plan — sorts ~1/(fN) of the relation
    *      per task, in memory instead of spilling.
    * Net: one exchange, one in-memory-sized sort, vs the window plan's
    * exchange + spilling window sort + write sort. */
  private[dedup] def capAndCluster(bandRows: DataFrame, maxBucket: Int,
                                   numBuckets: Int,
                                   canTripCap: Boolean = true,
                                   factor: Int = 8): DataFrame = {
    val clustered = bandRows.repartition(factor * numBuckets, col("band_key"))
    if (!canTripCap) clustered
    else {
      val overCap = clustered
        .groupBy(col("band_key"))
        .agg(count(lit(1)).as("graft_bn"))
        .filter(col("graft_bn") > maxBucket)
        .select(col("band_key"))
      clustered.join(broadcast(overCap), Seq("band_key"), "left_anti")
    }
  }

  /** Per-band-bucket cardinalities — the index health metric (the dedup
    * analog of [[graft.sim.IvfIndex.listSizes]]). Over-cap buckets are
    * boilerplate bands that only crossed `maxBucket` ACROSS appends (a
    * single write caps its own); they inflate probe candidate counts
    * until [[compact]] clears them. */
  def bucketSizes(index: Handle): DataFrame =
    SparkSession.active.table(index.table)
      .groupBy(col("band_key")).agg(count(lit(1)).as("n_rows"))

  /** Compaction trigger: any band bucket over the cap, or any duplicate
    * (index_id, band_key) row (the documented at-least-once residue of
    * a streaming replay crash window — ST10/ST16). Both are metadata
    * aggregates over the index, never the corpus. */
  def needsCompaction(index: Handle, maxBucket: Int): Boolean = {
    val spark = SparkSession.active
    val over = spark.table(index.table)
      .groupBy(col("band_key"))
      .agg(count(lit(1)).as("n"), countDistinct(col("index_id")).as("nd"))
      .filter(col("n") > maxBucket || col("n") > col("nd"))
    !over.isEmpty
  }

  /** Rebuild the index under the SAME bucket spec from its own rows —
    * clearing the two forms of append-only debt: duplicate signature
    * rows from streaming replays, and band buckets that crossed
    * `maxBucket` only across appends (each write caps its own bucket,
    * so cross-append growth is invisible until here). Cost is one scan
    * + one bucketed write of the INDEX (~0.5% of corpus size at 100 TB)
    * — never the corpus, and no re-shingling: signatures are reused
    * as stored. The rewrite goes through a staging table + catalog
    * rename, so a concurrent reader never sees a half-written index. */
  def compact(index: Handle, maxBucket: Int): Unit = {
    val spark = SparkSession.active
    // One exchange total (same rationale as capAndCluster — the r16
    // window-count form here full-sorted the index a second time):
    // cluster on band_key FIRST, both branches off the same node so
    // exchange reuse serves the cap branch from the write branch's
    // shuffle files (no cache — see capAndCluster). Hash-partitioning
    // on band_key is a subset of the (index_id, band_key) dedup keys,
    // so dropDuplicates reuses it with no second shuffle. The cap
    // branch counts DISTINCT index_id per band_key — definitionally the
    // post-dedup bucket size — straight off the clustered relation, so
    // neither branch pays the other's aggregate. The bucketed write's
    // murmur3 % numBuckets co-divides the shuffle's murmur3 % 8N
    // partitions, so its sortBy is the only sort and stays in memory.
    //
    // replay residue: the same doc's band row appended twice carries an
    // identical signature (ids are stable per the pipeline's contract)
    // cluster factor sized to the index's actual row count (parquet
    // metadata count — no data scan), same policy as the write path
    val factor = clusterFactor(
      spark.table(index.table).count(), index.numBuckets)
    val clustered = spark.table(index.table)
      .repartition(factor * index.numBuckets, col("band_key"))
    val overCap = clustered
      .groupBy(col("band_key"))
      .agg(countDistinct(col("index_id")).as("graft_bn"))
      .filter(col("graft_bn") > maxBucket)
      .select(col("band_key"))
    val capped = clustered
      .dropDuplicates("index_id", "band_key")
      .join(broadcast(overCap), Seq("band_key"), "left_anti")
    val staging = index.table + "_compact_staging"
    spark.sql(s"DROP TABLE IF EXISTS $staging")
    Bucketed.writeBucketed(capped, staging, "band_key", index.numBuckets)
    spark.sql(s"DROP TABLE ${index.table}")
    spark.sql(s"ALTER TABLE $staging RENAME TO ${index.table}")
  }

  /** Dedup an incoming batch against the index: (batch_id, index_id,
    * est_jaccard) for every batch document whose estimated Jaccard
    * against an indexed document reaches `threshold`. The index side is
    * a bucket-co-located scan (no Exchange); only the batch shuffles.
    * A pair sharing several bands yields one row (the estimate is a
    * pure function of the two signatures, identical from any band). */
  def probe(index: Handle, batch: DataFrame, idCol: String, textCol: String,
            threshold: Double): DataFrame = {
    val spark = batch.sparkSession
    val rows = Dedup.shingleRows(batch, idCol, textCol, index.k)
    val b = Dedup.bandSigRows(rows, idCol, index.numHashes, index.numBands)
      .select(col(idCol).as("batch_id"), col("band_key"), col("sig").as("b_sig"))
    spark.table(index.table).join(b, "band_key")
      .select(col("batch_id"), col("index_id"),
        Dedup.estimatedJaccard(col("sig"), col("b_sig"), index.numHashes)
          .as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
      .groupBy(col("batch_id"), col("index_id"))
      .agg(max(col("est_jaccard")).as("est_jaccard"))
  }
}
