package graft.dedup

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Planted-duplicate semantics for the dedup pack (SURVEY §2.3 D1–D5).
  * All hashing is deterministic (md5-seeded), so these are exact
  * assertions, not statistical ones. */
class DedupSpec extends SparkTestBase {

  import spark.implicits._

  // 60-word deterministic base text; variants with tiny edits.
  private val baseWords = (0 until 60).map(i => s"w${i % 17}tok$i")
  private val base = baseWords.mkString(" ")
  private val nearDup = baseWords.updated(30, "CHANGED").mkString(" ")   // 1-word edit
  private val farDoc = (0 until 60).map(i => s"z${i}other").mkString(" ")
  private val docs = Seq(
    (1L, base), (2L, nearDup), (3L, base),  // 3 = exact copy of 1
    (4L, farDoc),
    (5L, "tiny"),                            // too short to shingle
    (6L, (100 until 160).map(i => s"q${i}x").mkString(" ")))
    .toDF("doc_id", "text")

  private lazy val shingled = Dedup.shingleSets(docs, "doc_id", "text", 3)
  private lazy val shingleRows = Dedup.shingleRows(docs, "doc_id", "text", 3)
  private lazy val candidates = Dedup.candidatePairs(
    Dedup.bands(shingleRows, "doc_id", numHashes = 16, numBands = 4), "doc_id", maxBucket = 100)
    .as[(Long, Long)].collect().toSet

  test("D1: exact dedup groups identical texts, keeps first") {
    val d1 = docs.groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n"))
    val byKeep = d1.as[(String, Long, Long)].collect().map(r => r._2 -> r._3).toMap
    assert(byKeep(1L) == 2)   // docs 1 and 3 collapse, doc 1 kept
    assert(byKeep(2L) == 1)
    assert(d1.count() == 5)
  }

  test("D2: LSH candidates find exact and near duplicates, not unrelated docs") {
    assert(candidates.contains((1L, 3L)))  // identical: all bands collide
    assert(candidates.contains((1L, 2L)))  // near-dup: J ~ 0.9
    assert(candidates.contains((2L, 3L)))
    assert(!candidates.exists { case (a, b) => a == 4L || b == 4L })  // unrelated
    assert(!candidates.exists { case (a, b) => a == 5L || b == 5L })  // unshingleable
  }

  test("D2: bucket-size cap drops degenerate buckets") {
    // with maxBucket=1 no bucket qualifies -> no candidates
    val capped = Dedup.candidatePairs(
      Dedup.bands(shingleRows, "doc_id", 16, 4), "doc_id", maxBucket = 1)
    assert(capped.count() == 0)
  }

  test("D4: Jaccard verify is exact on candidates") {
    val sa = shingled.select(col("doc_id").as("a"), col("shingles").as("sa"))
    val sb = shingled.select(col("doc_id").as("b"), col("shingles").as("sb"))
    val jac = candidates.toSeq.toDF("a", "b")
      .join(sa, "a").join(sb, "b")
      .select(col("a"), col("b"), Dedup.jaccard(col("sa"), col("sb")).as("j"))
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(jac((1L, 3L)) == 1.0)
    // one word edit in 60 words changes 3 of 58 shingles: J = 55/61
    assert(math.abs(jac((1L, 2L)) - 55.0 / 61.0) < 1e-12)
  }

  test("D3: simhash is identical for copies, close for near-dups, far for others") {
    val sig = Dedup.simhash(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(sig(1L) == sig(3L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sig(1L), sig(2L)) <= 10)
    assert(hamming(sig(1L), sig(4L)) > 10)
    val pairs = Dedup.simhashPairs(Dedup.simhash(docs, "doc_id", "text"), "doc_id",
      bits = 60, numBands = 4, maxHamming = 10, maxBucket = 100)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 3L)))
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("D5: embedding near-dup via LSH buckets finds planted pair only") {
    val dim = 64
    def unit(f: Int => Double): Array[Double] = {
      val v = Array.tabulate(dim)(f)
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val a = unit(i => math.sin(i + 1.0))
    val b = unit(i => math.sin(i + 1.0) + 0.01 * math.cos(3.0 * i)) // ~a
    val c = unit(i => math.cos(2.0 * i + 0.5))                      // unrelated
    val vecs = Seq((1L, a.toSeq), (2L, b.toSeq), (3L, c.toSeq)).toDF("vec_id", "embedding")
    val pairs = graft.sim.Similarity.embeddingDupPairs(
      vecs, "vec_id", "embedding", numPlanes = 8, threshold = 0.95, dim = dim)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("D6: connected components merge transitive near-dup chains") {
    // chain 1-2, 2-3 plus isolated pair 7-9: two components
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("a", "b")
    val groups = Dedup.duplicateGroups(pairs)
      .as[(Long, Long, String)].collect()
      .map(g => g._1 -> (g._2, g._3)).toMap
    assert(groups.keySet == Set(1L, 7L))
    assert(groups(1L) == (3L, "1,2,3"))
    assert(groups(7L) == (2L, "7,9"))
  }

  test("D6: reliable-checkpoint mode (cluster-safe) produces identical groups") {
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("a", "b")
    spark.conf.set(Dedup.ReliableCheckpointKey, "true")
    try {
      // without a checkpoint dir the mode must refuse loudly, not fall
      // back to executor-local blocks silently
      if (spark.sparkContext.getCheckpointDir.isEmpty) {
        val ex = intercept[IllegalArgumentException] {
          Dedup.duplicateGroups(pairs).count()
        }
        assert(ex.getMessage.contains("setCheckpointDir"))
      }
      val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
      spark.sparkContext.setCheckpointDir(dir)
      val groups = Dedup.duplicateGroups(pairs)
        .as[(Long, Long, String)].collect()
        .map(g => g._1 -> (g._2, g._3)).toMap
      assert(groups == Map(1L -> ((3L, "1,2,3")), 7L -> ((2L, "7,9"))))
      // rounds really checkpointed to the reliable store
      assert(new java.io.File(dir).listFiles.nonEmpty)
    } finally spark.conf.unset(Dedup.ReliableCheckpointKey)
  }

  test("D7: cross-doc boilerplate chunks stripped; doc-level exact dedup misses them") {
    val header = (1 to 8).map(i => s"header$i").mkString(" ") // exactly one chunk wide
    val docs = Seq(
      (1L, s"$header alpha beta gamma delta"),
      (2L, s"$header epsilon zeta eta theta"),
      (3L, s"$header iota kappa lambda mu"),
      (4L, "nu xi omicron pi"),
      (5L, header)).toDF("doc_id", "text")
    // All five texts are distinct: D1 (doc-level exact dedup) sees nothing
    assert(docs.groupBy(md5(col("text"))).count().filter(col("count") > 1).isEmpty)
    val out = Dedup.passageDedup(docs, "doc_id", "text", w = 8, minFreq = 3L)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect()
    // docs 1-3: header chunk flagged (corpus freq 4 >= 3), body kept
    assert(out(0) == ((1L, 2L, 1L, "alpha beta gamma delta")))
    assert(out(1) == ((2L, 2L, 1L, "epsilon zeta eta theta")))
    assert(out(2) == ((3L, 2L, 1L, "iota kappa lambda mu")))
    // unique doc untouched; all-boilerplate doc empties to "" not NULL
    assert(out(3) == ((4L, 1L, 0L, "nu xi omicron pi")))
    assert(out(4) == ((5L, 1L, 1L, "")))
  }

  test("D7: partial tail chunk is counted, ordered after full chunks") {
    // 10 tokens, w=4: chunks "t1..t4", "t5..t8", "t9 t10" (partial tail)
    val doc = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val chunks = Dedup.chunkRows(doc, "doc_id", "text", 4)
      .orderBy("pos").select("chunk").as[String].collect()
    assert(chunks.toSeq == Seq("t1 t2 t3 t4", "t5 t6 t7 t8", "t9 t10"))
  }

  test("D6: one Spark job per propagation round (convergence rides the checkpoint)") {
    // 1-2, 2-3: star contraction resolves this path in ONE round.
    // Actions = 3 setup (node checkpoint, edge checkpoint, initial
    // star-forest test) + 2 per round (contraction checkpoint + exact
    // star-forest test) + 1 final label checkpoint — the driver must
    // not add per-round work beyond that fixed shape (AQE splits one
    // action into many *jobs*, so the assert counts actions, not jobs).
    // (Optimization round 19 tried halving this to one action per round
    // via an observe() metric riding each checkpoint; it measured
    // 1.3–2x SLOWER — the fold costs one extra full contraction round —
    // and was reverted. ABBA receipts: bench_sweeps_r19/obsfold_abba_*.)
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val actions = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        actions.incrementAndGet()
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val out = Dedup.duplicateGroups(pairs) // lazy tail: groupBy runs at count() below
      // listener events are async: wait until the count stops moving
      var n = -1
      var stable = 0
      while (stable < 3) {
        Thread.sleep(200)
        val cur = actions.get()
        if (cur == n) stable += 1 else { n = cur; stable = 0 }
      }
      assert(n <= 3 + 2 * 1 + 1, s"expected ≤6 actions (3 setup + 2×1 round + labels), saw $n")
      assert(out.count() == 1L)
    } finally spark.listenerManager.unregister(listener)
  }

  test("D5: corpus-sized plane count holds bucket occupancy constant") {
    import graft.sim.Similarity.autoPlanes
    // the floor keeps every historical gate SF on 4 planes (bit-identical
    // results): sf0.01 = 200 vectors, sf0.1 = 2000
    assert(autoPlanes(200) == 4 && autoPlanes(2000) == 4)
    // sf1 = 20k → 8 planes: occupancy 20000/256 ≈ 78 ≤ 150 (7 planes
    // would sit at 156 > target); sf 20x = 40k → 9
    assert(autoPlanes(20000) == 8 && autoPlanes(40000) == 9)
    // cap: beyond target·2^max the count stops growing (callers size
    // planes explicitly past local scale)
    assert(autoPlanes(Long.MaxValue) == 12)
    // hyperplanes are per-(plane, dim) seeded, so a bigger corpus only
    // APPENDS planes — the first 4 stay identical (prefix stability is
    // what makes the floor's bit-identical-results claim true)
    val p4 = graft.sim.Similarity.hyperplanes(4, 64)
    val p12 = graft.sim.Similarity.hyperplanes(12, 64)
    assert(p12.take(4).map(_.toSeq).toSeq == p4.map(_.toSeq).toSeq)
  }

  test("D6: giant-component worst case — path diameter converges in O(log n) rounds") {
    // The scale receipt: a single giant component in its
    // diameter-MAXIMAL shape (a path — the drifting-near-dup chain LSH
    // really produces under template/version drift), 4096 nodes. Plain
    // neighbor-min label propagation needs diameter≈4095 rounds here;
    // large-star/small-star contraction lands in ~log2(4096)=12 rounds
    // (+slack) — and state per round is BOUNDED by the current edge
    // set, which only shrinks as components contract.
    val n = 4096
    val path = spark.range(n - 1).select(col("id").as("a"), (col("id") + 1).as("b"))
    val persistedBefore = spark.sparkContext.getPersistentRDDs.size
    val (labels, rounds) = Dedup.labelPropagationCounted(path, maxIterations = 20)
    val byLabel = labels.groupBy("label").count().as[(Long, Long)].collect().toMap
    assert(byLabel == Map(0L -> n.toLong), "one component, min-id keeper")
    assert(rounds <= 16, s"star contraction should converge in ~log2($n)+slack rounds, took $rounds")
    assert(rounds >= 5, s"a $n-path cannot converge in $rounds rounds — receipt is broken")
    // freed-blocks receipt: each round unpersists the previous round's
    // edges, so the session does not accumulate per-round state
    assert(spark.sparkContext.getPersistentRDDs.size <= persistedBefore + 4,
      "per-round edge blocks must be freed, not accumulated")

    // THE r14 regression case: the same path with ids SHUFFLED along it
    // (deterministic odd-multiplier bijection mod 2^12). The round-11
    // pointer-jump variant was O(diameter) here — scattered local
    // minima form basins the min must cross one hop per round (it did
    // not converge in 300 rounds on this graph; the real sf100
    // candidate graph hit the same wall: a 910-node component with
    // eccentricity 26 took 27 rounds and blew the cap of 20). Star
    // contraction moves the EDGES, so id placement is irrelevant.
    val shuffled = spark.range(n - 1).select(
      ((col("id") * 1597) % n).as("a"), (((col("id") + 1) * 1597) % n).as("b"))
    val (shufLabels, shufRounds) = Dedup.labelPropagationCounted(shuffled, maxIterations = 20)
    val shufByLabel = shufLabels.groupBy("label").count().as[(Long, Long)].collect().toMap
    assert(shufByLabel == Map(0L -> n.toLong), "one component, min-id keeper (shuffled ids)")
    assert(shufRounds <= 16,
      s"id placement must not affect convergence, took $shufRounds rounds")

    // the common LSH shape at the same scale — one giant BUCKET component
    // (star pairs around the bucket min) — is ALREADY a star forest:
    // the exact fixpoint test accepts it without a single round
    val star = spark.range(1, n).select(lit(0L).as("a"), col("id").as("b"))
    val (starLabels, starRounds) = Dedup.labelPropagationCounted(star, maxIterations = 20)
    assert(starLabels.filter(col("label") =!= 0L).isEmpty)
    assert(starRounds == 0, s"star input took $starRounds rounds — fixpoint test broken")

    // silent-cap-out is gone: an impossible budget now throws loudly
    val ex = intercept[IllegalArgumentException] {
      Dedup.labelPropagationCounted(path, maxIterations = 3)
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("D10: dedupChain outputs equal the standalone d2/d6/d8 results exactly") {
    val chain = Dedup.dedupChain(docs, "doc_id", "text",
      k = 3, numHashes = 16, numBands = 4, maxBucket = 100)

    val standalonePairs = Dedup.candidatePairs(
      Dedup.bands(shingleRows, "doc_id", numHashes = 16, numBands = 4),
      "doc_id", maxBucket = 100)
    assert(chain.pairs.as[(Long, Long)].collect().toSet ==
      standalonePairs.as[(Long, Long)].collect().toSet)

    val standaloneGroups = Dedup.duplicateGroups(standalonePairs)
    assert(chain.groups.as[(Long, Long, String)].collect().toSet ==
      standaloneGroups.as[(Long, Long, String)].collect().toSet)

    val standaloneDeduped = Dedup.applyDedup(docs, "doc_id", standalonePairs)
    assert(chain.deduped.select("doc_id").as[Long].collect().toSet ==
      standaloneDeduped.select("doc_id").as[Long].collect().toSet)
  }

  test("D10: the chain honors reliable-checkpoint mode (pairs included) — r17 verdict") {
    // The r17 weak flag: dedupChain localCheckpointed its corpus-sized
    // pairs relation UNCONDITIONALLY, so reliable mode protected the
    // fixpoint rounds but left the chain's largest pinned state in
    // executor block managers. The chain must now (a) refuse loudly
    // when the mode is on without a checkpoint dir — the refusal firing
    // AT CONSTRUCTION proves the pairs checkpoint itself goes through
    // the mode, since no fixpoint round has run yet — and (b) produce
    // identical outputs with every checkpoint written to the reliable
    // store.
    spark.conf.set(Dedup.ReliableCheckpointKey, "true")
    try {
      // reset any dir a sibling test left behind (setCheckpointDir(null)
      // clears it) so the refusal branch ALWAYS executes — without the
      // reset, suite ordering makes this branch dead and the test would
      // pass with the pairs checkpoint reverted to plain localCheckpoint
      spark.sparkContext.setCheckpointDir(null)
      val ex = intercept[IllegalArgumentException] {
        Dedup.dedupChain(docs, "doc_id", "text",
          k = 3, numHashes = 16, numBands = 4, maxBucket = 100)
      }
      assert(ex.getMessage.contains("setCheckpointDir"))
      val dir = java.nio.file.Files.createTempDirectory("graft_chain_ckpt").toString
      spark.sparkContext.setCheckpointDir(dir)
      val persistedBefore = spark.sparkContext.getPersistentRDDs.keySet
      val chain = Dedup.dedupChain(docs, "doc_id", "text",
        k = 3, numHashes = 16, numBands = 4, maxBucket = 100)
      val standalonePairs = Dedup.candidatePairs(
        Dedup.bands(shingleRows, "doc_id", numHashes = 16, numBands = 4),
        "doc_id", maxBucket = 100)
      assert(chain.pairs.as[(Long, Long)].collect().toSet ==
        standalonePairs.as[(Long, Long)].collect().toSet)
      assert(chain.deduped.select("doc_id").as[Long].collect().toSet ==
        Dedup.applyDedup(docs, "doc_id", standalonePairs)
          .select("doc_id").as[Long].collect().toSet)
      // reliable mode pins ZERO executor blocks: the whole chain (pairs
      // included) registered no new persistent RDDs in the block manager…
      assert((spark.sparkContext.getPersistentRDDs.keySet -- persistedBefore).isEmpty,
        "reliable-mode chain must not pin block-manager state")
      // …and real checkpoint FILES landed in the reliable store (the dir
      // itself is eagerly created by setCheckpointDir — only files prove
      // a write happened)
      def files(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles.map(files).sum
        else if (f.isFile && f.length > 0) 1L else 0L
      assert(files(new java.io.File(dir)) > 0,
        "reliable-mode chain must write checkpoint files")
    } finally spark.conf.unset(Dedup.ReliableCheckpointKey)
  }

  test("D9: persisted dedup index — probe finds cross-split dups, append extends, no index-side Exchange") {
    spark.sql("DROP TABLE IF EXISTS d9_spec_index")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), "d9_spec_index"))
    val base = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight"),
      (4L, "totally different words entirely unrelated content here now"))
      .toDF("doc_id", "text")
    val idx = DedupIndex.build(base, "doc_id", "text", "d9_spec_index",
      numBuckets = 8, k = 3, numHashes = 16, numBands = 4, maxBucket = 100)

    // exact dup of doc 1 is flagged at estimate 1.0; novel text is not
    val batch = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta"),
      (11L, "unique fresh material nothing shared with anything else at all"))
      .toDF("doc_id", "text")
    val hits = DedupIndex.probe(idx, batch, "doc_id", "text", threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(hits == Set((10L, 1L, 1.0)), hits)

    // append-then-probe: the index grows without a corpus rescan and a
    // later batch deduplicates against the appended document
    DedupIndex.append(idx,
      Seq((20L, "brand new appended document text for the growing index"))
        .toDF("doc_id", "text"), "doc_id", "text", maxBucket = 100)
    val later = DedupIndex.probe(idx,
      Seq((30L, "brand new appended document text for the growing index"))
        .toDF("doc_id", "text"), "doc_id", "text", threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(later == Set((30L, 20L, 1.0)), later)

    // plan contract: the index side is a bucketed scan with NO Exchange —
    // only the batch shuffles, so per-batch cost is independent of
    // corpus size (the in-memory batch has no file scan, making the
    // index table's scan subtree unambiguous)
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val old = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val plan = DedupIndex.probe(idx, batch, "doc_id", "text", threshold = 0.5)
        .queryExecution.executedPlan
      val join = plan.collectFirst {
        case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j }
      assert(join.nonEmpty, s"no join in probe plan:\n$plan")
      val indexSide = join.get.children.find(
        _.exists(_.isInstanceOf[FileSourceScanExec]))
      assert(indexSide.nonEmpty, s"no file-scan side under the probe join:\n$plan")
      assert(indexSide.get.collect { case e: ShuffleExchangeExec => e }.isEmpty,
        s"index side must not shuffle:\n${indexSide.get}")
      val scan = indexSide.get.collectFirst { case s: FileSourceScanExec => s }.get
      assert(scan.relation.bucketSpec.nonEmpty, "index scan lost its bucket spec")
    } finally spark.conf.set("spark.sql.adaptive.enabled", old)
    spark.sql("DROP TABLE IF EXISTS d9_spec_index")
  }

  test("D9: build cap plan — no window over the sig relation; broadcast anti-join; one clustering exchange; no extra sort") {
    // r16's ×19.3 sf1000 superlinearity: the per-write degenerate-bucket
    // cap ran as count().over(Window.partitionBy(band_key)) — a full
    // shuffle AND sort of the sig-carrying band relation, before the
    // bucketed write sorted it again. The replacement (capAndCluster)
    // must keep the big relation to ONE exchange and ZERO sorts (the
    // bucketed write adds its own sortBy downstream of this plan).
    val ds = Seq(
      (1L, base), (2L, base), (3L, base), (4L, base), (5L, base), // 5 identical → every band bucket = 5
      (6L, farDoc))
      .toDF("doc_id", "text")
    val rows = Dedup.shingleRows(ds, "doc_id", "text", 3)
    val bandRows = Dedup.bandSigRows(rows, "doc_id", numHashes = 16, numBands = 4)
      .select(col("doc_id").as("index_id"), col("band_key"), col("sig"))

    val old = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val capped = DedupIndex.capAndCluster(bandRows, maxBucket = 4, numBuckets = 8)
      val plan = capped.queryExecution.executedPlan
      assert(plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w }.isEmpty,
        s"cap must not window-sort the sig relation:\n$plan")
      val anti = plan.collect {
        case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
          if j.joinType == org.apache.spark.sql.catalyst.plans.LeftAnti => j }
      assert(anti.nonEmpty, s"cap must be a broadcast anti-join:\n$plan")
      // one exchange carries the sig arrays: the pre-write clustering on
      // band_key. (The count aggregate's exchange carries only
      // (band_key, count) — column-pruned, never the sigs.)
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      val sigExchanges = plan.collect {
        case e: ShuffleExchangeExec if e.output.exists(_.name == "sig") => e }
      assert(sigExchanges.size == 1,
        s"expected exactly one sig-carrying exchange, got ${sigExchanges.size}:\n$plan")
      assert(plan.collect {
        case s: org.apache.spark.sql.execution.SortExec => s }.isEmpty,
        s"the only sort must be the bucketed write's own:\n$plan")

      // semantics unchanged from the window form: over-cap buckets are
      // dropped WHOLE, under-cap buckets kept whole
      val out = capped.select("index_id").as[Long].collect()
      assert(out.nonEmpty && out.forall(_ == 6L),
        s"expected only doc 6's band rows to survive maxBucket=4, got ${out.toSeq}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", old)
  }

  test("D9: compaction clears cross-append over-cap buckets and replay duplicates; probe unchanged otherwise") {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    for (t <- Seq("d9_compact_index", "d9_compact_index_compact_staging")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      rm(new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t))
    }
    val boiler = "standard legal disclaimer repeated verbatim across documents"
    val maxBucket = 4
    // build: 3 boilerplate copies (under the per-write cap) + a control
    val base = Seq(
      (1L, boiler), (2L, boiler), (3L, boiler),
      (4L, "control document with its own unique phrasing and content"))
      .toDF("doc_id", "text")
    val idx = DedupIndex.build(base, "doc_id", "text", "d9_compact_index",
      numBuckets = 8, k = 3, numHashes = 16, numBands = 4, maxBucket = maxBucket)
    assert(!DedupIndex.needsCompaction(idx, maxBucket))
    // two appends, each under the per-write cap, cumulatively over it:
    // the append-only debt compaction exists to clear
    DedupIndex.append(idx, Seq((5L, boiler), (6L, boiler)).toDF("doc_id", "text"),
      "doc_id", "text", maxBucket)
    DedupIndex.append(idx, Seq((7L, boiler), (8L, boiler)).toDF("doc_id", "text"),
      "doc_id", "text", maxBucket)
    assert(DedupIndex.needsCompaction(idx, maxBucket),
      "7 copies across 3 writes must trip the over-cap trigger")
    val overBefore = DedupIndex.bucketSizes(idx)
      .filter(col("n_rows") > maxBucket).count()
    assert(overBefore > 0)
    // control probe BEFORE (unaffected by the degenerate band)
    val controlBatch = Seq(
      (40L, "control document with its own unique phrasing and content"))
      .toDF("doc_id", "text")
    val controlBefore = DedupIndex.probe(idx, controlBatch, "doc_id", "text", 0.5)
      .as[(Long, Long, Double)].collect().toSet

    DedupIndex.compact(idx, maxBucket)
    assert(!DedupIndex.needsCompaction(idx, maxBucket))
    assert(DedupIndex.bucketSizes(idx).filter(col("n_rows") > maxBucket).count() == 0,
      "compaction must drop every over-cap bucket")
    // probes: the control is IDENTICAL; the boilerplate band is gone, so
    // a boilerplate probe finds no candidates — the same semantics the
    // per-write cap gives D2 (degenerate bands carry no dedup signal)
    val controlAfter = DedupIndex.probe(idx, controlBatch, "doc_id", "text", 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(controlAfter == controlBefore)
    assert(controlAfter == Set((40L, 4L, 1.0)), controlAfter)
    val boilerProbe = DedupIndex.probe(idx,
      Seq((50L, boiler)).toDF("doc_id", "text"), "doc_id", "text", 0.5)
    assert(boilerProbe.isEmpty, "capped band must yield no candidates")

    // replay residue: the SAME doc's signatures appended twice
    // (ST16's crash window) — trigger fires, compaction dedups, probe
    // results are unchanged (probe already aggregates per pair)
    DedupIndex.append(idx, Seq((60L, "replayed document body landing twice"))
      .toDF("doc_id", "text"), "doc_id", "text", maxBucket)
    val dupProbeBefore = DedupIndex.probe(idx,
      Seq((70L, "replayed document body landing twice")).toDF("doc_id", "text"),
      "doc_id", "text", 0.5).as[(Long, Long, Double)].collect().toSet
    DedupIndex.append(idx, Seq((60L, "replayed document body landing twice"))
      .toDF("doc_id", "text"), "doc_id", "text", maxBucket)
    assert(DedupIndex.needsCompaction(idx, maxBucket),
      "duplicate (index_id, band_key) rows must trip the trigger")
    val rowsBefore = spark.table(idx.table).count()
    DedupIndex.compact(idx, maxBucket)
    assert(spark.table(idx.table).count() < rowsBefore)
    assert(!DedupIndex.needsCompaction(idx, maxBucket))
    val dupProbeAfter = DedupIndex.probe(idx,
      Seq((70L, "replayed document body landing twice")).toDF("doc_id", "text"),
      "doc_id", "text", 0.5).as[(Long, Long, Double)].collect().toSet
    assert(dupProbeAfter == dupProbeBefore && dupProbeAfter == Set((70L, 60L, 1.0)))
    // the compacted table kept its bucket spec (the probe plan contract
    // of the test above depends on it)
    assert(spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier("d9_compact_index"))
      .bucketSpec.nonEmpty, "compacted index lost its bucket spec")
    spark.sql("DROP TABLE IF EXISTS d9_compact_index")
  }

  test("D9: adaptive write-cluster factor — 1 at gate scale, the receipted 8 at the sf1000 shape, clamped, co-dividing") {
    // optimization round 18: the write clustering used to pin factor 8
    // (sized for sf1000's in-memory sort); it now derives from the
    // batch. The boundaries that matter: gate-SF builds collapse to
    // factor 1, the sf1000 receipt's 160M band rows reproduce factor 8
    // EXACTLY (the committed receipt's plan shape), the clamp holds
    // above, and mid-scale lands between.
    assert(DedupIndex.clusterFactor(160L * 1000, 16) == 1, "gate SF → 1")
    assert(DedupIndex.clusterFactor(160L * 1000 * 1000, 16) == 8,
      "the sf1000 receipt's shape must reproduce exactly")
    assert(DedupIndex.clusterFactor(10L * 1000 * 1000 * 1000, 16) == 8,
      "clamped at 8 — the write never exceeds the receipted geometry")
    assert(DedupIndex.clusterFactor(25L * 1000 * 1000, 16) == 2, "mid-scale")
    assert(DedupIndex.clusterFactor(0L, 16) == 1, "empty batch → 1")
  }

  test("D9: small-append short-circuit — ≤maxBucket batches skip the cap branch; the boundary still caps") {
    // r17 verdict #3: the anti-join cap's clustering aggregate is a
    // fixed per-write cost the old window form didn't pay on tiny
    // batches — but a batch of ≤ maxBucket docs CANNOT produce an
    // over-cap bucket within its own write (one row per doc per band),
    // so the cap branch is skipped outright for exactly those batches.
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    for (t <- Seq("d9_small_index")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      rm(new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t))
    }
    val same = "identical boilerplate text shared by every doc in the batch"
    val maxBucket = 3
    // boundary ABOVE: maxBucket+1 identical docs in ONE write must still
    // cap (every band bucket = 4 > 3 → dropped whole) — proves the
    // short-circuit's limit+count decision doesn't skip a cappable batch
    val idx = DedupIndex.build(
      (1L to 4L).map(i => (i, same)).toDF("doc_id", "text"),
      "doc_id", "text", "d9_small_index",
      numBuckets = 8, k = 3, numHashes = 16, numBands = 4, maxBucket = maxBucket)
    assert(spark.table(idx.table).isEmpty,
      "a maxBucket+1 batch must still drop its over-cap buckets")
    // boundary AT: exactly maxBucket identical docs — cap can't trip,
    // branch skipped, all rows written (identical to the capped result)
    DedupIndex.append(idx, (11L to 13L).map(i => (i, same)).toDF("doc_id", "text"),
      "doc_id", "text", maxBucket)
    assert(spark.table(idx.table).count() == 3 * 4,
      "a ≤maxBucket batch must write every band row")
    // the skipped branch is REALLY skipped — compared against the CAPPED
    // plan on the same input, with AQE off (under AQE the executed plan
    // root is an adaptive leaf and any collect over it is vacuously
    // empty, so a bare "no joins" assert would pass for BOTH branches)
    val bandRows = Dedup.bandSigRows(
      Dedup.shingleRows((1L to 4L).map(i => (i, same)).toDF("doc_id", "text"),
        "doc_id", "text", 3), "doc_id", numHashes = 16, numBands = 4)
      .select(col("doc_id").as("index_id"), col("band_key"), col("sig"))
    val oldAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      def joins(df: org.apache.spark.sql.DataFrame) =
        df.queryExecution.executedPlan.collect {
          case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j }
      def aggs(df: org.apache.spark.sql.DataFrame) =
        df.queryExecution.executedPlan.collect {
          case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a }
      val skipped = DedupIndex.capAndCluster(bandRows, maxBucket, numBuckets = 8,
        canTripCap = false)
      val capped = DedupIndex.capAndCluster(bandRows, maxBucket, numBuckets = 8)
      // the minhash signature aggregate upstream of BOTH plans contributes
      // its own aggregate nodes — the cap branch's marginal shape is the
      // anti-join and the per-band count, so compare, don't assert zero
      assert(joins(skipped).isEmpty,
        s"short-circuited cap must have no join:\n${skipped.queryExecution.executedPlan}")
      assert(joins(capped).nonEmpty, "control: the capped plan carries the anti-join")
      assert(aggs(skipped).size < aggs(capped).size,
        s"short-circuit must drop the cap's count aggregate " +
          s"(${aggs(skipped).size} vs ${aggs(capped).size})")
      assert(skipped.count() == 4 * 4)
    } finally spark.conf.set("spark.sql.adaptive.enabled", oldAqe)
    spark.sql("DROP TABLE IF EXISTS d9_small_index")
  }

  test("D8: apply keeps cluster keepers and untouched docs, drops other members") {
    val docs = Seq((1L, "a"), (2L, "b"), (3L, "c"), (5L, "f"), (7L, "d"), (9L, "e"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("a", "b")
    val kept = Dedup.applyDedup(docs, "doc_id", pairs)
      .select("doc_id").as[Long].collect().toSet
    // clusters {1,2,3} and {7,9} keep their min ids; 5 is untouched
    assert(kept == Set(1L, 5L, 7L))
  }

  test("D7: the boilerplate membership flag is a BROADCAST join (corpus never shuffles for it)") {
    val plan = DedupQueries.queries("d7_passage_dedup")(spark, sfDir)
      .queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"boilerplate flag must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"d7 must not shuffle-join the chunk stream:\n$plan")
  }

  test("gate queries: no cartesian product in any dedup plan") {
    for (name <- Seq("d2_minhash_pairs", "d3_simhash", "d4_jaccard_pairs", "d5_embed_dedup")) {
      val plan = DedupQueries.queries(name)(spark, sfDir).queryExecution.sparkPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$name plan has a cartesian product")
    }
  }
}
