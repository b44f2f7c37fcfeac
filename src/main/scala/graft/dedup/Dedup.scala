package graft.dedup

import graft.text.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators (SURVEY §2.3, D1–D5).
  *
  * Design for 100 TB:
  * - Shingling / MinHash / SimHash are map-only passes (built-in
  *   expressions, whole-stage codegen, no UDF).
  * - Candidate generation NEVER does an all-pairs join: LSH banding
  *   multiplies rows by a small constant (numBands), then a self-join on
  *   the band-bucket key shuffles each doc to its buckets and pairs only
  *   co-bucketed docs. A bucket-size cap drops degenerate buckets (e.g.
  *   boilerplate shingles) that would otherwise go quadratic — standard
  *   LSH practice; the cap is part of the operator contract and the
  *   oracle applies the same cap.
  * - Exact verification (Jaccard / cosine) runs only on candidate pairs.
  *
  * MinHash here is md5-seeded (TextFunctions.seededHash) rather than a
  * random permutation family: deterministic, cluster-portable, and
  * reproducible in any engine with md5 — which is what lets the DuckDB
  * oracle check d2/d4 exactly instead of a weak rows-only count.
  */
object Dedup {

  /** One (doc_id, shingle) row per word-kGram occurrence (duplicates
    * retained — MinHash minima are unaffected by multiplicity).
    *
    * The shingle array comes from the native [[graft.text.Shingles]]
    * codegen expression — one map-side pass, no shuffle. (Round ≤5 used
    * posexplode + `lead` windows, which were codegen'd but bought
    * adjacency with a full shuffle+sort of the exploded token stream;
    * the native expression removed that Exchange, and downstream
    * aggregates now get MAP-SIDE PARTIALS before their own shuffle —
    * at 100 TB the wire carries per-partition signatures, not the
    * tokenized corpus.) */
  def shingleRows(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    df.select(col(idCol),
      explode(TextFunctions.shingles(TextFunctions.tokens(col(textCol)), k)).as("shingle"))

  /** doc_id + distinct shingle set (docs with no shingle are dropped —
    * they cannot collide with anything). The set materializes map-side
    * through the fused-distinct [[graft.text.Shingles]] expression —
    * no explode, no collect_set aggregate, NO shuffle (round ≤5 paid an
    * Exchange + hash aggregate to rebuild a set the source row could
    * emit directly). Set-consumers (Jaccard via array_intersect) are
    * order-insensitive, so first-occurrence order == collect_set
    * semantics. */
  def shingleSets(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    df.select(col(idCol),
        TextFunctions.distinctShingles(TextFunctions.tokens(col(textCol)), k).as("shingles"))
      .filter(size(col("shingles")) > 0)

  /** Mersenne prime 2^31-1: the minhash value domain. Affine products
    * stay below 2^61, so the arithmetic is exact in any engine's 64-bit
    * integers (DuckDB errors on BIGINT overflow; Spark would wrap). */
  val MinhashPrime: Long = 2147483647L

  /** Affine mix coefficients for hash function i — fixed, engine-portable
    * constants (the DuckDB oracle inlines the same values). */
  def mixA(i: Int): Long = ((i + 1) * 2654435761L) % MinhashPrime
  def mixB(i: Int): Long = ((i + 1) * 40503L * 65537L) % MinhashPrime

  /** One md5 per shingle → 60-bit int → reduced mod p. The expensive
    * hash happens ONCE; the per-function variety comes from cheap affine
    * mixes of this base value. Scalar form — codegen'd. */
  def shingleBaseHash(shingle: Column): Column =
    conv(substring(md5(shingle), 1, 15), 16, 10).cast("long") % MinhashPrime

  /** Array form of [[shingleBaseHash]] (interpreted HOF — fine off the
    * hot path). */
  def shingleBaseHashes(shingleCol: Column): Column =
    transform(shingleCol, s => shingleBaseHash(s))

  /** MinHash signature from pre-computed base hashes: min over the set
    * of (a_i*h + b_i) mod p per hash function — integer-only. Feed this a
    * materialized base-hash COLUMN (not the md5 expression itself), else
    * the md5 pass is duplicated into all `numHashes` entries. (Array-
    * expression form; the hot path in [[bands]] uses the codegen'd
    * explode+aggregate form instead.) */
  def minhashFromBase(baseCol: Column, numHashes: Int): Column =
    array((0 until numHashes).map { i =>
      array_min(transform(baseCol, h =>
        (h * mixA(i) + mixB(i)) % MinhashPrime))
    }: _*)

  /** LSH bands: signature split into `numBands` groups of `rowsPerBand`,
    * each group's values joined into one bucket key. */
  def bandValues(sigCol: Column, numBands: Int, rowsPerBand: Int): Column =
    array((0 until numBands).map { b =>
      concat_ws("|", slice(sigCol, b * rowsPerBand + 1, rowsPerBand))
    }: _*)

  /** (doc_id, band_idx, band_val) — one row per doc per band, from
    * [[shingleRows]] output.
    *
    * ONE hash aggregate computes all numHashes mins as plain integer
    * expressions over the scalar base hash — whole-stage codegen end to
    * end, with map-side partial mins combining the exploded shingle
    * stream BEFORE its single shuffle (the Exchange carries one
    * 16-min partial per doc per partition, not the token stream). */
  def bands(rows: DataFrame, idCol: String, numHashes: Int, numBands: Int): DataFrame = {
    val rowsPerBand = numHashes / numBands
    // md5 once per shingle in the projection; the 16 mins reference the
    // bound column (cheap), not the hash expression
    val hashed = rows.select(col(idCol), shingleBaseHash(col("shingle")).as("h"))
    val mins = (0 until numHashes).map { i =>
      min((col("h") * mixA(i) + mixB(i)) % MinhashPrime).as(s"mh$i")
    }
    val sig = hashed.groupBy(col(idCol)).agg(mins.head, mins.tail: _*)
    val bandCols = (0 until numBands).map { b =>
      concat_ws("|", (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"mh$i")): _*)
    }
    sig.select(col(idCol), posexplode(array(bandCols: _*)))
      .withColumnsRenamed(Map("pos" -> "band_idx", "col" -> "band_val"))
  }

  /** (id, band_key, sig) — one row per doc per band, carrying the FULL
    * minhash signature beside each band key (round 11, the persisted
    * dedup-index row shape: the signature rides the band row so a probe
    * verifies estimated Jaccard AT the band join, no second join to a
    * signature table). `band_key` is the band index and its minhash
    * values pipe-joined into one string — a single join/bucket column,
    * injective because every component is a decimal integer. Same
    * one-aggregate codegen shape as [[bands]]: map-side partial mins
    * combine the exploded shingle stream before its single shuffle. */
  def bandSigRows(rows: DataFrame, idCol: String,
                  numHashes: Int, numBands: Int): DataFrame = {
    val rowsPerBand = numHashes / numBands
    val hashed = rows.select(col(idCol), shingleBaseHash(col("shingle")).as("h"))
    val mins = (0 until numHashes).map { i =>
      min((col("h") * mixA(i) + mixB(i)) % MinhashPrime).as(s"mh$i")
    }
    val sig = hashed.groupBy(col(idCol)).agg(mins.head, mins.tail: _*)
      .select(col(idCol),
        array((0 until numHashes).map(i => col(s"mh$i")): _*).as("sig"))
    val bandKeys = (0 until numBands).map { b =>
      concat_ws("|", (lit(b) +: (b * rowsPerBand until (b + 1) * rowsPerBand)
        .map(i => col("sig")(i))): _*)
    }
    sig.select(col(idCol), col("sig"), explode(array(bandKeys: _*)).as("band_key"))
  }

  /** Fraction of equal components between two equal-length minhash
    * signatures — the standard unbiased estimate of Jaccard similarity. */
  def estimatedJaccard(a: Column, b: Column, numHashes: Int): Column =
    aggregate(zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v).cast("double") / numHashes

  /** All (a < b) pairs from a sorted id array — upper-triangle expansion
    * as a pure expression, bounded by the bucket cap (≤ cap²/2 pairs). */
  private def trianglePairs(sortedIds: Column): Column =
    flatten(transform(sortedIds, (x, i) =>
      transform(slice(sortedIds, i + lit(2), size(sortedIds)),
        y => struct(x.as("a"), y.as("b")))))

  /** Distinct candidate pairs (a < b) sharing at least one band bucket.
    * ONE pass + ONE shuffle: group docs per bucket (collect_list is
    * bounded by the cap — oversized "boilerplate" buckets are dropped,
    * the standard LSH skew guard), then expand each bucket's pairs
    * expression-side. No self-join, so the upstream minhash pipeline is
    * evaluated exactly once. */
  def candidatePairs(bandsDf: DataFrame, idCol: String, maxBucket: Int): DataFrame = {
    val buckets = bandsDf.groupBy(col("band_idx"), col("band_val"))
      .agg(collect_list(col(idCol)).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket))
    buckets
      .select(explode(trianglePairs(array_sort(col("ids")))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .distinct()
  }

  /** Duplicate-group resolution (D6): connected components over the
    * near-dup pair graph, so each duplicate cluster elects one canonical
    * keeper (the minimum id). Iterative min-label propagation WITH
    * synchronous pointer jumping — each round every node takes the min
    * of its own label, its neighbours' labels, and its label's label,
    * so convergence is O(log diameter) rounds for ANY topology (plain
    * neighbor-min is O(diameter): fine for clique-shaped near-dup
    * buckets, catastrophic for a drifting chain of versioned documents
    * — DedupSpec pins both counts on a planted path). Per round: two
    * joins + one aggregate; `localCheckpoint` cuts the growing lineage
    * so round N doesn't replan rounds 1..N-1. The driver-side loop only
    * ever moves one scalar (the convergence count), and a cap-out
    * throws instead of returning partially merged labels. */
  /** The min-label fixpoint of [[duplicateGroups]] as a raw (id, label)
    * relation — the input to both the group summary and the APPLY pass
    * (label == id ⟺ the id is its cluster's canonical keeper). */
  def duplicateLabels(pairs: DataFrame, maxIterations: Int = 20): DataFrame =
    labelPropagation(pairs, maxIterations)

  /** D8: apply the dedup decision — drop every non-canonical member of
    * every duplicate cluster, keep everything else. One anti-join of the
    * corpus against the BOUNDED drop set (members of near-dup clusters
    * minus their keepers — duplicates, by definition a small fraction of
    * a curated corpus; broadcast when it fits, shuffled otherwise). */
  def applyDedup(docs: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val drops = duplicateLabels(pairs)
      .filter(col("id") =!= col("label"))
      .select(col("id").as("__drop_id"))
    docs.join(drops, docs(idCol) === col("__drop_id"), "left_anti")
  }

  def duplicateGroups(pairs: DataFrame, maxIterations: Int = 20): DataFrame = {
    labelPropagation(pairs, maxIterations)
      .groupBy(col("label").as("group_id"))
      .agg(count(lit(1)).as("n_members"),
        // id-sorted, comma-joined: groups are bounded (near-dup clusters),
        // and the string form is hashable by any downstream engine
        concat_ws(",", transform(sort_array(collect_list(col("id"))),
          _.cast("string"))).as("members"))
  }

  /** When true (and `SparkContext.setCheckpointDir` points at reliable
    * storage), each fixpoint round checkpoints to the reliable store
    * instead of executor block managers. `localCheckpoint` is the fast
    * local default, but its blocks die with their executor — on a real
    * cluster one lost executor fails the whole label-propagation job.
    * The reliable mode trades one write per round for restartability;
    * old round files are dropped by Spark's reference-tracking cleaner
    * (`spark.cleaner.referenceTracking.cleanCheckpoints`) or at latest
    * when the application's checkpoint dir is removed. */
  val ReliableCheckpointKey = "graft.dedup.reliableCheckpoint"

  private def labelPropagation(pairs: DataFrame, maxIterations: Int): DataFrame =
    labelPropagationCounted(pairs, maxIterations)._1

  /** [[labelPropagation]] plus the round count it converged in — the
    * round-11 worst-case receipt surface (DedupSpec pins the count on a
    * planted path graph, the diameter-maximal topology). */
  private[graft] def labelPropagationCounted(
      pairs: DataFrame, maxIterations: Int): (DataFrame, Int) = {
    val spark = pairs.sparkSession
    val sc = spark.sparkContext
    val reliable = spark.conf.get(ReliableCheckpointKey, "false").toBoolean
    require(!reliable || sc.getCheckpointDir.isDefined,
      s"$ReliableCheckpointKey=true requires SparkContext.setCheckpointDir " +
        "(an HDFS/object-store path on a real cluster)")
    // localCheckpoint persists its backing RDD in the block manager but
    // Dataset.unpersist can't reach it; capture the handle by diffing the
    // persistent-RDD registry around the call so each round's blocks can
    // be freed once superseded (without this, Bench/Verify accumulate
    // every round's label blocks for the whole session). Reliable
    // checkpoints hold no executor blocks — nothing to free.
    def checkpointed(df: DataFrame): (DataFrame, Seq[org.apache.spark.rdd.RDD[_]]) =
      if (reliable) (df.checkpoint(), Nil)
      else {
        val before = sc.getPersistentRDDs.keySet
        val out = df.localCheckpoint()
        (out, (sc.getPersistentRDDs -- before).values.toSeq)
      }
    // materialize the edge list once — every iteration joins it, and
    // without the checkpoint each round would re-run the entire
    // candidate-generation pipeline that produced `pairs`
    val (edges, edgeBlocks) = checkpointed(
      pairs.select(col("a"), col("b"))
        .union(pairs.select(col("b").as("a"), col("a").as("b"))))
    var (labels, labelBlocks) = checkpointed(
      edges.select(col("a").as("id")).distinct()
        .select(col("id"), col("id").as("label")))
    var converged = false
    var iter = 0
    while (!converged && iter < maxIterations) {
      val neighborMin = edges
        .join(labels, edges("b") === labels("id"))
        .groupBy(edges("a").as("nid"))
        .agg(min(col("label")).as("nlabel"))
      // Synchronous pointer jumping (round-11): alongside the one-hop
      // neighbor min, every node also takes its label's label —
      // L'(v) = min(L(v), min_{u∈N(v)} L(u), L(L(v))). The jump doubles
      // the distance a min has traveled per round, so convergence is
      // O(log diameter) instead of O(diameter) — the difference between
      // 12 rounds and 4096 on a drifting-near-dup chain (DedupSpec pins
      // this on a planted path). The lookup side is the label table
      // itself (unique pid per row); the label-keyed shuffle of the
      // left side concentrates a converged component's members on its
      // min-label key — AQE's skew-join split handles that, and the
      // per-round win dominates. `labels` is checkpointed, so scanning
      // it twice costs block-manager reads, not plan re-execution.
      val jumped = labels.select(col("id").as("pid"), col("label").as("plabel"))
      // The convergence count rides the SAME job that materializes the
      // new labels: observe() attaches a zero-shuffle aggregate to the
      // plan, and the eager localCheckpoint inside `checkpointed` is the
      // action that populates it — one job per round, not two (round ≤6
      // re-joined updated⋈labels and ran a second isEmpty action).
      val obs = org.apache.spark.sql.Observation(s"cc_round_$iter")
      val (updated, updatedBlocks) = checkpointed(
        labels
          .join(neighborMin, labels("id") === col("nid"), "left")
          .join(jumped, labels("label") === col("pid"), "left")
          .select(labels("id"),
            labels("label").as("old_label"),
            least(labels("label"),
              coalesce(col("nlabel"), labels("label")),
              coalesce(col("plabel"), labels("label"))).as("label"))
          .withColumn("changed", col("label") < col("old_label"))
          .observe(obs, sum(col("changed").cast("long")).as("n_changed"))
          .select(col("id"), col("label")))
      // sum over zero rows is SQL NULL → converged (empty graph)
      val nChanged = obs.get.getOrElse("n_changed", null)
      converged = nChanged == null || nChanged == 0L
      // `updated` is materialized (eager checkpoint) — the previous
      // round's label blocks have no remaining readers; free them
      labelBlocks.foreach(_.unpersist(blocking = false))
      labels = updated
      labelBlocks = updatedBlocks
      iter += 1
    }
    // Round-11: a silent cap-out returned labels that LOOK converged but
    // aren't (partially merged components) — the worst failure mode.
    // With pointer jumping, maxIterations=20 covers diameters ~2^20, so
    // hitting the cap means something is genuinely wrong; say so.
    require(converged, s"connected components did not converge within " +
      s"$maxIterations rounds — raise maxIterations (labels would be " +
      "partially merged, silently wrong)")
    // the final labels checkpoint is self-contained, so the edge blocks
    // are no longer reachable from the returned (lazy) plan
    edgeBlocks.foreach(_.unpersist(blocking = false))
    (labels, iter)
  }

  /** (doc_id, pos, chunk): one row per fixed-width non-overlapping token
    * window, from the native [[graft.text.TokenChunks]] kernel — map-side
    * only, no shuffle. `pos` is the chunk index within its document. */
  def chunkRows(df: DataFrame, idCol: String, textCol: String, w: Int): DataFrame =
    df.select(col(idCol),
        posexplode(TextFunctions.chunks(TextFunctions.tokens(col(textCol)), w)))
      .withColumnRenamed("col", "chunk")

  /** Chunk hashes whose corpus occurrence count reaches `minFreq` — the
    * boilerplate set. ONE groupBy on md5(chunk): map-side partial counts
    * mean the Exchange carries (hash, count) partials, never chunk text.
    * The post-filter output is small by construction (only text repeated
    * ≥ minFreq times corpus-wide survives), which is what licenses the
    * broadcast in [[passageDedup]]. */
  def boilerplateHashes(chunks: DataFrame, minFreq: Long): DataFrame =
    chunks.groupBy(md5(col("chunk")).as("h"))
      .agg(count(lit(1)).as("freq"))
      .filter(col("freq") >= minFreq)

  /** Passage-level dedup (D7): strip chunks that recur across the corpus
    * (headers, licenses, navbars — the duplication mode doc-level D1–D6
    * provably miss: the containing documents are all distinct).
    *
    * Two passes over the corpus, matching the CCNet/RefinedWeb shape:
    * pass 1 aggregates chunk-hash frequencies (small Exchange — hashes +
    * count partials); pass 2 re-chunks, flags membership in the
    * BROADCAST boilerplate set (map-side, no shuffle), and regroups by
    * document to rebuild the cleaned text — the single full-text
    * Exchange in the whole operator. No pair join at any point, so
    * unlike D2–D5 the cost is linear in corpus size, not candidate
    * count. */
  def passageDedup(df: DataFrame, idCol: String, textCol: String,
                   w: Int, minFreq: Long): DataFrame = {
    val ch = chunkRows(df, idCol, textCol, w)
    val boiler = boilerplateHashes(ch, minFreq).select(col("h"))
    val flagged = ch
      .join(broadcast(boiler), md5(col("chunk")) === col("h"), "left")
      .select(col(idCol), col("pos"), col("chunk"), col("h").isNotNull.as("boiler"))
    flagged.groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_chunks"),
        count(when(col("boiler"), 1)).as("n_boilerplate"),
        // collect_list drops the nulls `when` produces for boilerplate
        // chunks; struct sort restores document order (pos is unique
        // within a doc). All-boilerplate docs yield "" (concat_ws over
        // an empty array), not NULL.
        concat_ws(" ",
          transform(array_sort(collect_list(when(!col("boiler"),
            struct(col("pos"), col("chunk"))))),
            _.getField("chunk"))).as("clean_text"))
  }

  /** Exact Jaccard over two distinct-element shingle arrays. Integer
    * counts + one double division: bit-identical across engines. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - inter)
  }

  /** SimHash over tokens: 60-bit signature from md5-derived token hashes.
    * For each bit, tokens vote +1/-1 by their hash bit; the signature bit
    * is the vote's sign. Near-dup docs differ in few bits. Map-only per
    * doc after one explode+groupBy (partial aggregation applies). */
  def simhash(df: DataFrame, idCol: String, textCol: String, bits: Int = 60): DataFrame = {
    val tokenHash = conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long")
    val votes = (0 until bits).map { i =>
      sum(shiftright(col("h"), i).bitwiseAND(lit(1L)) * 2L - 1L).as(s"v$i")
    }
    val sigBits: Seq[Column] = (0 until bits).map { i =>
      when(col(s"v$i") >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    // No pre-shuffle: the scan's natural splits parallelize the map work
    // (at scale, thousands of file splits), and partial aggregation means
    // d3's one Exchange carries (id, 60 vote partials) — never the text.
    // A repartition here would shuffle the widest column in the corpus.
    df.select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .select(col(idCol), tokenHash.as("h"))
      .groupBy(col(idCol))
      .agg(votes.head, votes.tail: _*)
      .select(col(idCol), sigBits.reduce(_ + _).as("simhash"))
  }

  /** SimHash near-dup pairs: band the signature into `numBands` bit
    * slices (a pair within hamming distance numBands-1 shares >= 1 exact
    * band), bucket by slice value, then verify true hamming distance <=
    * maxHamming. Same one-pass grouped-bucket shape as candidatePairs —
    * no self-join, no all-pairs. */
  def simhashPairs(sig: DataFrame, idCol: String, bits: Int, numBands: Int,
                   maxHamming: Int, maxBucket: Int): DataFrame = {
    val bandBits = bits / numBands
    val mask = (1L << bandBits) - 1
    val bandCols = (0 until numBands).map { b =>
      struct(lit(b).as("band_idx"),
        shiftright(col("simhash"), b * bandBits).bitwiseAND(lit(mask)).as("band_val"))
    }
    val buckets = sig
      .select(col(idCol), col("simhash"), explode(array(bandCols: _*)).as("bv"))
      .groupBy(col("bv.band_idx"), col("bv.band_val"))
      .agg(collect_list(struct(col(idCol).as("id"), col("simhash").as("sig"))).as("items"))
      .filter(size(col("items")).between(2, maxBucket))
    // sort by (id, sig): upper-triangle pairs come out a.id < b.id
    val pairs = flatten(transform(array_sort(col("items")), (x, i) =>
      transform(slice(array_sort(col("items")), i + lit(2), size(col("items"))),
        y => struct(x.getField("id").as("a"), y.getField("id").as("b"),
          bit_count(x.getField("sig").bitwiseXOR(y.getField("sig"))).as("hamming")))))
    buckets
      .select(explode(pairs).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"), col("p.hamming").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
