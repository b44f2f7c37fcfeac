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
    * signatures — the standard unbiased estimate of Jaccard similarity.
    *
    * Unrolled to `numHashes` static element comparisons (optimization
    * round 19): the `aggregate(zip_with(...))` HOF form evaluated
    * interpreted (HOF lambdas are CodegenFallback) on d9's probe hot
    * path — once per (index row × batch row) band-join match, i.e. per
    * candidate pair at every scale. numHashes is a compile-time
    * constant of the index geometry, so GetArrayItem + CASE + Add
    * unrolls into whole-stage codegen with no per-element lambda
    * dispatch. Same null-free integer arithmetic, same result. */
  def estimatedJaccard(a: Column, b: Column, numHashes: Int): Column =
    (0 until numHashes).map(i => when(a(i) === b(i), 1).otherwise(0))
      .reduce(_ + _).cast("double") / numHashes

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
  def candidatePairs(bandsDf: DataFrame, idCol: String, maxBucket: Int): DataFrame =
    candidatePairsRaw(bandsDf, idCol, maxBucket).distinct()

  /** [[candidatePairs]] WITHOUT the final distinct — the same pair may
    * appear once per shared band (≤ numBands copies). Consumers that
    * canonicalize the pair set themselves (the label fixpoint distincts
    * its oriented edge relation as its first step) take this form and
    * skip one full pair-relation Exchange; anything that RETURNS pairs
    * (d2, the chain's pairs output) must use [[candidatePairs]].
    * (Optimization round 18 — d6/d8 previously paid distinct-by-(a,b)
    * immediately followed by the fixpoint's distinct-by-(hi,lo) of the
    * same rows.) */
  def candidatePairsRaw(bandsDf: DataFrame, idCol: String, maxBucket: Int): DataFrame = {
    val buckets = bandsDf.groupBy(col("band_idx"), col("band_val"))
      .agg(collect_list(col(idCol)).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket))
      // sort ONCE in a projection (optimization round 18): inlining
      // array_sort(ids) into trianglePairs re-evaluated the sort under
      // every outer lambda element via the slice argument — O(k² log k)
      // comparisons per k-bucket (HOF lambdas evaluate interpreted; no
      // common-subexpression elimination reaches inside them)
      .select(array_sort(col("ids")).as("ids"))
    buckets
      .select(explode(trianglePairs(col("ids"))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
  }

  /** Duplicate-group resolution (D6): connected components over the
    * near-dup pair graph, so each duplicate cluster elects one canonical
    * keeper (the minimum id). Alternating large-star / small-star edge
    * contraction (Kiveris et al., SoCC 2014 — see
    * [[labelPropagationCounted]] for the algorithm and for why the
    * earlier label-propagation-with-pointer-jump variant was
    * O(diameter), not O(log n), on real id placements). Convergence is
    * ~log₂ n rounds regardless of topology OR id order (DedupSpec pins
    * the counts on planted monotone AND shuffled paths; the real sf100
    * candidate graph took 6). The default cap of 64 costs nothing when
    * converged earlier — the loop exits on an exact star-forest test —
    * and a cap-out throws instead of returning partially merged
    * labels. Per round: one aggregate + one join per star phase;
    * `localCheckpoint` cuts the growing lineage so round N doesn't
    * replan rounds 1..N-1. The driver only ever moves one boolean (the
    * star-forest test) per round. */
  /** The min-label fixpoint of [[duplicateGroups]] as a raw (id, label)
    * relation — the input to both the group summary and the APPLY pass
    * (label == id ⟺ the id is its cluster's canonical keeper). */
  def duplicateLabels(pairs: DataFrame, maxIterations: Int = 64): DataFrame =
    labelPropagation(pairs, maxIterations)

  /** D8: apply the dedup decision — drop every non-canonical member of
    * every duplicate cluster, keep everything else. One anti-join of the
    * corpus against the BOUNDED drop set (members of near-dup clusters
    * minus their keepers — duplicates, by definition a small fraction of
    * a curated corpus; broadcast when it fits, shuffled otherwise).
    *
    * Optimization round 18: the standalone apply pass never needs the
    * full label table — the drop set IS the `hi` side of the converged
    * star forest (labels.filter(id =!= label) is definitionally the
    * left-join MATCHES of nodes against final edges, i.e. exactly the
    * hi values; every edge has hi ≠ lo and at convergence each hi
    * carries one edge). Reading drops straight off the fixpoint's edge
    * relation skips the node-universe distinct (a full pair-relation
    * Exchange + checkpoint) and the final labels join + checkpoint that
    * [[duplicateLabels]] pays for callers that need roots too (d6's
    * groups, the chain). Results identical (DedupSpec pins d8 equality;
    * same oracle). */
  def applyDedup(docs: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val (edges, _, _, edgeBlocks, _) =
      fixpointCore(pairs, maxIterations = 64, needNodes = false)
    // r18 advisory: the anti-join used to read the converged forest's
    // blocks lazily, pinning them in the block manager for the session
    // with no release path. Re-materialize just the drop set (one
    // column of the forest — duplicates-to-drop, bounded by the
    // component graph) and free the two-column forest; the residual
    // pin is the drop set itself, strictly smaller.
    val (drops, _) = checkpointedByMode(edges.select(col("hi").as("__drop_id")))
    edgeBlocks.foreach(_.unpersist(blocking = false))
    docs.join(drops, docs(idCol) === col("__drop_id"), "left_anti")
  }

  /** The APPLY pass from precomputed cluster labels. */
  def applyLabels(docs: DataFrame, idCol: String, labels: DataFrame): DataFrame = {
    val drops = labels
      .filter(col("id") =!= col("label"))
      .select(col("id").as("__drop_id"))
    docs.join(drops, docs(idCol) === col("__drop_id"), "left_anti")
  }

  def duplicateGroups(pairs: DataFrame, maxIterations: Int = 64): DataFrame =
    groupsFromLabels(labelPropagation(pairs, maxIterations))

  /** The group summary from precomputed cluster labels. */
  def groupsFromLabels(labels: DataFrame): DataFrame =
    labels
      .groupBy(col("label").as("group_id"))
      .agg(count(lit(1)).as("n_members"),
        // id-sorted, comma-joined: groups are bounded (near-dup clusters),
        // and the string form is hashable by any downstream engine
        concat_ws(",", transform(sort_array(collect_list(col("id"))),
          _.cast("string"))).as("members"))

  /** All three corpus-dedup outputs from ONE signature pass and ONE
    * label fixpoint (round 17).
    *
    * Run as separate queries, d2 (candidate pairs), d6 (cluster
    * groups), and d8 (deduped corpus) each re-derive the full
    * shingle→minhash→band relation from text, and d6/d8 each run their
    * own label-propagation fixpoint — at 50M docs the corpus signature
    * pass is paid three times and the fixpoint twice. A production
    * ingest pipeline wants all three outputs of the SAME pass: this
    * chain materializes the candidate pairs once (the only corpus-sized
    * work), runs the fixpoint once on those pairs (its result is
    * checkpointed and component-graph-sized, i.e. tiny next to the
    * corpus), and derives pairs/groups/deduped from the shared state.
    * The deduped corpus still re-scans `docs` for its anti-join —
    * unavoidable and cheap next to the shingle pass. Results are
    * IDENTICAL to the standalone d2/d6/d8 forms (DedupSpec pins
    * equality; the d10 gate key shares d8's oracle).
    *
    * The pairs materialization honors [[ReliableCheckpointKey]] exactly
    * like the fixpoint rounds (round 18 — it used to be an
    * unconditional localCheckpoint): the pairs relation is the chain's
    * largest pinned state (197M rows at sf1000), held for the chain's
    * whole lifetime so d8's anti-join can read it, so it is the state
    * a cluster LEAST wants in executor block managers — one lost
    * executor would fail the entire chain job. Reliable mode writes it
    * once to the checkpoint store instead. */
  final case class ChainOut(pairs: DataFrame, labels: DataFrame,
                            groups: DataFrame, deduped: DataFrame)

  def dedupChain(docs: DataFrame, idCol: String, textCol: String, k: Int,
                 numHashes: Int, numBands: Int, maxBucket: Int,
                 maxIterations: Int = 64): ChainOut = {
    val rows = shingleRows(docs, idCol, textCol, k)
    val pairs = checkpointedByMode(
      candidatePairs(bands(rows, idCol, numHashes, numBands),
        idCol, maxBucket))._1 // pairs lives for the chain's lifetime — blocks never freed here
    // the chain's pairs are already materialized, distinct, and a < b
    // (candidatePairs' contract), so the fixpoint skips its own
    // canonicalization Exchange + materialization — at sf1000 that is a
    // 197M-row shuffle and block write it used to pay on top of the
    // pairs checkpoint (optimization round 18)
    val labels = labelPropagationPreCanonicalized(
      pairs, maxIterations)._1 // checkpointed inside
    ChainOut(pairs, labels, groupsFromLabels(labels),
      applyLabels(docs, idCol, labels))
  }

  /** When true (and `SparkContext.setCheckpointDir` points at reliable
    * storage), every corpus/graph-sized materialization in the library
    * checkpoints to the reliable store instead of executor block
    * managers — the fixpoint rounds here, [[dedupChain]]'s pairs
    * relation (r18), and the SCD-1 merge's pre-overwrite
    * materialization (`graft.model.TableGen`, r18 — where the local
    * blocks are additionally load-bearing: the overwrite deletes the
    * files they were computed from). `localCheckpoint` is the fast
    * local default, but its blocks die with their executor — on a real
    * cluster one lost executor fails the whole job. The reliable mode
    * trades one write per materialization for restartability; old
    * round files are dropped by Spark's reference-tracking cleaner
    * (`spark.cleaner.referenceTracking.cleanCheckpoints`) or at latest
    * when the application's checkpoint dir is removed. (The key keeps
    * its original `graft.dedup.` spelling — it predates the library-
    * wide scope and is referenced by committed receipts.) */
  val ReliableCheckpointKey = "graft.dedup.reliableCheckpoint"

  /** Materialize `df` under the session's checkpoint MODE — the one
    * policy every corpus/graph-sized pin in this package goes through
    * ([[dedupChain]]'s pairs and every fixpoint round): reliable mode →
    * `df.checkpoint()` to the `SparkContext` checkpoint dir (refused
    * loudly if none is set — silently falling back to local blocks
    * would defeat the mode's point); default → `localCheckpoint()`.
    *
    * Returns the materialized frame plus the executor blocks backing a
    * LOCAL checkpoint: `localCheckpoint` persists its backing RDD in
    * the block manager but `Dataset.unpersist` can't reach it, so the
    * handle is captured by diffing the persistent-RDD registry around
    * the call — callers that supersede their state round-by-round (the
    * fixpoint) unpersist the previous round's blocks; callers whose
    * state lives for the whole job (the chain's pairs) ignore them.
    * Reliable checkpoints hold no executor blocks — nothing to free. */
  private[graft] def checkpointedByMode(
      df: DataFrame): (DataFrame, Seq[org.apache.spark.rdd.RDD[_]]) = {
    val spark = df.sparkSession
    val sc = spark.sparkContext
    val reliable = spark.conf.get(ReliableCheckpointKey, "false").toBoolean
    require(!reliable || sc.getCheckpointDir.isDefined,
      s"$ReliableCheckpointKey=true requires SparkContext.setCheckpointDir " +
        "(an HDFS/object-store path on a real cluster)")
    if (reliable) (df.checkpoint(), Nil)
    else {
      val before = sc.getPersistentRDDs.keySet
      val out = df.localCheckpoint()
      (out, (sc.getPersistentRDDs -- before).values.toSeq)
    }
  }

  private def labelPropagation(pairs: DataFrame, maxIterations: Int): DataFrame =
    labelPropagationCounted(pairs, maxIterations)._1

  /** One large-star + small-star contraction round: the edge set that
    * replaces `edges` next round (pre-checkpoint). Factored out of
    * [[labelPropagationCounted]] so the plan receipt
    * ([[FixpointRoundProbe]]) explains exactly the round the loop runs.
    *
    * (Optimization round 19 NEGATIVE result, ABBA-receipted in
    * bench_sweeps_r19/obsfold_abba_*.json: folding the convergence test
    * into this round's materialization as an `observe()` metric on the
    * large-star groupBy — one job per round instead of two — measured
    * 1.3–2x SLOWER on d6/d8/d10 at sf0.1 with flat d2/d4 controls. The
    * fold learns convergence at round k from round k+1's job, so it
    * trades k tiny star-forest aggregate jobs over checkpointed
    * forests for ONE extra full contraction round (~0.45 s at sf0.1,
    * the r18 round-probe figure) plus CollectMetrics overhead on every
    * round's hottest aggregate. The separate per-round test stays.) */
  private[graft] def starRound(edges: DataFrame): DataFrame = {
    // Optimization round 18: the intermediate ls.distinct() is dropped —
    // duplicate (hi, lo) rows cannot change a min aggregate, and the
    // round's final distinct() restores the set form, so e2 is
    // row-identical (labels AND round counts unchanged; DedupSpec pins
    // both) while the round saves one full edge-relation Exchange +
    // aggregate at every scale. (A stronger rewrite — explicit
    // repartition per star phase shared by both consumers — measured
    // 1.12× SLOWER at the gate SF: AQE already broadcasts the per-node
    // min sides and reuses the duplicated subtrees at runtime, so the
    // forced repartitions only added wire; see FixpointRoundProbe and
    // OPTIMIZATION_r18.md.)
    //
    // ---- large-star: every node attaches its LARGER neighbours to
    // its minimum neighbour (or itself). Per-node min is a map-side-
    // combined aggregate; the emit join reuses the same hash key.
    val sym = edges.select(col("hi").as("u"), col("lo").as("v"))
      .union(edges.select(col("lo").as("u"), col("hi").as("v")))
    val mins = sym.groupBy(col("u")).agg(min(col("v")).as("mn"))
      .select(col("u"), least(col("u"), col("mn")).as("m"))
    val ls = sym.filter(col("v") > col("u"))
      .join(mins, "u")
      .select(col("v").as("hi"), col("m").as("lo"))
    // ---- small-star: every node re-points its SMALLER neighbours
    // (and itself) at the minimum of that set. Orientation hi > lo is
    // preserved by construction, so no re-canonicalization needed.
    val smins = ls.groupBy(col("hi")).agg(min(col("lo")).as("m"))
    ls.join(smins, "hi")
      .select(col("lo").as("n"), col("m"))
      .union(smins.select(col("hi").as("n"), col("m")))
      .filter(col("n") =!= col("m"))
      .select(col("n").as("hi"), col("m").as("lo"))
      .distinct()
  }

  /** [[labelPropagation]] plus the round count it converged in — the
    * worst-case receipt surface (DedupSpec pins the count on planted
    * path graphs, including one with SHUFFLED node ids — the topology
    * that broke the round-11 pointer-jumping variant).
    *
    * Algorithm: alternating large-star / small-star edge contraction
    * (Kiveris, Lattanzi, Mirrokni, Rastogi & Vassilvitskii, "Connected
    * Components in MapReduce and Beyond", ACM SoCC 2014). Each round
    * rewrites the edge set so every node hooks its neighbours onto its
    * minimum neighbour; the fixpoint is a star forest with every
    * component contracted onto its minimum id. O(log² n) rounds worst
    * case, ~log₂ n measured (DedupSpec: 12 on a 4096-path, 11 with
    * shuffled ids; 6 on the real sf100 candidate graph).
    *
    * Why not min-label propagation with a pointer jump (rounds ≤11 used
    * L'(v)=min(L(v), min_N L(u), L(L(v)))): the jump only doubles per
    * round when node ids are monotone along paths. With arbitrary id
    * placement, scattered local minima form "basins" whose interior
    * must be crossed one hop per round before the jump can distribute
    * anything — measured on the r14 sf100 corpus, a 910-node component
    * with eccentricity 26 took 27 rounds (no speedup over plain BFS),
    * and a shuffled-id 4096-path did not converge in 300. Star
    * contraction has no such dependence on id placement because the
    * EDGES move, not just the labels. */
  private[graft] def labelPropagationCounted(
      pairs: DataFrame, maxIterations: Int): (DataFrame, Int) =
    labelsFromFixpoint(pairs, maxIterations, preCanonicalized = false)

  /** The preCanonicalized fixpoint entry, restricted to [[dedupChain]]'s
    * call site (r18 advisory): the contract — `pairs` materialized,
    * distinct, strictly oriented a < b — is enforced nowhere at runtime
    * (checking it would cost exactly the Exchange the flag removes), so
    * no caller outside this object gets to assert it. A violation would
    * silently re-execute the caller's pair plan every round and pay an
    * extra contraction round per duplicate edge. */
  private def labelPropagationPreCanonicalized(
      pairs: DataFrame, maxIterations: Int): (DataFrame, Int) =
    labelsFromFixpoint(pairs, maxIterations, preCanonicalized = true)

  private def labelsFromFixpoint(
      pairs: DataFrame, maxIterations: Int,
      preCanonicalized: Boolean): (DataFrame, Int) = {
    val (edges, nodesOpt, iter, edgeBlocks, nodeBlocks) =
      fixpointCore(pairs, maxIterations, needNodes = true, preCanonicalized)
    // the final star forest IS the label table: hi → lo maps every
    // non-root to its component min; roots (and nodes whose edges
    // contracted away) label themselves
    val (labels, _) = checkpointedByMode(
      nodesOpt.get.join(edges.select(col("hi").as("id"), col("lo").as("label")),
          Seq("id"), "left")
        .select(col("id"), coalesce(col("label"), col("id")).as("label")))
    // labels is self-contained after its checkpoint — free the inputs
    nodeBlocks.foreach(_.unpersist(blocking = false))
    edgeBlocks.foreach(_.unpersist(blocking = false))
    (labels, iter)
  }

  /** The contraction fixpoint: converged star forest (+ optionally the
    * input node universe) from ONE execution of the pairs plan.
    *
    * Optimization round 18: the r17 form materialized the node universe
    * from `pairs` and then the canonical edge set from `pairs` AGAIN —
    * for a standalone d6 that executed the entire corpus-sized
    * candidate pipeline (shingle → minhash → band → bucket → explode)
    * twice. Now the canonical oriented pair set is checkpointed once
    * (self-loop rows retained, so the node universe is derivable) and
    * the node relation, when requested, is a cheap re-read of those
    * blocks — the same node SET as before (explode of the distinct
    * canonical pairs covers exactly the ids of the raw pairs).
    *
    * Returns (edges, nodes, rounds, edgeBlocks, nodeBlocks): `edges` is
    * the converged star forest (hi ≠ lo), backed by `edgeBlocks` —
    * callers whose result plan reads edges lazily (the d8 anti-join)
    * must NOT free them; callers that re-materialize (the labels
    * checkpoint) free both lists when done. */
  private def fixpointCore(pairs: DataFrame, maxIterations: Int, needNodes: Boolean,
                           preCanonicalized: Boolean = false)
      : (DataFrame, Option[DataFrame], Int,
         Seq[org.apache.spark.rdd.RDD[_]], Seq[org.apache.spark.rdd.RDD[_]]) = {
    // star forest ⟺ algorithm fixpoint: every hi carries exactly one
    // edge and no lo ever appears as a hi (each component fully
    // contracted onto its root). One aggregate job over the
    // checkpointed edge set — necessary AND sufficient, so the stop
    // decision is exact, not a change-counter heuristic. (Optimization
    // round 19 measured the observe()-fold alternative — convergence
    // riding each round's own materialization, one job per round — at
    // 1.3–2x SLOWER; see [[starRound]]'s scaladoc. This separate test
    // runs over the CHECKPOINTED, contraction-shrunk forest, so it is
    // far cheaper than the extra full probing round the fold costs.)
    def isStarForest(e: DataFrame): Boolean =
      e.select(col("hi").as("n"), lit(1).as("nh"), lit(0).as("nl"))
        .union(e.select(col("lo").as("n"), lit(0).as("nh"), lit(1).as("nl")))
        .groupBy(col("n"))
        .agg(sum(col("nh")).as("nh"), max(col("nl")).as("nl"))
        .filter(col("nh") > 1 || (col("nh") > 0 && col("nl") === 1))
        .isEmpty
    // canonical oriented pair set (hi >= lo), deduped, self-loops kept;
    // materialized once so no round — and no node derivation — replans
    // the candidate-generation pipeline. When the caller GUARANTEES the
    // input is already materialized, distinct, and oriented a < b (the
    // chain's checkpointed pairs), the projection is enough — no second
    // pair-relation Exchange, no second materialization, and no blocks
    // of our own to free (the caller owns the input's lifetime).
    val (canon, canonBlocks) =
      if (preCanonicalized)
        (pairs.select(col("b").as("hi"), col("a").as("lo")),
          Seq.empty[org.apache.spark.rdd.RDD[_]])
      else checkpointedByMode(
        pairs.select(greatest(col("a"), col("b")).as("hi"),
            least(col("a"), col("b")).as("lo"))
          .distinct())
    // the node universe is fixed by the INPUT graph — contraction
    // rewrites edges, so the final label join must recover every
    // original id. Checkpointed BEFORE the loop frees the canon blocks.
    val nodes =
      if (!needNodes) (None, Nil)
      else {
        val (n, nb) = checkpointedByMode(
          canon.select(explode(array(col("hi"), col("lo"))).as("id")).distinct())
        (Some(n), nb)
      }
    var edges = canon.filter(col("hi") =!= col("lo"))
    var edgeBlocks = canonBlocks
    var converged = isStarForest(edges)
    var iter = 0
    while (!converged && iter < maxIterations) {
      // (Optimization round 18 measured the tempting alternative — TWO
      // rounds per checkpoint+convergence-test cycle, halving the
      // materializations — at 1.35x SLOWER warm: without the per-round
      // checkpoint the round's internally re-referenced subtrees nest,
      // so the fused plan re-plans and partially re-executes round 1
      // under round 2's three consumers. One round per materialization
      // stays.)
      val (e2, b2) = checkpointedByMode(starRound(edges))
      converged = isStarForest(e2)
      // e2 is materialized (eager checkpoint) — the previous round's
      // edge blocks have no remaining readers; free them (the node
      // relation is checkpointed above, so round 1 freeing the canon
      // blocks cannot orphan it)
      edgeBlocks.foreach(_.unpersist(blocking = false))
      edges = e2
      edgeBlocks = b2
      iter += 1
    }
    // Round-11: a silent cap-out returned labels that LOOK converged but
    // aren't (partially merged components) — the worst failure mode.
    // At the measured ~log₂ n rate the default cap of 64 covers any
    // physically possible component, so hitting it means something is
    // genuinely wrong; say so.
    require(converged, s"connected components did not converge within " +
      s"$maxIterations rounds — raise maxIterations (labels would be " +
      "partially merged, silently wrong)")
    (edges, nodes._1, iter, edgeBlocks, nodes._2)
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
    // Optimization round 18: per-bit SET-BIT COUNTS instead of ±1 vote
    // sums — sum((h>>i)&1) skips the *2-1 per token per bit the vote
    // form paid (60 multiply-subtracts per token row under ANSI checked
    // arithmetic; measured 0.94 → 0.63 s on the sf0.1 signature pass).
    // The sign test is the same integer comparison: v_i = 2c_i - n >= 0
    // ⟺ 2c_i >= n, so signatures are bit-identical (DedupSpec pins).
    val counts = (0 until bits).map { i =>
      sum(shiftright(col("h"), i).bitwiseAND(lit(1L))).as(s"c$i")
    }
    val sigBits: Seq[Column] = (0 until bits).map { i =>
      when(col(s"c$i") * 2L >= col("graft_n"), lit(1L << i)).otherwise(lit(0L))
    }
    // No pre-shuffle: the scan's natural splits parallelize the map work
    // (at scale, thousands of file splits), and partial aggregation means
    // d3's one Exchange carries (id, 60 count partials) — never the text.
    // A repartition here would shuffle the widest column in the corpus.
    df.select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .select(col(idCol), tokenHash.as("h"))
      .groupBy(col(idCol))
      .agg(count(lit(1L)).as("graft_n"), counts: _*)
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
      // sort by (id, sig) ONCE in a projection: upper-triangle pairs come
      // out a.id < b.id. (Optimization round 18 — the sort used to sit
      // inside the pair lambda, re-sorting the bucket under every outer
      // element AND in the slice: O(k² log k) comparisons per k-bucket.)
      .select(array_sort(col("items")).as("items"))
    val pairs = flatten(transform(col("items"), (x, i) =>
      transform(slice(col("items"), i + lit(2), size(col("items"))),
        y => struct(x.getField("id").as("a"), y.getField("id").as("b"),
          bit_count(x.getField("sig").bitwiseXOR(y.getField("sig"))).as("hamming")))))
    buckets
      .select(explode(pairs).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"), col("p.hamming").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
