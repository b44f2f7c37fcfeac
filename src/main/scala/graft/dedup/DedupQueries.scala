package graft.dedup

import graft.Tables
import graft.sim.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dedup queries over the documents / embeddings tables (SURVEY §2.3).
  *
  * d1/d2/d4 are exactly oracle-checked (md5-based MinHash is reproduced
  * verbatim in DuckDB SQL); d3/d5 are rows-only in the gate with planted-
  * duplicate semantics covered by ScalaTest specs (DedupSpec).
  */
object DedupQueries {

  val ShingleK = 3
  val NumHashes = 16
  val NumBands = 4
  val MaxBucket = 100
  val JaccardThreshold = 0.1

  private def docs(s: SparkSession, dir: String): DataFrame = Tables(s, dir, "documents")

  /** D1: exact dedup — content-hash groupBy, keep-first. One shuffle on
    * the hash; at 100 TB this is the cheapest possible exact dedup. */
  def d1ExactDedup(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))

  /** D2: MinHash + LSH banding candidate pairs (no all-pairs join). */
  def d2MinhashPairs(s: SparkSession, dir: String): DataFrame = {
    val rows = Dedup.shingleRows(docs(s, dir), "doc_id", "text", ShingleK)
    Dedup.candidatePairs(Dedup.bands(rows, "doc_id", NumHashes, NumBands), "doc_id", MaxBucket)
  }

  /** D3: SimHash signatures + banded near-dup pairs (rows-only + spec). */
  def d3Simhash(s: SparkSession, dir: String): DataFrame = {
    val sig = Dedup.simhash(docs(s, dir), "doc_id", "text")
    Dedup.simhashPairs(sig, "doc_id", bits = 60, numBands = 4,
      maxHamming = 10, maxBucket = MaxBucket)
  }

  /** D4: exact n-gram Jaccard verification on the LSH candidates only.
    *
    * Optimization round 19 NEGATIVE result (r18 verdict item 3,
    * ABBA-receipted in bench_sweeps_r19/d4_*_abba_*.json): bounding the
    * verify join's set relation by the candidate ids — materialize the
    * pair set, semi-join one shingle-set scan down to candidate
    * members, read both join sides off that bounded checkpoint —
    * measured 1.4x SLOWER at sf0.1 (0.92 → 1.29 s) and ~1.15x slower
    * at sf1 (flat d2 control in both windows). The three corpus
    * tokenization passes this form pays are independent map-only
    * BRANCHES OF ONE JOB DAG — Spark overlaps them across cores, so
    * their wall cost is ~max, not sum — while the bounded form's
    * checkpoint barriers serialize the pipeline and add three driver
    * actions. The lesson generalizes r18's fixpoint findings: at any
    * scale where cores outnumber the scan's splits the barrier costs
    * more than the pass it saves, and at cluster scale the three
    * passes remain embarrassingly parallel map work while the barrier
    * stays a barrier. */
  def d4JaccardPairs(s: SparkSession, dir: String): DataFrame = {
    val rows = Dedup.shingleRows(docs(s, dir), "doc_id", "text", ShingleK)
    val cand = Dedup.candidatePairs(Dedup.bands(rows, "doc_id", NumHashes, NumBands),
      "doc_id", MaxBucket)
    val sh = Dedup.shingleSets(docs(s, dir), "doc_id", "text", ShingleK)
    val sa = sh.select(col("doc_id").as("a"), col("shingles").as("sa"))
    val sb = sh.select(col("doc_id").as("b"), col("shingles").as("sb"))
    cand.join(sa, "a").join(sb, "b")
      .select(col("a"), col("b"), Dedup.jaccard(col("sa"), col("sb")).as("jac"))
      .filter(col("jac") >= JaccardThreshold)
  }

  /** D5: embedding-cosine near-dup via hyperplane LSH buckets. The gate
    * corpus is synthetic with no planted near-dups (max pairwise cosine
    * ≈ 0.51), so the operating point (min 4 planes, τ=0.4) is chosen to
    * surface real positives — the gate then proves pair semantics, not
    * just an empty intersection. Planted-pair semantics at a production
    * threshold are covered in DedupSpec.
    *
    * Plane count is CORPUS-SIZED ([[Similarity.autoPlanes]], round 11):
    * at sf0.01/sf0.1 the floor of 4 planes keeps the historical gate
    * results bit-identical; at sf1 (20k vectors) 8 planes hold bucket
    * occupancy at the target, turning the measured ×34-on-×10-data
    * quadratic back to linear. The count() that sizes it is a parquet
    * metadata read, not a data scan. */
  val EmbedPlanes = 4 // floor; autoPlanes raises it with the corpus
  val EmbedThreshold = 0.4
  val EmbedTargetBucket = 150
  val EmbedMaxPlanes = 12

  def d5EmbedDedup(s: SparkSession, dir: String): DataFrame = {
    val vecs = Tables(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val planes = Similarity.autoPlanes(vecs.count(), EmbedTargetBucket,
      EmbedPlanes, EmbedMaxPlanes)
    Similarity.embeddingDupPairs(
      vecs, "vec_id", "embedding", numPlanes = planes, threshold = EmbedThreshold)
  }

  /** d2's candidate stream BEFORE its distinct — for consumers whose
    * first step canonicalizes the pair set anyway (the d6/d8 label
    * fixpoint), so the pair relation crosses the wire once, not twice
    * (optimization round 18). Same pair SET as [[d2MinhashPairs]]. */
  private def d2RawPairs(s: SparkSession, dir: String): DataFrame = {
    val rows = Dedup.shingleRows(docs(s, dir), "doc_id", "text", ShingleK)
    Dedup.candidatePairsRaw(Dedup.bands(rows, "doc_id", NumHashes, NumBands),
      "doc_id", MaxBucket)
  }

  /** D6: duplicate clusters from the D2 candidate graph — connected
    * components elect each cluster's canonical keeper. */
  def d6DupGroups(s: SparkSession, dir: String): DataFrame =
    Dedup.duplicateGroups(d2RawPairs(s, dir))

  /** D7: passage-level boilerplate removal — chunks recurring ≥ ChunkMinFreq
    * times corpus-wide are stripped from every document. Catches the
    * cross-document repetition mode (headers/licenses/navbars) that
    * doc-level D1–D6 miss when the containing documents are distinct. */
  val ChunkWidth = 8
  val ChunkMinFreq = 3L

  def d7PassageDedup(s: SparkSession, dir: String): DataFrame =
    Dedup.passageDedup(docs(s, dir), "doc_id", "text", ChunkWidth, ChunkMinFreq)

  /** D8: the dedup APPLY pass — the corpus with every non-canonical
    * near-dup cluster member removed (D2 candidates → D6 labels →
    * anti-join). What a pipeline actually materializes after dedup. */
  def d8DedupApply(s: SparkSession, dir: String): DataFrame =
    Dedup.applyDedup(docs(s, dir), "doc_id", d2RawPairs(s, dir))
      .select(col("doc_id"), col("lang"), col("source"))

  /** D9: incremental dedup against a PERSISTED signature index — build
    * the index over the 80% "historical" slice (doc_id % 5 != 0), then
    * dedup the 20% "incoming batch" against it with no corpus rescan.
    * The split is deterministic so the DuckDB oracle reproduces both
    * sides; threshold ½ = at least half the signature components agree. */
  val IndexThreshold = 0.5
  val IndexBuckets = 16

  def d9IncrementalDedup(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val idx = DedupIndex.build(d.filter(col("doc_id") % 5 =!= 0),
      "doc_id", "text", "graft_d9_index", IndexBuckets,
      ShingleK, NumHashes, NumBands, MaxBucket)
    DedupIndex.probe(idx, d.filter(col("doc_id") % 5 === 0),
        "doc_id", "text", IndexThreshold)
      .select(col("batch_id"), col("index_id"),
        round(col("est_jaccard"), 6).as("est_jaccard"))
  }

  /** D10: the production CHAIN form — d2+d6+d8's outputs from ONE
    * signature pass and ONE label fixpoint ([[Dedup.dedupChain]], round
    * 17). The gate materializes the chain's deduped corpus, which must
    * equal d8's standalone result exactly (same oracle SQL); ChainBench
    * carries the cost receipt (chain vs sum of standalone runs). */
  def d10DedupChain(s: SparkSession, dir: String): DataFrame =
    Dedup.dedupChain(docs(s, dir), "doc_id", "text",
        ShingleK, NumHashes, NumBands, MaxBucket)
      .deduped
      .select(col("doc_id"), col("lang"), col("source"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d9_incremental_dedup" -> (d9IncrementalDedup _),
    "d8_dedup_apply" -> (d8DedupApply _),
    "d1_exact_dedup" -> (d1ExactDedup _),
    "d2_minhash_pairs" -> (d2MinhashPairs _),
    "d3_simhash" -> (d3Simhash _),
    "d4_jaccard_pairs" -> (d4JaccardPairs _),
    "d5_embed_dedup" -> (d5EmbedDedup _),
    "d6_dup_groups" -> (d6DupGroups _),
    "d7_passage_dedup" -> (d7PassageDedup _),
    "d10_dedup_chain" -> (d10DedupChain _))

  /** Shared DuckDB CTE chain reproducing the MinHash pipeline exactly:
    * one md5 per shingle → 60-bit int mod p, then the same affine mixes
    * (coefficients inlined from Dedup.mixA/mixB). */
  private val P = Dedup.MinhashPrime

  private val sigEntries = (0 until NumHashes)
    .map(i => s"list_min(list_transform(h, v -> (v * ${Dedup.mixA(i)} + ${Dedup.mixB(i)}) % $P))")
    .mkString(",\n    ")

  private val bandSelects = (0 until NumBands).map { b =>
    val lo = b * (NumHashes / NumBands) + 1
    val hi = lo + NumHashes / NumBands - 1
    s"SELECT doc_id, $b AS band_idx, array_to_string(g[$lo:$hi], '|') AS band_val FROM sig"
  }.mkString("\n  UNION ALL ")

  private val candCtes =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w FROM documents),
       |sh AS (
       |  SELECT doc_id, list_distinct(list_transform(
       |    range(1, greatest(len(w) - ${ShingleK - 1}, 0) + 1),
       |    i -> array_to_string(w[i:i+${ShingleK - 1}], ' '))) AS s
       |  FROM toks WHERE len(w) >= $ShingleK),
       |hs AS (
       |  SELECT doc_id, list_transform(s,
       |    x -> ('0x' || substr(md5(x), 1, 15))::BIGINT % $P) AS h FROM sh),
       |sig AS (
       |  SELECT doc_id, [
       |    $sigEntries
       |  ] AS g FROM hs),
       |bands AS (
       |  $bandSelects),
       |sized AS (
       |  SELECT band_idx, band_val FROM bands GROUP BY 1, 2
       |  HAVING count(*) BETWEEN 2 AND $MaxBucket),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       |  FROM bands x
       |  JOIN sized z ON x.band_idx = z.band_idx AND x.band_val = z.band_val
       |  JOIN bands y ON x.band_idx = y.band_idx AND x.band_val = y.band_val
       |  WHERE x.doc_id < y.doc_id)""".stripMargin

  /** d5's hyperplane buckets inlined as literal ±1 arrays (deterministic
    * constants shared with Similarity.hyperplanes) — upgrades d5 from a
    * rows-only check to an exact oracle. All EmbedMaxPlanes planes are
    * inlined; bits at p ≥ np (the corpus-sized count) are masked off, so
    * the oracle reproduces [[Similarity.autoPlanes]] for any SF. */
  private def d5BucketSql: String =
    Similarity.hyperplanes(EmbedMaxPlanes, 64).zipWithIndex.map { case (plane, p) =>
      val arr = plane.map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ",", "]")
      s"(CASE WHEN $p < np AND list_dot_product(v, $arr) >= 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString(" + ")

  /** The integer CASE ladder mirroring [[Similarity.autoPlanes]] —
    * n ≤ target·2^p picks p, exact integer comparisons on both sides. */
  private def d5PlanesSql: String = {
    val ladder = (EmbedPlanes until EmbedMaxPlanes).map(p =>
      s"WHEN n <= ${EmbedTargetBucket.toLong << p} THEN $p").mkString(" ")
    s"SELECT CASE $ladder ELSE $EmbedMaxPlanes END AS np FROM (SELECT count(*) AS n FROM embeddings)"
  }

  /** d3's SimHash reproduced in SQL: per-token md5 → 60-bit int, 60
    * bit-vote sums per doc, sign → signature bit, 15-bit band buckets,
    * hamming verify — every step integer arithmetic both engines share. */
  private def d3Sql: String = {
    val bits = 60
    val voteCols = (0 until bits)
      .map(i => s"sum(((h >> $i) & 1) * 2 - 1) AS v$i").mkString(",\n    ")
    val sigExpr = (0 until bits)
      .map(i => s"(CASE WHEN v$i >= 0 THEN ${1L << i} ELSE 0 END)").mkString(" + ")
    val bandSelects = (0 until 4).map { b =>
      s"SELECT doc_id, s, $b AS band_idx, (s >> ${b * 15}) & 32767 AS band_val FROM sig"
    }.mkString("\n  UNION ALL ")
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
       |  FROM documents),
       |h AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM toks),
       |votes AS (SELECT doc_id,
       |    $voteCols
       |  FROM h GROUP BY doc_id),
       |sig AS (SELECT doc_id, $sigExpr AS s FROM votes),
       |bands AS (
       |  $bandSelects),
       |sized AS (SELECT band_idx, band_val FROM bands GROUP BY 1, 2
       |  HAVING count(*) BETWEEN 2 AND $MaxBucket)
       |SELECT a, b, hamming FROM (
       |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
       |    bit_count(xor(x.s, y.s)) AS hamming
       |  FROM bands x
       |  JOIN sized z ON x.band_idx = z.band_idx AND x.band_val = z.band_val
       |  JOIN bands y ON x.band_idx = y.band_idx AND x.band_val = y.band_val
       |  WHERE x.doc_id < y.doc_id)
       |WHERE hamming <= 10""".stripMargin
  }

  /** d6: connected components via a recursive transitive-closure CTE
    * over the same candidate graph, labels = min reachable id. */
  private def d6Sql: String =
    s"""${candCtes.replaceFirst("WITH ", "WITH RECURSIVE ")},
       |und AS (SELECT a, b FROM cand UNION SELECT b AS a, a AS b FROM cand),
       |nodes AS (SELECT DISTINCT a AS id FROM und),
       |reach(id, r) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT u.a, reach.r FROM und u JOIN reach ON reach.id = u.b)
       |SELECT label AS group_id, count(*) AS n_members,
       |  array_to_string(list_sort(list(id)), ',') AS members
       |FROM (SELECT id, min(r) AS label FROM reach GROUP BY id)
       |GROUP BY 1""".stripMargin

  /** d7 reproduced in SQL: same tokenizer as candCtes, non-overlapping
    * W-token windows (range with stride; DuckDB slice clamps the tail
    * like the native kernel), corpus chunk frequency, rebuild in chunk
    * order. count(*) FILTER keeps n_boilerplate BIGINT on both sides;
    * coalesce matches Spark's '' for all-boilerplate docs. */
  private def d7Sql: String = {
    val w = ChunkWidth
    s"""WITH toks AS (
       |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w FROM documents),
       |ch AS (
       |  SELECT doc_id, (i - 1) / $w AS pos, array_to_string(w[i:i+${w - 1}], ' ') AS chunk
       |  FROM toks, LATERAL unnest(range(1, len(w) + 1, $w)) AS t(i)),
       |freq AS (
       |  SELECT chunk, count(*) AS freq FROM ch GROUP BY 1)
       |SELECT c.doc_id, count(*) AS n_chunks,
       |  count(*) FILTER (f.freq >= $ChunkMinFreq) AS n_boilerplate,
       |  coalesce(array_to_string(
       |    list(c.chunk ORDER BY c.pos) FILTER (f.freq < $ChunkMinFreq), ' '), '')
       |    AS clean_text
       |FROM ch c JOIN freq f ON c.chunk = f.chunk
       |GROUP BY c.doc_id""".stripMargin
  }

  /** d8: drop ids = nodes whose min reachable label differs from their
    * own id (same recursive closure as d6), anti-joined in SQL. */
  private def d8Sql: String =
    s"""${candCtes.replaceFirst("WITH ", "WITH RECURSIVE ")},
       |und AS (SELECT a, b FROM cand UNION SELECT b AS a, a AS b FROM cand),
       |nodes AS (SELECT DISTINCT a AS id FROM und),
       |reach(id, r) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT u.a, reach.r FROM und u JOIN reach ON reach.id = u.b),
       |lbl AS (SELECT id, min(r) AS label FROM reach GROUP BY id),
       |drops AS (SELECT id FROM lbl WHERE id <> label)
       |SELECT doc_id, lang, source FROM documents
       |WHERE doc_id NOT IN (SELECT id FROM drops)""".stripMargin

  /** d9 reproduced in SQL: the same minhash/banding CTEs as d2, split
    * into the deterministic base/batch halves; the per-write bucket cap
    * equals a global cap at the gate (one build = one write); estimated
    * Jaccard = fraction of equal signature components. */
  private def d9Sql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w FROM documents),
       |sh AS (
       |  SELECT doc_id, list_distinct(list_transform(
       |    range(1, greatest(len(w) - ${ShingleK - 1}, 0) + 1),
       |    i -> array_to_string(w[i:i+${ShingleK - 1}], ' '))) AS s
       |  FROM toks WHERE len(w) >= $ShingleK),
       |hs AS (
       |  SELECT doc_id, list_transform(s,
       |    x -> ('0x' || substr(md5(x), 1, 15))::BIGINT % $P) AS h FROM sh),
       |sig AS (
       |  SELECT doc_id, [
       |    $sigEntries
       |  ] AS g FROM hs),
       |bands AS (
       |  $bandSelects),
       |base AS (SELECT * FROM bands WHERE doc_id % 5 != 0),
       |sized AS (SELECT band_idx, band_val FROM base GROUP BY 1, 2
       |  HAVING count(*) <= $MaxBucket),
       |batch AS (SELECT * FROM bands WHERE doc_id % 5 = 0),
       |cand AS (
       |  SELECT DISTINCT y.doc_id AS batch_id, x.doc_id AS index_id
       |  FROM base x
       |  JOIN sized z ON x.band_idx = z.band_idx AND x.band_val = z.band_val
       |  JOIN batch y ON x.band_idx = y.band_idx AND x.band_val = y.band_val)
       |SELECT batch_id, index_id, est_jaccard FROM (
       |  SELECT c.batch_id, c.index_id,
       |    round(len(list_filter(range(1, ${NumHashes + 1}),
       |      i -> sx.g[i] = sy.g[i])) / ${NumHashes}.0, 6) AS est_jaccard
       |  FROM cand c
       |  JOIN sig sx ON sx.doc_id = c.index_id
       |  JOIN sig sy ON sy.doc_id = c.batch_id)
       |WHERE est_jaccard >= $IndexThreshold""".stripMargin

  val oracles: Map[String, String] = Map(
    "d9_incremental_dedup" -> d9Sql,
    "d8_dedup_apply" -> d8Sql,
    // the chain's deduped output is definitionally d8's result
    "d10_dedup_chain" -> d8Sql,
    "d7_passage_dedup" -> d7Sql,
    "d6_dup_groups" -> d6Sql,
    "d3_simhash" -> d3Sql,
    "d5_embed_dedup" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |params AS ($d5PlanesSql),
         |b AS (SELECT vec_id, v, $d5BucketSql AS bucket FROM e, params)
         |SELECT a, b, cos_sim FROM (
         |  SELECT x.vec_id AS a, y.vec_id AS b,
         |    round(list_dot_product(x.v, y.v) /
         |      (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))), 6)
         |      AS cos_sim
         |  FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id)
         |WHERE cos_sim >= $EmbedThreshold""".stripMargin,
    "d1_exact_dedup" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin,
    "d2_minhash_pairs" -> s"$candCtes\nSELECT a, b FROM cand",
    "d4_jaccard_pairs" ->
      s"""$candCtes
         |SELECT a, b, jac FROM (
         |  SELECT c.a, c.b,
         |    len(list_intersect(sa.s, sb.s)) * 1.0 /
         |      (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))) AS jac
         |  FROM cand c
         |  JOIN sh sa ON sa.doc_id = c.a
         |  JOIN sh sb ON sb.doc_id = c.b)
         |WHERE jac >= $JaccardThreshold""".stripMargin)
}
