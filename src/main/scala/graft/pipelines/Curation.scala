package graft.pipelines

import graft.Tables
import graft.dedup.Dedup
import graft.ops.Sampling
import graft.text.TextFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end corpus-curation operators (SURVEY §2.10) — the composed
  * passes a pretraining data pipeline actually runs, built from the
  * same primitives the individual gate queries prove (quality signals
  * T2, exact dedup D1, PII scrub T8, hash split P1, shingles D2,
  * deterministic sampling P3).
  *
  * c1 is ONE plan: scan → quality filter (map-side) → keep-first dedup
  * (single shuffle on content hash) → PII scrub (map-side) → split tag
  * (map-side). At 100 TB that is one pass over the corpus with one
  * Exchange carrying only surviving rows.
  *
  * t9 is the train-eval CONTAMINATION check (n-gram overlap between
  * corpus documents and a held-out eval set): the eval set is bounded
  * (fixed k), so its distinct shingles broadcast and the corpus side
  * never shuffles for the probe — the same bounded-build-side contract
  * as the heavy-hitter skew join.
  */
object CurationQueries {

  private def docs(s: SparkSession, dir: String): DataFrame = Tables(s, dir, "documents")

  // c1 thresholds: drop short/punctuation-heavy docs (Gopher-style
  // floor); the values keep a majority of the synthetic corpus while
  // exercising both predicates
  val MinTokens = 20
  val MaxPunct = 0.2

  /** C1 core, df-level (spec-testable): quality gate, exact-dedup
    * keep-first (min_by aggregate — the surviving ROW flows on with no
    * join-back, and unlike a row_number window there is no sort: the
    * hash aggregate combines duplicate groups map-side BEFORE the one
    * shuffle), PII scrub, deterministic train/val/test tag.
    * `clean_len` proves the scrub ran without carrying full text
    * through the gate compare.
    *
    * The scrub stays POST-dedup, and that placement is measured, not
    * assumed (round 9): moving it map-side (inside the min_by struct,
    * so the Exchange carries ~40-byte rows instead of text) LOST the
    * interleaved 20×-probe A/B 5.9 s vs 1.8 s median — the piiScrub
    * regex chain over the duplicate fraction costs far more than
    * shuffling their text, because regex throughput (~tens of MB/s per
    * core) is an order below shuffle bandwidth. Scrub-once-per-winner
    * is the right shape at any duplicate rate.
    *
    * ROLE CHANGE (round 11): this single-scan text-bearing-Exchange
    * form is now the documented ALTERNATIVE — the hash-only-Exchange
    * form ([[curateHashExchange]]) won the r11 20×-probe A/B (2.27 vs
    * 2.35 s median, identical results) and is the production c1. This
    * form remains the right choice when a second scan is expensive
    * (cold object storage) — its one Exchange still ships each
    * surviving text exactly once (min_by partials combine duplicate
    * groups map-side before the wire). */
  def curate(d: DataFrame,
             minTokens: Int = MinTokens,
             maxPunct: Double = MaxPunct): DataFrame = {
    d
      .withColumn("n_tokens", TextFunctions.tokenCount(col("text")))
      .withColumn("punct_ratio", TextFunctions.charRatio(lower(col("text")), "[^a-z0-9\\s]"))
      .filter(col("n_tokens") >= minTokens && col("punct_ratio") <= maxPunct)
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min_by(
        struct(col("doc_id"), col("lang"), col("n_tokens"), col("text")),
        col("doc_id")).as("keep"))
      .select(col("keep.doc_id"), col("keep.lang"), col("keep.n_tokens"), col("keep.text"))
      .withColumn("split",
        when(Sampling.hashBucket(col("doc_id"), 10) < 8, lit("train"))
          .when(Sampling.hashBucket(col("doc_id"), 10) < 9, lit("val"))
          .otherwise(lit("test")))
      .select(col("doc_id"), col("lang"), col("split"), col("n_tokens"),
        length(TextFunctions.piiScrub(col("text"))).as("clean_len"))
  }

  def c1Curation(s: SparkSession, dir: String): DataFrame =
    curateHashExchange(docs(s, dir))

  /** PRODUCTION c1 (promoted round 11; A/B probe [[CurationProbe]]):
    * the keep-first aggregate carries only (content_hash, doc_id, lang,
    * n_tokens) — ~60-byte rows — through the Exchange, and the winning
    * text is fetched by a SECOND corpus scan joined on doc_id. It won
    * the r11 interleaved 20×-probe A/B against the text-bearing form
    * (2.27 vs 2.35 s median, result-hash-equal) even on flat parquet,
    * where the fetch join still shuffles text once: the md5+struct
    * shuffle write of full text costs more than a rescan. The scale
    * case is stronger than the local one — on a corpus table bucketed
    * by doc_id the fetch join is SHUFFLE-FREE, so the only corpus-wide
    * Exchange left in the c1 pipeline carries ~60-byte rows; that is
    * the 100 TB shape. [[curate]] remains the single-scan alternative
    * for cold storage where a second scan dominates. */
  def curateHashExchange(d: DataFrame,
                         minTokens: Int = MinTokens,
                         maxPunct: Double = MaxPunct): DataFrame = {
    val winners = d
      .withColumn("n_tokens", TextFunctions.tokenCount(col("text")))
      .withColumn("punct_ratio", TextFunctions.charRatio(lower(col("text")), "[^a-z0-9\\s]"))
      .filter(col("n_tokens") >= minTokens && col("punct_ratio") <= maxPunct)
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min_by(
        struct(col("doc_id"), col("lang"), col("n_tokens")), col("doc_id")).as("keep"))
      .select(col("keep.doc_id"), col("keep.lang"), col("keep.n_tokens"))
    winners
      .join(d.select(col("doc_id"), col("text")), Seq("doc_id"))
      .withColumn("split",
        when(Sampling.hashBucket(col("doc_id"), 10) < 8, lit("train"))
          .when(Sampling.hashBucket(col("doc_id"), 10) < 9, lit("val"))
          .otherwise(lit("test")))
      .select(col("doc_id"), col("lang"), col("split"), col("n_tokens"),
        length(TextFunctions.piiScrub(col("text"))).as("clean_len"))
  }

  /** T9 eval-set size: fixed, so the eval shingle set is bounded and
    * broadcastable regardless of corpus scale. */
  val EvalK = 50
  val ShingleK = 3

  /** T9 core, df-level: train-eval contamination — for every corpus
    * document, how many of its distinct word 3-grams also appear in the
    * (deterministic, bottom-k-by-md5) eval set. Docs sharing nothing
    * are dropped; eval docs themselves are excluded (anti join on the
    * bounded id set). */
  def contamination(d: DataFrame, evalK: Int = EvalK): DataFrame = {
    // per-doc distinct shingles fused into the map-side native
    // expression: no shuffle anywhere before the probe's final agg
    def distinctShingleRows(docs: DataFrame): DataFrame =
      docs.select(col("doc_id"),
        explode(TextFunctions.distinctShingles(
          TextFunctions.tokens(col("text")), ShingleK)).as("shingle"))
    val sh = distinctShingleRows(d)
    val evalIds = d
      .select(col("doc_id").as("eval_id"),
        Sampling.hashBucket(col("doc_id"), Int.MaxValue).as("h"))
      .orderBy(col("h").asc, col("eval_id").asc)
      .limit(evalK)
      .select(col("eval_id"))
    // filter to the evalK docs BEFORE shingling: the broadcast build
    // side costs one bounded-doc-set pass, not a second corpus pass
    val evalShingles = distinctShingleRows(
        d.join(broadcast(evalIds), col("doc_id") === col("eval_id"))
          .select(col("doc_id"), col("text")))
      .select(col("shingle")).distinct()
      .withColumn("hit", lit(1))
    sh.join(broadcast(evalShingles), Seq("shingle"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("hit"), lit(0))).as("n_shared"))
      .filter(col("n_shared") > 0)
      .join(broadcast(evalIds), col("doc_id") === col("eval_id"), "left_anti")
      .select(col("doc_id"), col("n_shared"), col("n_shingles"),
        (col("n_shared").cast("double") / col("n_shingles")).as("contamination"))
  }

  def t9Contamination(s: SparkSession, dir: String): DataFrame =
    contamination(docs(s, dir))

  /** C2 model-score gate threshold (the stub scorer's range on this
    * corpus is ~[0.06, 0.31]; 0.25 keeps a bit over half). Exactly
    * representable, so the >= boundary decides identically in every
    * engine. */
  val MinModelScore = 0.25

  /** C2: c1 with the model-quality seam gating in front — the full
    * scorer path (iterator mapPartitions batches) runs INSIDE this gate
    * query, oracle-checked because the stub's arithmetic is
    * SQL-reproducible. A real LM scorer swaps in via [[QualityScorer]]
    * without touching anything else. */
  def c2ScoredCuration(s: SparkSession, dir: String): DataFrame =
    Quality.curateScored(docs(s, dir), LexicalDiversityScorer, MinModelScore)

  /** C3: per-SOURCE corpus governance stats — the grain real curation
    * decisions are made at (block a crawl source, re-weight a feed):
    * volume, exact-dup rate (distinct content hashes vs docs), short-doc
    * rate against the c1 floor, language spread, and token mass. ONE
    * groupBy(source) with map-side partials; the distinct-hash count is
    * the d1 shuffle keyed (source, hash) — at 100 TB this is one pass
    * over the corpus and a bounded (|sources|-row) result. */
  def sourceStats(d: DataFrame): DataFrame =
    d
      .withColumn("n_tokens", TextFunctions.tokenCount(col("text")))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(md5(col("text"))).as("n_distinct"),
        count(when(col("n_tokens") < MinTokens, 1)).as("n_short"),
        countDistinct(col("lang")).as("n_langs"),
        sum(col("n_tokens").cast("long")).as("total_tokens"))
      .withColumn("dup_rate",
        lit(1.0) - col("n_distinct").cast("double") / col("n_docs"))

  def c3SourceStats(s: SparkSession, dir: String): DataFrame =
    sourceStats(docs(s, dir))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c1_curation" -> (c1Curation _),
    "c2_scored_curation" -> (c2ScoredCuration _),
    "c3_source_stats" -> (c3SourceStats _),
    "t9_contamination" -> (t9Contamination _))

  private val hashSql = "('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT"

  private val scrubSql =
    """regexp_replace(regexp_replace(regexp_replace(text,
      |  '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
      |  'https?://[^\s]+', '<URL>', 'g'),
      |  '[0-9][0-9 ()+.-]{8,}[0-9]', '<NUMBER>', 'g')""".stripMargin

  /** The stub scorer in SQL: same tokenizer, same operation order
    * ((distinct/n) * least(1, n/100)) — correctly-rounded IEEE division
    * makes the boundary compare identical to the Scala seam path. */
  private val scoreSql =
    """(len(list_distinct(string_split_regex(trim(lower(text)), '\s+'))) * 1.0
      |   / len(string_split_regex(trim(lower(text)), '\s+')))
      | * least(1.0, len(string_split_regex(trim(lower(text)), '\s+')) / 100.0)""".stripMargin

  val oracles: Map[String, String] = Map(
    "c3_source_stats" ->
      s"""SELECT source, count(*) AS n_docs,
         |  count(DISTINCT md5(text)) AS n_distinct,
         |  count(*) FILTER (len(string_split_regex(trim(lower(text)), '\\s+')) < $MinTokens)
         |    AS n_short,
         |  count(DISTINCT lang) AS n_langs,
         |  CAST(sum(len(string_split_regex(trim(lower(text)), '\\s+'))) AS BIGINT)
         |    AS total_tokens,
         |  1.0 - count(DISTINCT md5(text)) * 1.0 / count(*) AS dup_rate
         |FROM documents GROUP BY source""".stripMargin,
    "c2_scored_curation" ->
      s"""WITH gated AS (
         |  SELECT doc_id, lang, text FROM documents WHERE $scoreSql >= $MinModelScore),
         |q AS (SELECT doc_id, lang, text,
         |    len(string_split_regex(trim(lower(text)), '\\s+')) AS n_tokens,
         |    (length(lower(text)) - length(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g')))
         |      * 1.0 / length(lower(text)) AS punct_ratio
         |  FROM gated),
         |f AS (SELECT * FROM q WHERE n_tokens >= $MinTokens AND punct_ratio <= $MaxPunct),
         |d AS (SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn FROM f)
         |SELECT doc_id, lang,
         |  CASE WHEN $hashSql % 10 < 8 THEN 'train'
         |       WHEN $hashSql % 10 < 9 THEN 'val' ELSE 'test' END AS split,
         |  n_tokens,
         |  length($scrubSql) AS clean_len
         |FROM d WHERE rn = 1""".stripMargin,
    "c1_curation" ->
      s"""WITH q AS (SELECT doc_id, lang, text,
         |    len(string_split_regex(trim(lower(text)), '\\s+')) AS n_tokens,
         |    (length(lower(text)) - length(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g')))
         |      * 1.0 / length(lower(text)) AS punct_ratio
         |  FROM documents),
         |f AS (SELECT * FROM q WHERE n_tokens >= $MinTokens AND punct_ratio <= $MaxPunct),
         |d AS (SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn FROM f)
         |SELECT doc_id, lang,
         |  CASE WHEN $hashSql % 10 < 8 THEN 'train'
         |       WHEN $hashSql % 10 < 9 THEN 'val' ELSE 'test' END AS split,
         |  n_tokens,
         |  length($scrubSql) AS clean_len
         |FROM d WHERE rn = 1""".stripMargin,
    "t9_contamination" ->
      s"""WITH t AS (SELECT doc_id,
         |    string_split_regex(trim(lower(text)), '\\s+') AS w FROM documents),
         |sh AS (SELECT DISTINCT doc_id, shingle FROM (
         |    SELECT doc_id, unnest(list_transform(
         |      range(1, greatest(len(w) - ${ShingleK - 1}, 0) + 1),
         |      i -> array_to_string(w[i:i+${ShingleK - 1}], ' '))) AS shingle
         |    FROM t WHERE len(w) >= $ShingleK)),
         |ev AS (SELECT doc_id FROM (
         |    SELECT doc_id, $hashSql % 2147483647 AS h FROM documents)
         |  ORDER BY h ASC, doc_id ASC LIMIT $EvalK),
         |evs AS (SELECT DISTINCT shingle FROM sh JOIN ev USING (doc_id)),
         |agg AS (SELECT s.doc_id,
         |    count(*) AS n_shingles,
         |    CAST(sum(CASE WHEN e.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_shared
         |  FROM sh s LEFT JOIN evs e ON s.shingle = e.shingle
         |  GROUP BY s.doc_id)
         |SELECT doc_id, n_shared, n_shingles,
         |  n_shared * 1.0 / n_shingles AS contamination
         |FROM agg
         |WHERE n_shared > 0 AND doc_id NOT IN (SELECT doc_id FROM ev)""".stripMargin)
}
