package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic sampling / dataset-split operators (SURVEY §2.9, P1–P2).
  *
  * A training-data pipeline's splits must be (a) reproducible across
  * runs, engines, and cluster topologies, (b) stable under corpus growth
  * (a document keeps its split forever), and (c) computable map-side at
  * 100 TB. `rand()`-based sampling has none of these; hashing the stable
  * key has all three. The draw is md5-derived (same convention as the
  * MinHash pack: first 15 hex digits → int64), so the DuckDB oracle
  * reproduces every assignment bit-for-bit.
  *
  * Scale shape: both operators are a single codegen'd scan — the hash,
  * bucket arithmetic, and filter are map-side; the only shuffle is the
  * final bounded aggregate (≤ #splits × #langs rows). No sort, no
  * window, no join.
  */
object Sampling {

  /** Stable per-key hash bucket in [0, mod): md5 of the key's decimal
    * string, first 15 hex digits as int64, reduced mod `mod`. */
  def hashBucket(key: Column, mod: Int): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long") % mod

  /** P1: 80/10/10 train/val/test split by hash bucket, audited per
    * (split, lang): counts plus id-range witnesses. */
  def p1SplitSample(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .withColumn("bucket", hashBucket(col("doc_id"), 10))
      .withColumn("split",
        when(col("bucket") < 8, lit("train"))
          .when(col("bucket") < 9, lit("val"))
          .otherwise(lit("test")))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("min_id"),
        max(col("doc_id")).as("max_id"))

  /** P2: stratified (per-language) sampling with unequal rates — the
    * rebalancing pass an LLM data mix needs (downsample the dominant
    * language, keep more of the low-resource ones). Percent rates by
    * stratum; the checksum makes the gate sensitive to WHICH rows were
    * kept, not just how many. */
  val StratRates: Seq[(String, Int)] = Seq("en" -> 10, "zh" -> 50)
  val DefaultRate = 30

  def p2StratifiedSample(s: SparkSession, dir: String): DataFrame = {
    val rate = StratRates.foldRight(lit(DefaultRate): Column) {
      case ((lang, r), acc) => when(col("lang") === lang, lit(r)).otherwise(acc)
    }
    Tables(s, dir, "documents")
      .filter(hashBucket(col("doc_id"), 100) < rate)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_sampled"),
        sum(col("doc_id")).as("id_checksum"))
  }

  /** P3: deterministic exact-k uniform sample — the k corpus rows with
    * the smallest md5(id): how a fixed-size eval/calibration set is
    * drawn from a moving corpus. The plan is TakeOrderedAndProject
    * (per-partition heaps of k, merge on the driver) — NEVER a global
    * sort; at 100 TB the cost is one scan + k rows per partition. Same
    * bottom-k-by-hash primitive as the IVF centroid sample. */
  val SampleK = 100

  def p3UniformSample(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        hashBucket(col("doc_id"), Int.MaxValue).as("h"))
      .orderBy(col("h").asc, col("doc_id").asc)
      .limit(SampleK)

  /** P4: weighted exact-k sample WITHOUT replacement in one pass
    * (Efraimidis–Spirakis): row i draws u_i deterministically from
    * md5(id) and scores key_i = -ln(u_i) / w_i; the k SMALLEST keys are
    * the sample, with inclusion probability ∝ w_i. Weight = token count,
    * i.e. "sample by content mass" — the draw a token-budget eval or
    * calibration set needs. The plan is TakeOrderedAndProject
    * (per-partition heaps, never a global sort), identical at any scale.
    * Keys round to 9 dp BEFORE ranking (doc_id tiebreak) so libm ulp
    * differences in ln() cannot flip ranks cross-engine — t6's trick. */
  val WeightedK = 100

  def p4WeightedSample(s: SparkSession, dir: String): DataFrame = {
    val u = (hashBucket(col("doc_id"), Int.MaxValue).cast("double") + lit(1.0)) /
      lit(2147483648.0) // (0, 1]: h in [0, 2^31-2]
    val w = size(graft.text.TextFunctions.tokens(col("text"))).cast("double")
    Tables(s, dir, "documents")
      .select(col("doc_id"), col("lang"), round(-log(u) / w, 9).as("key"))
      .orderBy(col("key").asc, col("doc_id").asc)
      .limit(WeightedK)
  }

  /** P5: token-budget corpus selection — take documents in a
    * deterministic pseudo-random order until the cumulative token
    * count reaches the budget ("fill a 10B-token training budget from
    * a moving corpus"). The cumulative sum is GLOBAL but never
    * globally sorted: docs range-partition into ordered hash slices,
    * per-slice token totals (one tiny aggregate) prefix-sum on the
    * driver (one long per slice — bounded), and each slice adds its
    * offset to a LOCAL cumulative window. Exactly the two-phase scan
    * a 1000-executor cumulative sum uses; the only driver-side data
    * is one number per slice.
    *
    * The slice count follows `spark.sql.shuffle.partitions` (a fixed
    * constant would make each slice corpus/64 — ~1.5 TB per window
    * task at 100 TB): sized 2–3× cores like any shuffle, a 100 TB
    * corpus on a 6000-partition session sorts ~17 GB per slice, and
    * the driver prefix-sum stays 6000 scalars. The result is
    * bucket-count-invariant (OpsSpec pins slicing == global cumsum
    * for several counts), so re-tuning parallelism never changes the
    * selected set. */
  val TokenBudget = 20000L

  /** Slice count for [[tokenBudgetFill]]: the session's shuffle
    * parallelism (≥ 1). */
  def budgetBuckets(s: SparkSession): Int =
    math.max(s.conf.get("spark.sql.shuffle.partitions", "200").toInt, 1)

  /** P5 core, df-level (spec-testable): expects (doc_id, n_tokens)
    * rows; returns the budget-filling prefix in deterministic hash
    * order with the global cumulative token count. `buckets` ≤ 0
    * (the default) derives the slice count from the session. */
  def tokenBudgetFill(d: DataFrame, budget: Long,
                      buckets: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nBuckets = if (buckets > 0) buckets else budgetBuckets(d.sparkSession)
    // slice = range partition of the order key (h div ceil(max/n)), so
    // (slice, h, doc_id) ordering == global (h, doc_id) ordering
    val sliceWidth = (Int.MaxValue.toLong + nBuckets - 1) / nBuckets
    val docs = d
      .select(col("doc_id"), col("n_tokens"),
        hashBucket(col("doc_id"), Int.MaxValue).as("h"))
      .withColumn("slice", (col("h") / sliceWidth).cast("int"))
    val sliceTotals = docs.groupBy(col("slice"))
      .agg(sum(col("n_tokens")).as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until nBuckets).scanLeft(0L) {
      (acc, b) => acc + sliceTotals.getOrElse(b, 0L)
    } // offsets(b) = tokens in all earlier slices
    // O(1) literal-map lookup (a when-chain would grow the expression
    // tree linearly in the bucket count)
    val offsetMap = typedLit((0 until nBuckets).map(b => b -> offsets(b)).toMap)
    val offsetCol = element_at(offsetMap, col("slice"))
    val w = Window.partitionBy(col("slice"))
      .orderBy(col("h").asc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("cum", sum(col("n_tokens")).over(w) + offsetCol)
      .filter(col("cum") <= budget)
      .select(col("doc_id"), col("n_tokens"), col("cum"))
  }

  def p5TokenBudget(s: SparkSession, dir: String): DataFrame =
    tokenBudgetFill(
      // native one-pass count (TokenCount == size(tokens), TextSpec-pinned):
      // tokenBudgetFill scans its input twice (slice totals + the window
      // pass), so not materializing the token array pays double — sf10
      // 3.43 → 1.76 s (1.0× vs the oracle, from 2.0×)
      Tables(s, dir, "documents").select(col("doc_id"),
        graft.text.TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens")),
      TokenBudget)

  /** P6 target mixture: exact per-language document counts (the
    * data-mixing primitive — hit a target LANGUAGE MIX exactly, not a
    * rate). fr's target exceeds its stratum at every SF, exercising the
    * take-what-exists clamp. */
  val MixtureTargets: Map[String, Int] =
    Map("en" -> 120, "de" -> 40, "zh" -> 40, "es" -> 40, "fr" -> 200)
  val MixtureSalts = 8

  /** P6 core, df-level: deterministic exact-k PER GROUP in md5-hash
    * order — p3's bottom-k generalized to one k per stratum. Scale
    * shape: a single window per group would funnel each group through
    * ONE task (the dominant language IS the corpus at 100 TB), so the
    * draw is two-phase — a salted window keeps k per (group, salt)
    * shard in parallel, then the final window ranks only the ≤ salts×k
    * survivors per group. Groups without a target are dropped (a
    * mixture spec IS the universe). Same conservative-prune argument as
    * the q12/S1 two-stage top-k: every global top-k row is top-k within
    * its shard. */
  def mixtureSample(d: DataFrame, groupCol: String, targets: Map[String, Int],
                    salts: Int = MixtureSalts): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val k = element_at(typedLit(targets), col(groupCol))
    val shardW = Window.partitionBy(col(groupCol), col("salt"))
      .orderBy(col("h").asc, col("doc_id").asc)
    val finalW = Window.partitionBy(col(groupCol))
      .orderBy(col("h").asc, col("doc_id").asc)
    d.select(col("doc_id"), col(groupCol),
        hashBucket(col("doc_id"), Int.MaxValue).as("h"))
      .filter(k.isNotNull)
      .withColumn("salt", pmod(col("h"), lit(salts)))
      .withColumn("shard_rank", row_number().over(shardW))
      .filter(col("shard_rank") <= k)
      .withColumn("rank", row_number().over(finalW))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col(groupCol), col("rank"))
  }

  def p6MixtureSample(s: SparkSession, dir: String): DataFrame =
    mixtureSample(Tables(s, dir, "documents").select(col("doc_id"), col("lang")),
      "lang", MixtureTargets)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p1_split_sample" -> (p1SplitSample _),
    "p2_stratified_sample" -> (p2StratifiedSample _),
    "p3_uniform_sample" -> (p3UniformSample _),
    "p4_weighted_sample" -> (p4WeightedSample _),
    "p5_token_budget" -> (p5TokenBudget _),
    "p6_mixture_sample" -> (p6MixtureSample _))

  private val hashSql = "('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT"

  private val mixtureCaseSql = MixtureTargets.toSeq.sortBy(_._1)
    .map { case (l, k) => s"WHEN '$l' THEN $k" }.mkString(" ")

  val oracles: Map[String, String] = Map(
    "p6_mixture_sample" ->
      s"""SELECT doc_id, lang, rank FROM (
         |  SELECT doc_id, lang,
         |    row_number() OVER (PARTITION BY lang
         |      ORDER BY $hashSql % 2147483647 ASC, doc_id ASC) AS rank
         |  FROM documents)
         |WHERE rank <= (CASE lang $mixtureCaseSql ELSE 0 END)""".stripMargin,
    "p1_split_sample" ->
      s"""SELECT CASE WHEN b < 8 THEN 'train' WHEN b < 9 THEN 'val'
         |  ELSE 'test' END AS split,
         |  lang, count(*) AS n_docs, min(doc_id) AS min_id, max(doc_id) AS max_id
         |FROM (SELECT doc_id, lang, $hashSql % 10 AS b FROM documents)
         |GROUP BY 1, 2""".stripMargin,
    "p2_stratified_sample" ->
      s"""SELECT lang, count(*) AS n_sampled,
         |  CAST(sum(doc_id) AS BIGINT) AS id_checksum
         |FROM documents
         |WHERE $hashSql % 100 <
         |  (CASE WHEN lang = 'en' THEN 10 WHEN lang = 'zh' THEN 50 ELSE 30 END)
         |GROUP BY lang""".stripMargin,
    "p3_uniform_sample" ->
      s"""SELECT doc_id, lang, h FROM (
         |  SELECT doc_id, lang, $hashSql % 2147483647 AS h FROM documents)
         |ORDER BY h ASC, doc_id ASC LIMIT $SampleK""".stripMargin,
    "p4_weighted_sample" ->
      s"""SELECT doc_id, lang, key FROM (
         |  SELECT doc_id, lang,
         |    round(-ln((($hashSql % 2147483647) + 1.0) / 2147483648.0)
         |      / len(string_split_regex(trim(lower(text)), '\\s+')), 9) AS key
         |  FROM documents)
         |ORDER BY key ASC, doc_id ASC LIMIT $WeightedK""".stripMargin,
    "p5_token_budget" ->
      // the oracle may cumsum globally — single node; graft's two-phase
      // slice/offset form computes the identical integer prefix sums
      s"""SELECT doc_id, n_tokens, cum FROM (
         |  SELECT doc_id, n_tokens,
         |    CAST(sum(n_tokens) OVER (ORDER BY h ASC, doc_id ASC
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
         |  FROM (SELECT doc_id,
         |          CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS BIGINT) AS n_tokens,
         |          $hashSql % 2147483647 AS h
         |        FROM documents))
         |WHERE cum <= $TokenBudget""".stripMargin)
}
