package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text-analysis primitives (SURVEY §2.5, T1–T4).
  *
  * Everything here composes built-in, codegen'd SQL functions — no UDFs —
  * so a 100 TB corpus pass is a single whole-stage-codegen'd scan with
  * map-side-only work until the final aggregate. Hashes are md5-based
  * (not xxhash) deliberately: md5 is bit-identical across engines, which
  * keeps every sketch reproducible in the DuckDB oracle and portable
  * across the cluster/driver boundary.
  */
object TextFunctions {

  /** Lower-cased whitespace tokens. Trim first: Spark's split keeps
    * trailing empty strings, so untrimmed text would add ghost tokens. */
  def tokens(text: Column): Column = split(trim(lower(text)), "\\s+")

  /** Whitespace-token COUNT without building the array — use instead of
    * `size(tokens(text))` wherever only the count is consumed (see
    * [[TokenCount]]). Identical value by TextSpec's split cross-check. */
  def tokenCount(text: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      TokenCount(org.apache.spark.sql.graftbridge.Bridge.expression(text)))

  /** BPE-ish lexer token count: letter runs, digit runs, single
    * punctuation marks — the standard pre-tokenizer shape. */
  def regexTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))

  /** COUNT of [[regexTokens]] matches without materializing them (see
    * [[LexerTokenCount]]); identical by TextSpec's cross-check. */
  def regexTokenCount(text: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      LexerTokenCount(org.apache.spark.sql.graftbridge.Bridge.expression(lower(text))))

  /** BPE token COUNT against an ordered merge table (rank-monotone, the
    * shape every learned BPE vocab has) — what a training pipeline
    * budgets with, computed in one codegen'd scan with no token array;
    * see [[BpeTokenCount]]. */
  def bpeTokenCount(text: Column, merges: Seq[(String, String)]): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      BpeTokenCount(org.apache.spark.sql.graftbridge.Bridge.expression(text), merges))

  /** COUNT of code points matching `charClass` (regex char class; the
    * restricted subset [[CharClassCount]] parses) — a native one-pass
    * scan replacing `length(x) - length(regexp_replace(x, cls, ''))`,
    * which materialized a stripped copy of every document. */
  def charClassCount(text: Column, charClass: String): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      CharClassCount(org.apache.spark.sql.graftbridge.Bridge.expression(text), charClass))

  /** Ratio of characters matching `charClass` — [[charClassCount]] over
    * `length`; was ~85% of c1's marginal cost at 20× sf0.1 as
    * regexp_replace (see CharClassCount's scaladoc). */
  def charRatio(text: Column, charClass: String): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise(charClassCount(text, charClass).cast("double") / length(text))

  /** Per-document term-frequency map (term → count) via the native
    * [[TermCounts]] expression — replaces the `explode → groupBy(doc,
    * term)` aggregate, whose Exchange carries the entire raw token
    * stream (see TermCounts's scaladoc). */
  def termCounts(toks: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      TermCounts(org.apache.spark.sql.graftbridge.Bridge.expression(toks)))

  /** Top-level integer `key` from a JSON string column —
    * `from_json(json, struct<key:int>).key` semantics (PERMISSIVE mode,
    * including partial results on conversion failures) without the
    * CodegenFallback Jackson wrapper; see [[JsonGetInt]]. */
  def jsonGetInt(json: Column, key: String): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      JsonGetInt(org.apache.spark.sql.graftbridge.Bridge.expression(json), key))

  /** How many tokens are in `words` (duplicates counted — a stopword used
    * twice is two hits). Native codegen expression: the HOF form
    * `size(filter(toks, isin(...)))` is interpreted per row and dominated
    * t2/t3 (see [[CountInSet]]). */
  def hitCount(toks: Column, words: Seq[String]): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      CountInSet(org.apache.spark.sql.graftbridge.Bridge.expression(toks), words))

  /** PII scrubbing: emails, URLs, and long digit runs (phone/account
    * numbers) replaced by typed placeholder tokens — the standard
    * pre-training redaction pass. Pure chained regexp_replace: codegen'd,
    * one pass per pattern, no UDF. Patterns are conservative (high
    * precision) — a recall-tuned deployment swaps in its own list. */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}" -> "<EMAIL>",
    "https?://[^\\s]+" -> "<URL>",
    "[0-9][0-9 ()+.-]{8,}[0-9]" -> "<NUMBER>")

  def piiScrub(text: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      PiiScrub(org.apache.spark.sql.graftbridge.Bridge.expression(text)))

  /** The regexp_replace chain [[PiiScrub]] replaces — kept as the
    * pinned reference the TextSpec cross-check compares against. */
  def piiScrubComposable(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (c, (pattern, token)) =>
      regexp_replace(c, pattern, token)
    }

  /** Word k-grams ("shingles") of the token array, space-joined, via
    * the native [[Shingles]] codegen expression (the composable HOF
    * form — `transform(sequence(...), i -> concat_ws(...))` — is
    * CodegenFallback: interpreted per row AND per element). */
  def shingles(toks: Column, k: Int): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      Shingles(org.apache.spark.sql.graftbridge.Bridge.expression(toks), k, distinct = false))

  /** Distinct shingle SET in one pass (first occurrence kept) — folds
    * the downstream DISTINCT into the same map-side expression. */
  def distinctShingles(toks: Column, k: Int): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      Shingles(org.apache.spark.sql.graftbridge.Bridge.expression(toks), k, distinct = true))

  /** Fixed-width non-overlapping token chunks (partial tail kept) via
    * the native [[TokenChunks]] codegen expression — the passage grain
    * for boilerplate detection. */
  def chunks(toks: Column, w: Int): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      TokenChunks(org.apache.spark.sql.graftbridge.Bridge.expression(toks), w))

  /** Portable per-shingle hash for seed `i`: md5 of the shingle with a
    * seed suffix. Identical in any engine with md5 — the basis for
    * MinHash signatures that a SQL oracle can reproduce exactly. */
  def seededHash(s: Column, seed: Int): Column = md5(concat(s, lit("#" + seed)))

  /** Bottom-k document fingerprint: the k lexicographically smallest
    * md5(shingle) values. A bounded-size sketch (winnowing-style): two
    * documents share fingerprint entries iff they share rare shingles. */
  def fingerprint(shingleCol: Column, k: Int): Column =
    slice(array_sort(transform(array_distinct(shingleCol), s => md5(s))), 1, k)
}
