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

  /** doc_id + distinct word-kGram shingle set (docs with no shingle are
    * dropped — they cannot collide with anything). */
  def shingleSets(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    df.select(col(idCol),
        array_distinct(TextFunctions.shingles(TextFunctions.tokens(col(textCol)), k)).as("shingles"))
      .filter(size(col("shingles")) > 0)

  /** MinHash signature: for each seed, the minimum seeded md5 over the
    * shingle set. One map-only expression per seed. */
  def minhashSignature(shingleCol: Column, numHashes: Int): Column =
    array((0 until numHashes).map { seed =>
      array_min(transform(shingleCol, s => TextFunctions.seededHash(s, seed)))
    }: _*)

  /** LSH bands: signature split into `numBands` groups of `rowsPerBand`,
    * each hashed to one bucket value. */
  def bandValues(sigCol: Column, numBands: Int, rowsPerBand: Int): Column =
    array((0 until numBands).map { b =>
      md5(concat_ws("|", slice(sigCol, b * rowsPerBand + 1, rowsPerBand)))
    }: _*)

  /** (doc_id, band_idx, band_val) — one row per doc per band. */
  def bands(df: DataFrame, idCol: String, numHashes: Int, numBands: Int): DataFrame = {
    val rowsPerBand = numHashes / numBands
    df.select(col(idCol),
        posexplode(bandValues(minhashSignature(col("shingles"), numHashes), numBands, rowsPerBand)))
      .withColumnsRenamed(Map("pos" -> "band_idx", "col" -> "band_val"))
  }

  /** Distinct candidate pairs (a < b) sharing at least one band bucket.
    * Buckets larger than `maxBucket` are dropped (skew guard). */
  def candidatePairs(bandsDf: DataFrame, idCol: String, maxBucket: Int): DataFrame = {
    val sized = bandsDf.groupBy(col("band_idx"), col("band_val"))
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n").between(2, maxBucket))
      .select(col("band_idx"), col("band_val"))
    val x = bandsDf.join(sized, Seq("band_idx", "band_val"))
    val y = x.select(col("band_idx"), col("band_val"), col(idCol).as("b_id"))
    x.join(y,
        x("band_idx") === y("band_idx") && x("band_val") === y("band_val")
          && col(idCol) < col("b_id"))
      .select(col(idCol).as("a"), col("b_id").as("b"))
      .distinct()
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
    df.select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .select(col(idCol), tokenHash.as("h"))
      .groupBy(col(idCol))
      .agg(votes.head, votes.tail: _*)
      .select(col(idCol), sigBits.reduce(_ + _).as("simhash"))
  }

  /** SimHash near-dup pairs: band the signature into `numBands` bit
    * slices (a pair within hamming distance numBands-1 shares >= 1 exact
    * band), bucket-join, then verify true hamming distance <= maxHamming.
    * Same no-all-pairs shape as MinHash LSH. */
  def simhashPairs(sig: DataFrame, idCol: String, bits: Int, numBands: Int,
                   maxHamming: Int, maxBucket: Int): DataFrame = {
    val bandBits = bits / numBands
    val mask = (1L << bandBits) - 1
    val bandCols = (0 until numBands).map { b =>
      struct(lit(b).as("band_idx"),
        shiftright(col("simhash"), b * bandBits).bitwiseAND(lit(mask)).as("band_val"))
    }
    val banded = sig.select(col(idCol), col("simhash"), explode(array(bandCols: _*)).as("bv"))
      .select(col(idCol), col("simhash"), col("bv.band_idx").as("band_idx"),
        col("bv.band_val").as("band_val"))
    val sized = banded.groupBy(col("band_idx"), col("band_val"))
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n").between(2, maxBucket))
      .select(col("band_idx"), col("band_val"))
    val x = banded.join(sized, Seq("band_idx", "band_val"))
    val y = x.select(col("band_idx"), col("band_val"),
      col(idCol).as("b_id"), col("simhash").as("b_sig"))
    x.join(y, x("band_idx") === y("band_idx") && x("band_val") === y("band_val")
        && col(idCol) < col("b_id"))
      .select(col(idCol).as("a"), col("b_id").as("b"),
        bit_count(col("simhash").bitwiseXOR(col("b_sig"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
