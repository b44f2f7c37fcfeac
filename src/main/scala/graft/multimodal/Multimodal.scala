package graft.multimodal

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed media record: opaque binary payload + structured metadata.
  * The schema contract for multimodal columns (SURVEY §2.6, X1). */
final case class MediaRecord(
    doc_id: Long,
    format: String,
    payload: Array[Byte],
    width: Int,
    height: Int,
    n_bytes: Long)

/** Per-record extracted features (the decode stub's output shape). */
final case class MediaFeatures(
    doc_id: Long,
    format: String,
    n_bytes: Long,
    features: Array[Double])

/** Multimodal column plumbing (SURVEY §2.6, X1).
  *
  * Media (image/audio/video) is carried as an opaque `binary` column
  * beside typed metadata — the layout a 100 TB multimodal corpus uses
  * (payload bytes stay columnar, metadata prunes/pushes down normally,
  * queries that don't touch `payload` never read those pages).
  *
  * The decode step is a SEAM ([[MediaDecoder]]): the gate path uses the
  * deterministic byte-histogram stub (reproducible in the SQL oracle);
  * [[ImageIoDecoder]] plugs REAL JDK `javax.imageio` pixel decode into
  * the same pipeline for PNG/JPEG (spec-verified on synthetic PNGs —
  * pixel decode is not SQL-expressible, so it has no gate row). Video
  * stays a stub — the JDK ships no video codec. Everything around the
  * seam (schema, encoders, iterator-based partition processing, batch
  * shape) is the real production plumbing either way.
  *
  * Feature extraction uses Dataset.mapPartitions over an iterator — the
  * Scala analogue of mapInPandas batches: per-partition setup (a real
  * decoder would init once per partition here), streaming through rows
  * without materializing a partition in memory.
  */
object Multimodal {

  /** Deterministic fake media over documents: payload = UTF-8 bytes,
    * format from the source id, dimensions md5-derived. Every expression
    * is engine-portable (the metadata side is oracle-checked). */
  def buildMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      element_at(array(lit("png"), lit("jpeg"), lit("wav")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("format"),
      encode(col("text"), "UTF-8").as("payload"),
      (lit(16) + pmod(conv(substring(md5(col("text")), 1, 4), 16, 10).cast("long"), lit(49)))
        .cast("int").as("width"),
      (lit(16) + pmod(conv(substring(md5(col("text")), 5, 4), 16, 10).cast("long"), lit(33)))
        .cast("int").as("height"),
      octet_length(col("text")).cast("long").as("n_bytes"))

  /** The decode seam: bytes → feature vector. Deterministic stub —
    * a 16-bin byte histogram normalized to sum 1. A real decoder
    * (image resize, audio frame sample, …) replaces ONLY this function. */
  def decodeStub(payload: Array[Byte], bins: Int = 16): Array[Double] = {
    val counts = new Array[Double](bins)
    payload.foreach { b => counts(((b & 0xff) * bins) / 256) += 1.0 }
    val n = math.max(1, payload.length).toDouble
    counts.map(_ / n)
  }

  /** Iterator-based feature extraction: one pass per partition, constant
    * memory, decoder init amortized per partition (not per row). The
    * decoder is the [[MediaDecoder]] seam — [[ByteHistogramDecoder]]
    * (oracle-reproducible stub) by default, [[ImageIoDecoder]] for real
    * PNG/JPEG pixel decode. */
  def extractFeatures(media: Dataset[MediaRecord], bins: Int = 16,
                      decoder: MediaDecoder = ByteHistogramDecoder): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition decoder setup would go here
      it.map(r => MediaFeatures(r.doc_id, r.format, r.n_bytes,
        decoder.features(r.format, r.payload, bins)))
    }
  }

  /** Batched variant — the Scala shape of mapInPandas: rows stream
    * through in bounded groups so a vectorizing decoder amortizes per
    * BATCH, while `grouped` on the iterator keeps memory at
    * O(batchSize), never the partition. */
  def extractFeaturesBatched(media: Dataset[MediaRecord], batchSize: Int = 64,
                             bins: Int = 16,
                             decoder: MediaDecoder = ByteHistogramDecoder): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // a real vectorized decoder would process `batch` in one call
        batch.map(r => MediaFeatures(r.doc_id, r.format, r.n_bytes,
          decoder.features(r.format, r.payload, bins)))
      }
    }
  }

  /** Resize stub (image-pipeline seam): deterministic re-bucketing of
    * the payload to a target cell count — stands in for a bilinear
    * resize; output length is exactly targetCells regardless of input. */
  def resizeStub(payload: Array[Byte], targetCells: Int): Array[Double] = {
    if (payload.isEmpty) return new Array[Double](targetCells)
    val out = new Array[Double](targetCells)
    val counts = new Array[Int](targetCells)
    payload.zipWithIndex.foreach { case (b, i) =>
      val cell = (i.toLong * targetCells / payload.length).toInt
      out(cell) += (b & 0xff); counts(cell) += 1
    }
    out.zip(counts).map { case (s, c) => if (c == 0) 0.0 else s / c / 255.0 }
  }

  /** Frame-sample stub (video/audio seam): every `stride`-th
    * fixed-length window of the payload, capped at maxFrames —
    * deterministic stand-in for keyframe extraction. */
  def frameSampleStub(payload: Array[Byte], frameLen: Int, stride: Int,
                      maxFrames: Int): Seq[Array[Byte]] =
    (0 until payload.length by stride)
      .take(maxFrames)
      .map(off => payload.slice(off, math.min(off + frameLen, payload.length)))

  /** dHash grid shape: 8 rows × 9 cols of cells → 8 comparisons per row
    * × 8 rows = 64 hash bits. */
  val DHashRows = 8
  val DHashCols = 9

  /** (sum, count) byte grid over a payload — [[resizeStub]]'s positional
    * bucketing at dHash shape: position i of n lands in cell i·72/n.
    * Integer sums, no floats, so both engines agree bit-for-bit. */
  def byteGrid(payload: Array[Byte]): (Array[Long], Array[Long]) = {
    val cells = DHashRows * DHashCols
    val sums = new Array[Long](cells)
    val counts = new Array[Long](cells)
    val n = payload.length
    var i = 0
    while (i < n) {
      val k = (i.toLong * cells / n).toInt
      sums(k) += payload(i) & 0xff
      counts(k) += 1
      i += 1
    }
    (sums, counts)
  }

  /** 64-bit difference hash from a (sum, count) grid: bit r·8+c is set
    * iff cell(r,c)'s mean exceeds cell(r,c+1)'s — compared by integer
    * cross-multiplication (s₁·c₂ > s₂·c₁), so no float ever decides a
    * bit. Empty cells (count 0 — payload shorter than the grid) compare
    * as mean 0. Shared by the payload path ([[dHash]]) and the real
    * pixel path ([[ImageIoDecoder]]'s luminance grid). */
  def dHashBits(sums: Array[Long], counts: Array[Long]): Long = {
    var h = 0L
    var r = 0
    while (r < DHashRows) {
      var c = 0
      while (c < DHashCols - 1) {
        val k1 = r * DHashCols + c
        val k2 = k1 + 1
        if (sums(k1) * counts(k2) > sums(k2) * counts(k1))
          h |= 1L << (r * (DHashCols - 1) + c)
        c += 1
      }
      r += 1
    }
    h
  }

  /** Perceptual difference hash of a media payload (the stub-decode
    * analogue; a real image pipeline feeds [[dHashBits]] the decoded
    * luminance grid instead — see ImageDecode.luminanceGrid). */
  def dHash(payload: Array[Byte]): Long = {
    val (s, c) = byteGrid(payload)
    dHashBits(s, c)
  }

  /** X5 pair-search parameters: 4 bands of 16 bits (any pair within
    * hamming 3 is guaranteed a shared band; beyond that recall decays,
    * the same contract as d3), bucket cap shared with the dedup pack.
    * The gate corpus is text-derived with no planted image near-dups
    * (min candidate hamming measured 14 at sf0.01), so like d5 the gate
    * threshold (16) is chosen to surface real positives and prove PAIR
    * semantics, not an empty intersection; planted-duplicate semantics
    * at a production threshold (≤6) are covered in MultimodalSpec on
    * the REAL ImageIO pixel path. */
  val DHashBands = 4
  val DHashMaxHamming = 16
  /** Minimum payload bytes for a meaningful dHash: one full grid (every
    * cell populated). Shorter payloads are skipped by x5 on both the
    * kernel and oracle sides (review r11: under ~37 bytes no adjacent
    * cell pair is populated and the hash degenerates to 0). */
  val DHashMinBytes = 72

  /** X5 gate query: image near-duplicate detection — dHash per record
    * (map-side, decoder-seam shape) then the EXACT banding machinery d3
    * uses ([[graft.dedup.Dedup.simhashPairs]]): band buckets via one
    * grouped aggregate (no self-join, no all-pairs), hamming verify on
    * in-bucket pairs only. The multimodal pack's features now feed the
    * dedup pack — X joins D. */
  def x5ImageNearDup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = buildMedia(Tables(s, dir, "documents")).as[MediaRecord]
    val sig = media
      // payloads shorter than the grid carry no stable perceptual
      // signal: below DHashMinBytes the 8×9 grid has empty cells (and
      // under ~37 bytes NO adjacent pair is populated, hashing every
      // such payload to 0 — all mutually "identical"). Skip them on
      // both sides; the oracle applies the same length floor.
      .filter(m => m.payload.length >= DHashMinBytes)
      .mapPartitions(it => it.map(m => (m.doc_id, dHash(m.payload))))
      .toDF("doc_id", "simhash")
    graft.dedup.Dedup.simhashPairs(sig, "doc_id", bits = 64,
      numBands = DHashBands, maxHamming = DHashMaxHamming,
      maxBucket = graft.dedup.DedupQueries.MaxBucket)
  }

  /** X1 gate query: metadata plumbing end-to-end (oracle-checked — the
    * md5-derived dims and byte lengths reproduce in DuckDB exactly). */
  def x1MultimodalMeta(s: SparkSession, dir: String): DataFrame =
    buildMedia(Tables(s, dir, "documents"))
      .select(col("doc_id"), col("format"), col("width"), col("height"), col("n_bytes"))

  /** X2 gate query: the decode seam end-to-end — buildMedia →
    * Dataset[MediaRecord] → extractFeaturesBatched (the batched
    * mapPartitions path a real vectorized decoder plugs into) → features.
    *
    * Gate serialization: the normalized histogram is de-normalized back
    * to per-bin integer COUNTS (round(f × payload length) recovers them
    * exactly — the division is the only float step) and comma-joined.
    * Integer strings are bit-portable across engines, where double
    * formatting is not; counts ↔ features are bijective given n_bytes,
    * so the oracle checks the full feature vector. */
  def x2MultimodalFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = buildMedia(Tables(s, dir, "documents")).as[MediaRecord]
    extractFeaturesBatched(media)
      .map(f => (f.doc_id, f.format, f.n_bytes,
        f.features.map(d => Math.round(d * math.max(1L, f.n_bytes)).toString).mkString(",")))
      .toDF("doc_id", "format", "n_bytes", "hist")
  }

  /** X3 frame-sampling parameters: every 256th byte offset starts a
    * 64-byte frame, at most 4 frames per record — a keyframe-extraction
    * stand-in with the real fan-out shape (record → frame rows). */
  val FrameLen = 64
  val FrameStride = 256
  val MaxFrames = 4

  /** X3 gate query: the frame-sample seam end-to-end — each media
    * record fans out to its sampled frames (typed flatMap — a real
    * keyframe extractor replaces only frameSampleStub), then per-frame
    * metadata + content hash. md5 of the frame BYTES is oracle-checked:
    * the corpus is ASCII (verified at every SF), so byte slices equal
    * character slices and DuckDB reproduces the hash from substr. */
  def x3FrameSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = buildMedia(Tables(s, dir, "documents")).as[MediaRecord]
    media
      .flatMap { m =>
        frameSampleStub(m.payload, FrameLen, FrameStride, MaxFrames).zipWithIndex.map {
          case (frame, idx) => (m.doc_id, idx, idx * FrameStride, frame.length, frame)
        }
      }
      .toDF("doc_id", "frame_idx", "off", "n_frame_bytes", "frame")
      .select(col("doc_id"), col("frame_idx"), col("off"), col("n_frame_bytes"),
        md5(col("frame")).as("frame_md5"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x1_multimodal_meta" -> (x1MultimodalMeta _),
    "x2_multimodal_features" -> (x2MultimodalFeatures _),
    "x3_frame_sample" -> (x3FrameSample _),
    "x5_image_near_dup" -> (x5ImageNearDup _))

  /** X5 oracle: the dHash + banding pipeline in integer SQL — per-cell
    * (sum, count) via FILTERed aggregates over byte positions (corpus
    * is ASCII, pinned like x2/x3), cross-multiplied mean comparisons
    * into the 64-bit signature, then d3's band/bucket/hamming chain.
    * Bit 63's power is written as the two's-complement min literal; the
    * term order keeps every partial sum in BIGINT range. */
  private def x5Sql: String = {
    val cells = DHashRows * DHashCols
    // Bits come from an adjacent-cell SELF-JOIN on (doc_id, k+1), not a
    // 2×cells-column FILTERed pivot: the pivot form ran each of its 144
    // FILTER clauses over every character row (~500 s and a memory spike
    // at sf1); this form aggregates once per (doc, cell) then joins the
    // 72-cell relation to itself (~0.6 s at sf0.01, linear in corpus
    // size). A missing neighbor cell (doc shorter than the grid) drops
    // the pair from the inner join → bit 0, exactly the old
    // coalesce(0)-pivot's 0*c > s*0 = false. The disjoint bit weights
    // sum in HUGEINT and fold back to the signed BIGINT bit pattern
    // (the j=63 weight is the sign bit).
    val bandSelects = (0 until DHashBands).map { b =>
      s"SELECT doc_id, s, $b AS band_idx, (s >> ${b * 16}) & 65535 AS band_val FROM sig"
    }.mkString("\n  UNION ALL ")
    s"""WITH eligible AS (
       |  SELECT doc_id, text FROM documents
       |  WHERE octet_length(encode(text)) >= $DHashMinBytes),
       |ch AS (
       |  SELECT doc_id, (i * $cells) // length(text) AS k,
       |    unicode(substr(text, (i + 1)::INT, 1)) AS v
       |  FROM eligible, LATERAL unnest(range(0, length(text))) AS u(i)),
       |cell AS (SELECT doc_id, k, sum(v) AS sv, count(*) AS cv FROM ch GROUP BY doc_id, k),
       |bit AS (SELECT a.doc_id,
       |    CASE WHEN a.sv * b.cv > b.sv * a.cv
       |      THEN CAST(1 AS HUGEINT) << ((a.k // $DHashCols) * ${DHashCols - 1} + (a.k % $DHashCols))
       |      ELSE CAST(0 AS HUGEINT) END AS bitval
       |  FROM cell a JOIN cell b ON a.doc_id = b.doc_id AND b.k = a.k + 1
       |  WHERE a.k % $DHashCols < ${DHashCols - 1}),
       |sig AS (SELECT doc_id,
       |    CAST(CASE WHEN t >= CAST(9223372036854775808 AS HUGEINT)
       |      THEN t - CAST(18446744073709551616 AS HUGEINT) ELSE t END AS BIGINT) AS s
       |  FROM (SELECT doc_id, coalesce(sum(bitval), 0) AS t FROM bit GROUP BY doc_id)),
       |bands AS (
       |  $bandSelects),
       |sized AS (SELECT band_idx, band_val FROM bands GROUP BY 1, 2
       |  HAVING count(*) BETWEEN 2 AND ${graft.dedup.DedupQueries.MaxBucket})
       |SELECT a, b, hamming FROM (
       |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
       |    bit_count(xor(x.s, y.s)) AS hamming
       |  FROM bands x
       |  JOIN sized z ON x.band_idx = z.band_idx AND x.band_val = z.band_val
       |  JOIN bands y ON x.band_idx = y.band_idx AND x.band_val = y.band_val
       |  WHERE x.doc_id < y.doc_id)
       |WHERE hamming <= $DHashMaxHamming""".stripMargin
  }

  /** DuckDB reproduction of the 16-bin byte histogram: document text is
    * ASCII in this corpus (verified at every SF), so unicode(char) ==
    * UTF-8 byte and bin = code // 16 matches decodeStub's (b*16)/256. */
  private val histOracle: String = {
    val filters = (0 until 16)
      .map(k => s"coalesce(count(*) FILTER (WHERE bin = $k), 0) AS c$k").mkString(", ")
    val cs = (0 until 16).map(k => s"coalesce(h.c$k, 0)").mkString(", ")
    s"""WITH pos AS (SELECT doc_id, text,
       |  unnest(range(1, length(text)+1)) AS i FROM documents),
       |ch AS (SELECT doc_id, unicode(substr(text, i::INT, 1)) // 16 AS bin FROM pos),
       |h AS (SELECT doc_id, $filters FROM ch GROUP BY doc_id)
       |SELECT d.doc_id,
       |  ['png', 'jpeg', 'wav'][(d.doc_id % 3 + 1)::INT] AS format,
       |  octet_length(encode(d.text)) AS n_bytes,
       |  concat_ws(',', $cs) AS hist
       |FROM documents d LEFT JOIN h USING (doc_id)""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "x1_multimodal_meta" ->
      """SELECT doc_id,
        |  ['png', 'jpeg', 'wav'][(doc_id % 3 + 1)::INT] AS format,
        |  16 + ('0x' || substr(md5(text), 1, 4))::BIGINT % 49 AS width,
        |  16 + ('0x' || substr(md5(text), 5, 4))::BIGINT % 33 AS height,
        |  octet_length(encode(text)) AS n_bytes
        |FROM documents""".stripMargin,
    "x2_multimodal_features" -> histOracle,
    "x5_image_near_dup" -> x5Sql,
    "x3_frame_sample" ->
      s"""WITH f AS (SELECT doc_id, text,
         |    unnest(range(0, octet_length(encode(text)), $FrameStride)[1:$MaxFrames]) AS off
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(off // $FrameStride AS INT) AS frame_idx,
         |  CAST(off AS INT) AS off,
         |  CAST(least($FrameLen, length(text) - off) AS INT) AS n_frame_bytes,
         |  md5(substr(text, (off + 1)::INT, $FrameLen)) AS frame_md5
         |FROM f""".stripMargin)
}
