package graft.multimodal

import java.io.ByteArrayInputStream

/** The decode seam as a first-class type: bytes → fixed-length feature
  * vector. [[Multimodal.extractFeatures]] threads one of these through
  * its iterator mapPartitions, so swapping decoders never touches the
  * pipeline (schema, partitioning, batch shape are decoder-agnostic).
  * Implementations must be deterministic — the gate hashes results.
  */
trait MediaDecoder extends Serializable {
  /** Feature vector of length `bins` for one record's payload. */
  def features(format: String, payload: Array[Byte], bins: Int): Array[Double]
}

/** The no-codec default: [[Multimodal.decodeStub]]'s byte histogram.
  * Keeps x2's exact DuckDB oracle (byte arithmetic reproduces in SQL —
  * real pixel decode does not). */
object ByteHistogramDecoder extends MediaDecoder {
  override def features(format: String, payload: Array[Byte], bins: Int): Array[Double] =
    Multimodal.decodeStub(payload, bins)
}

/** REAL image decode via `javax.imageio` — JDK-built-in, zero new
  * dependencies, headless-safe. PNG/JPEG payloads decode to pixels and
  * featurize as a normalized luminance histogram; non-image formats and
  * undecodable bytes fall back to the byte-histogram stub so a
  * mixed-modality corpus flows without a partition-killing throw (the
  * per-record error containment a 100 TB ingest needs — one corrupt
  * image must not fail a 128 MB task).
  *
  * PNG is the spec'd format: its decode is lossless and bit-identical
  * across JDKs. JPEG decodes too, but IDCT rounding may vary by
  * platform, so exact-hash gates should stay on PNG. Video remains a
  * stub ([[Multimodal.frameSampleStub]]) — no codec in the JDK.
  */
object ImageIoDecoder extends MediaDecoder {

  private val ImageFormats = Set("png", "jpeg", "jpg", "gif", "bmp")

  override def features(format: String, payload: Array[Byte], bins: Int): Array[Double] =
    // Locale.ROOT: default-locale lowercasing turns "GIF" into dotless-ı
    // "gıf" on a Turkish JVM and silently falls back to the stub
    (if (ImageFormats(format.toLowerCase(java.util.Locale.ROOT))) decode(payload)
     else None) match {
      case Some(img) => luminanceHistogram(img, bins)
      case None      => Multimodal.decodeStub(payload, bins)
    }

  /** None for truncated/corrupt/non-image bytes instead of throwing. */
  def decode(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new ByteArrayInputStream(payload)))
    catch { case _: java.io.IOException | _: RuntimeException => None }

  /** (width, height) from the decoded pixels. */
  def dimensions(payload: Array[Byte]): Option[(Int, Int)] =
    decode(payload).map(img => (img.getWidth, img.getHeight))

  /** Normalized luminance histogram over all pixels. Integer BT.601 luma
    * (scaled by 1000) keeps binning exact — no float comparisons decide
    * a bin, so the result is deterministic everywhere. */
  def luminanceHistogram(img: java.awt.image.BufferedImage, bins: Int): Array[Double] = {
    val (w, h) = (img.getWidth, img.getHeight)
    val counts = new Array[Double](bins)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
          (rgb & 0xff) * 114) / 1000
        counts((lum * bins) / 256) += 1.0
        x += 1
      }
      y += 1
    }
    val n = math.max(1, w * h).toDouble
    counts.map(_ / n)
  }

  /** (sum, count) luminance grid over the decoded pixels — pixel (x, y)
    * lands in cell (y·rows/h, x·cols/w); integer BT.601 luma like
    * [[luminanceHistogram]]. Feeds [[Multimodal.dHashBits]] for the
    * REAL-pixel perceptual hash (X5's production path; the gate query
    * uses the payload-byte grid for oracle reproducibility). */
  def luminanceGrid(img: java.awt.image.BufferedImage,
                    rows: Int = Multimodal.DHashRows,
                    cols: Int = Multimodal.DHashCols): (Array[Long], Array[Long]) = {
    val (w, h) = (img.getWidth, img.getHeight)
    val sums = new Array[Long](rows * cols)
    val counts = new Array[Long](rows * cols)
    var y = 0
    while (y < h) {
      val r = ((y.toLong * rows) / h).toInt
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
          (rgb & 0xff) * 114) / 1000
        val k = r * cols + ((x.toLong * cols) / w).toInt
        sums(k) += lum
        counts(k) += 1
        x += 1
      }
      y += 1
    }
    (sums, counts)
  }

  /** Perceptual dHash of a decoded image — [[luminanceGrid]] through
    * [[Multimodal.dHashBits]]; None for undecodable bytes. */
  def dHash(payload: Array[Byte]): Option[Long] =
    decode(payload).map { img =>
      val (s, c) = luminanceGrid(img)
      Multimodal.dHashBits(s, c)
    }
}
