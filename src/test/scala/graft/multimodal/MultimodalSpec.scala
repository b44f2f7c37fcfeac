package graft.multimodal

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal plumbing semantics (SURVEY §2.6 X1): binary payload +
  * typed metadata schema, deterministic decode seam, iterator-based
  * batch-shaped feature extraction. */
class MultimodalSpec extends SparkTestBase {

  import spark.implicits._

  private lazy val media = Multimodal.buildMedia(graft.Tables(spark, sfDir, "documents"))

  test("X1: media schema is binary payload + typed metadata") {
    val schema = media.schema
    assert(schema("payload").dataType == BinaryType)
    assert(schema("format").dataType == StringType)
    assert(schema("width").dataType == IntegerType)
    assert(schema("n_bytes").dataType == LongType)
    // dimensions land in their documented ranges
    val bad = media.filter(col("width") < 16 || col("width") > 64
      || col("height") < 16 || col("height") > 48).count()
    assert(bad == 0)
    // payload matches its recorded length
    assert(media.filter(octet_length(col("payload")) =!= col("n_bytes")).count() == 0)
  }

  test("X1: decode stub is deterministic and normalized") {
    val bytes = "some test payload".getBytes("UTF-8")
    val f1 = Multimodal.decodeStub(bytes)
    val f2 = Multimodal.decodeStub(bytes)
    assert(f1.toSeq == f2.toSeq)
    assert(f1.length == 16)
    assert(math.abs(f1.sum - 1.0) < 1e-9)
    assert(Multimodal.decodeStub(Array.emptyByteArray).sum == 0.0)
  }

  test("X1: batched extraction equals per-row extraction; batches bound memory") {
    val ds = media.as[MediaRecord]
    val perRow = Multimodal.extractFeatures(ds)
      .collect().map(f => f.doc_id -> f.features.toSeq).toMap
    val batched = Multimodal.extractFeaturesBatched(ds, batchSize = 7)
      .collect().map(f => f.doc_id -> f.features.toSeq).toMap
    assert(perRow == batched)
  }

  test("X1: resize and frame-sample stubs are deterministic and shape-correct") {
    val bytes = (0 until 1000).map(i => (i % 251).toByte).toArray
    val r1 = Multimodal.resizeStub(bytes, 32)
    assert(r1.length == 32)
    assert(r1.toSeq == Multimodal.resizeStub(bytes, 32).toSeq)
    assert(r1.forall(v => v >= 0.0 && v <= 1.0))
    assert(Multimodal.resizeStub(Array.emptyByteArray, 8).toSeq == Seq.fill(8)(0.0))
    val frames = Multimodal.frameSampleStub(bytes, frameLen = 100, stride = 250, maxFrames = 3)
    assert(frames.size == 3)
    assert(frames.forall(_.length == 100))
    assert(frames.head.toSeq == bytes.slice(0, 100).toSeq)
  }

  test("X1: feature extraction preserves rows, ids, and batch shape") {
    val ds = media.as[MediaRecord]
    val feats = Multimodal.extractFeatures(ds)
    val n = media.count()
    assert(feats.count() == n)
    val row = feats.head()
    assert(row.features.length == 16)
    // repeatable end-to-end
    val sums1 = feats.select(col("doc_id"), aggregate(col("features"), lit(0.0),
      (a, x) => a + x).as("s")).as[(Long, Double)].collect().toMap
    val sums2 = Multimodal.extractFeatures(ds).select(col("doc_id"),
      aggregate(col("features"), lit(0.0), (a, x) => a + x).as("s"))
      .as[(Long, Double)].collect().toMap
    assert(sums1 == sums2)
    // non-empty payloads -> histogram sums to ~1
    assert(sums1.values.forall(s => math.abs(s - 1.0) < 1e-9))
  }

  /** Deterministic synthetic PNG: pixel (x,y) = rgb(x,y). */
  private def pngBytes(w: Int, h: Int)(rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("X4: ImageIoDecoder extracts real pixel features from real PNG bytes") {
    // left half black (lum 0 -> bin 0), right half white (lum 255 -> bin 15)
    val halves = pngBytes(8, 4)((x, _) => if (x < 4) 0x000000 else 0xffffff)
    assert(ImageIoDecoder.dimensions(halves).contains((8, 4)))
    val f = ImageIoDecoder.features("png", halves, 16)
    assert(f(0) == 0.5 && f(15) == 0.5 && f.sum == 1.0)
    // pure-gray ramp: gray level g has BT.601 luma exactly g -> bin g/16
    val ramp = pngBytes(256, 1)((x, _) => (x << 16) | (x << 8) | x)
    val rf = ImageIoDecoder.features("png", ramp, 16)
    assert(rf.toSeq == Seq.fill(16)(1.0 / 16.0))
  }

  test("X4: decode seam swaps into the pipeline without touching the plumbing") {
    val png = pngBytes(4, 4)((_, _) => 0xffffff) // all white -> bin 15 only
    val recs = Seq(
      MediaRecord(1L, "png", png, 4, 4, png.length.toLong),
      MediaRecord(2L, "wav", Array[Byte](1, 2, 3), 0, 0, 3L), // non-image -> stub
      MediaRecord(3L, "png", Array[Byte](9, 9), 0, 0, 2L))    // corrupt -> stub fallback
    val ds = spark.createDataset(recs)
    val byId = Multimodal.extractFeatures(ds, decoder = ImageIoDecoder)
      .collect().map(r => r.doc_id -> r.features).toMap
    assert(byId(1L)(15) == 1.0 && byId(1L).sum == 1.0)
    assert(byId(2L).toSeq == Multimodal.decodeStub(Array[Byte](1, 2, 3)).toSeq)
    assert(byId(3L).toSeq == Multimodal.decodeStub(Array[Byte](9, 9)).toSeq)
    // batched path agrees with per-row path under the real decoder
    val batched = Multimodal.extractFeaturesBatched(ds, batchSize = 2, decoder = ImageIoDecoder)
      .collect().map(r => r.doc_id -> r.features.toSeq).toMap
    assert(batched == byId.map { case (k, v) => k -> v.toSeq })
  }

  test("X4 r15: a corrupt-heavy batch flows through the real decoder — every record lands, none kills the task") {
    // 50% of the batch is truncated mid-stream (decodable header, dead
    // pixel data — the codec's real error path, not a length shortcut);
    // DecodeBench generates the same corpus shape for the throughput
    // receipt. Contract: output count == input count, corrupt records
    // carry the byte-histogram fallback, intact ones carry real
    // luminance features.
    val recs = (0L until 40L).map { id =>
      val png = graft.multimodal.DecodeBench.syntheticPng(id, 32)
      val payload = if (id % 2 == 0) png.take(png.length / 2) else png
      MediaRecord(id, "png", payload, 32, 32, payload.length.toLong)
    }
    val out = Multimodal.extractFeaturesBatched(
      spark.createDataset(recs), batchSize = 8, decoder = ImageIoDecoder).collect()
    assert(out.length == 40, "every record must land — no task death on corrupt bytes")
    val byId = out.map(r => r.doc_id -> r.features).toMap
    for (r <- recs) {
      val f = byId(r.doc_id)
      assert(math.abs(f.sum - 1.0) < 1e-9)
      if (r.doc_id % 2 == 0) // corrupt -> stub histogram of the truncated bytes
        assert(f.toSeq == Multimodal.decodeStub(r.payload).toSeq)
      else                   // intact -> REAL pixel features, not the stub
        assert(f.toSeq != Multimodal.decodeStub(r.payload).toSeq)
    }
  }

  test("X4: PNG round-trip is lossless - decoded pixels equal what was encoded") {
    val img = ImageIoDecoder.decode(pngBytes(5, 3)((x, y) => (x * 40 << 16) | (y * 80 << 8) | 7)).get
    for (y <- 0 until 3; x <- 0 until 5)
      assert((img.getRGB(x, y) & 0xffffff) == ((x * 40 << 16) | (y * 80 << 8) | 7))
  }

  private def gray(v: Int): Int = { val g = v & 0xff; (g << 16) | (g << 8) | g }

  test("X5: real-pixel dHash — near-identical PNGs collide, inverted PNG is far") {
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val base = pngBytes(64, 48)((x, y) => gray(x * 7 + y * 13))
    // same image with a small corner patch changed — perceptually near-identical
    val near = pngBytes(64, 48)((x, y) =>
      if (x < 3 && y < 3) gray(255) else gray(x * 7 + y * 13))
    val inverted = pngBytes(64, 48)((x, y) => gray(255 - (x * 7 + y * 13) % 256))
    val hb = ImageIoDecoder.dHash(base).get
    val hn = ImageIoDecoder.dHash(near).get
    val hi = ImageIoDecoder.dHash(inverted).get
    assert(ImageIoDecoder.dHash(base.clone()).get == hb) // deterministic
    assert(ham(hb, hn) <= 6, s"near-identical pair at hamming ${ham(hb, hn)}")
    assert(ham(hb, hi) >= 32, s"inverted image too close: ${ham(hb, hi)}")
    // undecodable bytes: None, not a throw
    assert(ImageIoDecoder.dHash(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("X5: banding finds planted near-dups at the production threshold; plan has no join") {
    import spark.implicits._
    // planted: 1 and 2 differ by one bit (guaranteed shared band), 3 is far
    val sigs = Seq(
      (1L, 0x0123456789abcdefL),
      (2L, 0x0123456789abcdeeL),
      (3L, 0x7edcba9876543210L),
      (4L, 0x0123456789abcdefL)) // exact dup of 1
      .toDF("doc_id", "simhash")
    val pairs = graft.dedup.Dedup.simhashPairs(sigs, "doc_id", bits = 64,
      numBands = Multimodal.DHashBands, maxHamming = 6, maxBucket = 100)
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set((1L, 2L, 1), (1L, 4L, 0), (2L, 4L, 1)))
    // grouped-bucket shape: no join operator anywhere in the plan
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"), s"unexpected join in:\n$plan")
  }

  test("X5: gate query pairs are upper-triangle within threshold; exact payloads hash equal") {
    val out = Multimodal.x5ImageNearDup(spark, sfDir).collect()
    out.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getInt(2) <= Multimodal.DHashMaxHamming)
    }
    val p = "some payload bytes".getBytes("UTF-8")
    assert(Multimodal.dHash(p) == Multimodal.dHash(p.clone()))
    // payload grid: sums/counts cover every byte exactly once
    val (s, c) = Multimodal.byteGrid(p)
    assert(c.sum == p.length && s.sum == p.map(_ & 0xff).map(_.toLong).sum)
  }
}
