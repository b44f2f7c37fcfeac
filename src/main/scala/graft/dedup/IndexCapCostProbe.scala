package graft.dedup

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}

/** Decompose the d9 gate cell's cost at a small SF (r17 verdict #3:
  * the anti-join cap rewrite moved d9's sf0.1 cell 1.41 → 2.08 s while
  * winning 0.28× at sf1000 — this probe measures exactly what the cap
  * branch costs where it cannot trip).
  *
  * Three timings over the d9 gate's own 80% build slice:
  *   build_cap    — the production write (clustering + count aggregate
  *                  + broadcast anti-join off the reused exchange);
  *   build_nocap  — the identical write with the cap branch skipped
  *                  (the small-append short-circuit's path, forced);
  *   probe        — the gate's 20% batch probe against the index.
  * `over_cap_buckets` pins that the two builds are semantically
  * identical at this SF (0 buckets trip), so the build delta is purely
  * the cap branch's fixed cost.
  *
  * Usage: IndexCapCostProbe <sfDir>   (GRAFT_BENCH_RUNS, default 5)
  */
object IndexCapCostProbe {

  def main(args: Array[String]): Unit = {
    require(args.length >= 1, "usage: IndexCapCostProbe <sfDir>")
    val dir = args(0)
    val runs = sys.env.get("GRAFT_BENCH_RUNS").map(_.toInt).getOrElse(5)
    val spark = GraftSession.local("graft-index-cap-cost-probe")
    spark.sparkContext.setLogLevel("ERROR")
    import DedupQueries._

    val d = Tables(spark, dir, "documents")
    val base = d.filter(col("doc_id") % 5 =!= 0)
    val batch = d.filter(col("doc_id") % 5 === 0)

    def bandRows = Dedup.bandSigRows(
      Dedup.shingleRows(base, "doc_id", "text", ShingleK),
      "doc_id", NumHashes, NumBands)
      .select(col("doc_id").as("index_id"), col("band_key"), col("sig"))

    def timedMedian(f: => Unit): Double = {
      f // warm (JIT + page cache; each run still re-executes the write)
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      ts.sorted.apply(runs / 2)
    }

    def drop(t: String): Unit = spark.sql(s"DROP TABLE IF EXISTS $t")

    val capS = timedMedian {
      drop("graft_capcost_a")
      graft.sources.Bucketed.writeBucketed(
        DedupIndex.capAndCluster(bandRows, MaxBucket, IndexBuckets),
        "graft_capcost_a", "band_key", IndexBuckets)
    }
    val nocapS = timedMedian {
      drop("graft_capcost_b")
      graft.sources.Bucketed.writeBucketed(
        DedupIndex.capAndCluster(bandRows, MaxBucket, IndexBuckets,
          canTripCap = false),
        "graft_capcost_b", "band_key", IndexBuckets)
    }
    // no bucket trips the cap at this SF ⟺ the two builds are identical
    val overCap = spark.table("graft_capcost_b")
      .groupBy(col("band_key")).agg(count(lit(1)).as("n"))
      .filter(col("n") > MaxBucket).count()
    val idx = DedupIndex.Handle("graft_capcost_a", IndexBuckets,
      ShingleK, NumHashes, NumBands)
    val probeS = timedMedian {
      DedupIndex.probe(idx, batch, "doc_id", "text", IndexThreshold).count()
    }
    println(s"""{"sf":${graft.Fmt.jstr(dir)},"build_cap_s":${graft.Fmt.dec(capS)},""" +
      s""""build_nocap_s":${graft.Fmt.dec(nocapS)},""" +
      s""""cap_branch_s":${graft.Fmt.dec(capS - nocapS)},""" +
      s""""probe_s":${graft.Fmt.dec(probeS)},""" +
      s""""over_cap_buckets":$overCap,"runs":$runs}""")
    drop("graft_capcost_a"); drop("graft_capcost_b")
    spark.stop()
  }
}
