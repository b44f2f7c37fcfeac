package graft.dedup

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}

/** The d9 production claim, measured: a persisted dedup index's PROBE
  * cost depends on the BATCH size, not the corpus size (bucket-co-located
  * band join, no index-side Exchange — plan-pinned in DedupSpec). The
  * gate's d9 can't show this because it pays the BUILD every run.
  *
  * Protocol: build the index over all documents except a FIXED-SIZE
  * batch (first `BatchDocs` ids by hash order — deterministic), then
  * probe that same-sized batch. Run against scale_sf1 (≈45k-doc index)
  * and scale_sf10 (≈495k-doc index): the probe medians should be ~flat
  * while the index grows 10×. Usage: IndexProbeBench <sfDir>
  * [batchDocs=5000]; GRAFT_BENCH_RUNS=N (default 5).
  */
object IndexProbeBench {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("scale_sf1")
    val batchDocs = if (args.length > 1) args(1).toInt else 5000
    val runs = sys.env.get("GRAFT_BENCH_RUNS").map(_.toInt).getOrElse(5)
    val spark = GraftSession.local("graft-index-probe-bench")
    spark.sparkContext.setLogLevel("ERROR")
    import DedupQueries._

    val docs = Tables(spark, dir, "documents")
    // deterministic fixed-size batch: smallest `batchDocs` ids by
    // (hash, id) order — stable across runs and SFs
    val batchIds = docs
      .select(col("doc_id"), graft.ops.Sampling.hashBucket(col("doc_id"), Int.MaxValue).as("h"))
      .orderBy(col("h").asc, col("doc_id").asc)
      .limit(batchDocs)
      .select(col("doc_id").as("b_id"))
    val batch = docs.join(broadcast(batchIds), col("doc_id") === col("b_id"))
      .select(col("doc_id"), col("text"))
      .cache()
    val base = docs.join(broadcast(batchIds), col("doc_id") === col("b_id"), "left_anti")
    val nBatch = batch.count()

    val t0 = System.nanoTime()
    val idx = DedupIndex.build(base, "doc_id", "text", "graft_probe_bench_index",
      IndexBuckets, ShingleK, NumHashes, NumBands, MaxBucket)
    val buildSec = (System.nanoTime() - t0) / 1e9
    val nIndex = spark.table(idx.table).select(col("index_id")).distinct().count()

    def probeOnce(): Long = DedupIndex.probe(idx, batch, "doc_id", "text", IndexThreshold)
      .count()
    probeOnce() // warm
    val times = (1 to runs).map { _ =>
      val s = System.nanoTime(); val n = probeOnce(); ((System.nanoTime() - s) / 1e9, n)
    }
    val median = times.map(_._1).sorted.apply(runs / 2)
    println(f"""{"sf":"$dir","index_docs":$nIndex,"batch_docs":$nBatch,""" +
      s""""build_sec":${graft.Fmt.dec(buildSec, 2)},"probe_median_sec":${graft.Fmt.dec(median)},""" +
      f""""probe_matches":${times.head._2},"runs":$runs}""")
    batch.unpersist()
    spark.sql(s"DROP TABLE IF EXISTS ${idx.table}")
    spark.stop()
  }
}
