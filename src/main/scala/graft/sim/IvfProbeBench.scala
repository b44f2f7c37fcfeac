package graft.sim

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}

/** The ANN twin of [[graft.dedup.IndexProbeBench]]: a persisted IVF
  * index's probe cost depends on the QUERY batch and the PRUNED lists
  * it touches, not on the corpus size (bucket-pruned reads — the
  * literal-probe-set plan pinned in SimSpec). Protocol: build the
  * inverted file over all embeddings except a FIXED-SIZE query batch,
  * then probe that batch top-k. Run at scale_sf1 (≈19.5k-vector index)
  * and scale_sf10 (≈199.5k): per-list occupancy is held ~constant by
  * sizing nlist to the corpus (nlist = n/1250, the s3 gate's density),
  * so the probed fraction — and the probe time — should stay ~flat
  * while the index grows 10×.
  * Usage: IvfProbeBench <sfDir> [queryVecs=500]; GRAFT_BENCH_RUNS=N.
  */
object IvfProbeBench {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("scale_sf1")
    val nQueries = if (args.length > 1) args(1).toInt else 500
    val runs = sys.env.get("GRAFT_BENCH_RUNS").map(_.toInt).getOrElse(5)
    val spark = GraftSession.local("graft-ivf-probe-bench")
    spark.sparkContext.setLogLevel("ERROR")

    val vecs = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val qIds = vecs
      .select(col("vec_id"), graft.ops.Sampling.hashBucket(col("vec_id"), Int.MaxValue).as("h"))
      .orderBy(col("h").asc, col("vec_id").asc)
      .limit(nQueries)
      .select(col("vec_id").as("q_id"))
    val queries = vecs.join(broadcast(qIds), col("vec_id") === col("q_id"))
      .select(col("vec_id"), col("embedding")).cache()
    val base = vecs.join(broadcast(qIds), col("vec_id") === col("q_id"), "left_anti")
    val nBase = base.count()
    // constant per-list density across SFs (s3's gate density: 20k/16)
    val nlist = math.max(16, (nBase / 1250L).toInt)

    spark.sql("DROP TABLE IF EXISTS graft_ivf_probe_bench")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), "graft_ivf_probe_bench")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    val t0 = System.nanoTime()
    val idx = IvfIndex.build(base, "vec_id", "embedding",
      nlist = nlist, numBuckets = nlist, table = "graft_ivf_probe_bench")
    val buildSec = (System.nanoTime() - t0) / 1e9

    def probeOnce(): Long =
      IvfIndex.probe(idx, queries, "vec_id", "embedding", nprobe = 2, k = 10).count()
    probeOnce() // warm
    val times = (1 to runs).map { _ =>
      val s = System.nanoTime(); val n = probeOnce(); ((System.nanoTime() - s) / 1e9, n)
    }
    val median = times.map(_._1).sorted.apply(runs / 2)
    println(f"""{"sf":"$dir","index_vectors":$nBase,"nlist":$nlist,""" +
      s""""query_vectors":$nQueries,"build_sec":${graft.Fmt.dec(buildSec, 2)},""" +
      s""""probe_median_sec":${graft.Fmt.dec(median)},"result_rows":${times.head._2},"runs":$runs}""")
    queries.unpersist()
    spark.sql(s"DROP TABLE IF EXISTS ${idx.table}")
    spark.stop()
  }
}
