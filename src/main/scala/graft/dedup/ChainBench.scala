package graft.dedup

import graft.GraftSession

/** Receipt for [[Dedup.dedupChain]] (round 17): the three corpus-dedup
  * outputs (candidate pairs / cluster groups / deduped corpus) computed
  * as ONE chain vs as the three standalone gate queries.
  *
  * The standalone forms pay the corpus signature pass three times and
  * the label fixpoint twice; the chain pays each once. This main times
  * both shapes in one JVM, CHAIN FIRST — so the chain runs with a cold
  * page cache and the standalone pack inherits the warm one, biasing
  * the comparison AGAINST the chain; a chain win under this ordering is
  * a floor, not a flattered number.
  *
  * Usage: ChainBench [sf_dir]   (env: SPARK_GRAFT_CPUS, GRAFT_BENCH_RUNS
  * is ignored — one pass per shape, this is a shape A/B not a median
  * protocol)
  */
object ChainBench {

  private def timed(f: => Unit): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-chain-bench")
    spark.sparkContext.setLogLevel("ERROR")
    import DedupQueries._

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    val chainS = timed {
      val c = Dedup.dedupChain(docs0(spark, sfDir), "doc_id", "text",
        ShingleK, NumHashes, NumBands, MaxBucket)
      noop(c.pairs)   // d2's output (already checkpointed — ~free)
      noop(c.groups)  // d6's output
      noop(c.deduped) // d8's output
    }

    val d2S = timed(noop(d2MinhashPairs(spark, sfDir)))
    val d6S = timed(noop(d6DupGroups(spark, sfDir)))
    val d8S = timed(noop(d8DedupApply(spark, sfDir)))
    val sum = d2S + d6S + d8S

    println(f"""{"chain_bench":{"sf":"$sfDir","chain_s":$chainS%.3f,""" +
      f""""d2_s":$d2S%.3f,"d6_s":$d6S%.3f,"d8_s":$d8S%.3f,""" +
      f""""standalone_sum_s":$sum%.3f,"ratio":${chainS / sum}%.3f}}""")
    spark.stop()
  }

  /** DedupQueries.docs is private; re-derive the same loader here. */
  private def docs0(s: org.apache.spark.sql.SparkSession, dir: String) =
    graft.Tables(s, dir, "documents")
}
