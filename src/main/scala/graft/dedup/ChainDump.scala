package graft.dedup

import org.apache.spark.sql.functions.col

import graft.GraftSession

/** Materialize [[Dedup.dedupChain]]'s three outputs as parquet for the
  * big-decade correctness mirror (round 17): `tools/check_cc.py
  * --pairs-from=<out>/d2_minhash_pairs <out> <sf_dir>` then verifies the
  * connected-components grouping and the apply pass in DuckDB against
  * these files — the decades where DuckDB's own candidate CTE DNFs.
  *
  * One signature pass, one fixpoint, three writes; the per-output
  * timing line doubles as the chain's cost receipt at the decade.
  *
  * Usage: ChainDump <sf_dir> <out_dir>
  * Env:   SPARK_GRAFT_CPUS — local thread count
  *        GRAFT_CHAIN_CHECKPOINT_DIR — when set, run the chain in
  *        RELIABLE checkpoint mode ([[Dedup.ReliableCheckpointKey]] +
  *        `setCheckpointDir` to this path): the cluster-safe mode where
  *        neither the pairs relation nor the fixpoint rounds pin
  *        executor blocks (round 18 — the sf1000 re-receipt runs this
  *        mode under the 48 g heap that OOM'd in local-block mode).
  */
object ChainDump {

  private def timed(f: => Unit): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: ChainDump <sf_dir> <out_dir>")
    val (sfDir, outDir) = (args(0), args(1))
    val ckptDir = sys.env.get("GRAFT_CHAIN_CHECKPOINT_DIR")
    val spark = GraftSession.local("graft-chain-dump")
    spark.sparkContext.setLogLevel("ERROR")
    ckptDir.foreach { dir =>
      spark.sparkContext.setCheckpointDir(dir)
      spark.conf.set(Dedup.ReliableCheckpointKey, "true")
    }
    import DedupQueries._

    // The chain's signature pass (pairs checkpoint) and the label
    // fixpoint run EAGERLY at construction — time them; the writes then
    // only pay the group aggregation / corpus anti-join / IO.
    var c: Dedup.ChainOut = null
    val chainS = timed {
      c = Dedup.dedupChain(graft.Tables(spark, sfDir, "documents"),
        "doc_id", "text", ShingleK, NumHashes, NumBands, MaxBucket)
    }
    def write(df: org.apache.spark.sql.DataFrame, name: String): Double =
      timed(df.write.mode("overwrite").parquet(s"$outDir/$name"))
    val pairsS = write(c.pairs, "d2_minhash_pairs")
    val groupsS = write(c.groups, "d6_dup_groups")
    val dedupS = write(c.deduped.select(col("doc_id"), col("lang"),
      col("source")), "d8_dedup_apply")

    import graft.Fmt.{dec, jstr}
    println(s"""{"chain_dump":{"sf":${jstr(sfDir)},""" +
      s""""mode":${jstr(if (ckptDir.isDefined) "reliable" else "local")},""" +
      s""""chain_s":${dec(chainS)},"pairs_s":${dec(pairsS)},""" +
      s""""groups_s":${dec(groupsS)},"deduped_s":${dec(dedupS)},""" +
      s""""total_s":${dec(chainS + pairsS + groupsS + dedupS)}}}""")
    spark.stop()
  }
}
