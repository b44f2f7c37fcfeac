package graft.ops

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}

import graft.{GraftSession, SparkEntry, Tables}

/** Observed-shuffle receipt for the q31/q32 flat-parquet residual
  * (round 16, verdict item: "measure the partial-combine claim").
  *
  * The r15 disposition argued the flat-layout residual is the
  * irreducible distributed-distinct Exchange: with U distinct users
  * spread uniformly over M map tasks, map-side combine can shrink the
  * fact rows only to ≈ U × M / words partial rows (every map task sees
  * almost every user at sf100's density), so the Exchange carries tens
  * of millions of rows no matter how the aggregate is shaped. That was
  * COMPUTED, not observed. This probe runs the shipped query forms
  * once at the given SF and prints per-stage shuffle write records /
  * bytes straight from the task metrics, so BASELINE can carry the
  * observed numbers.
  *
  * Round 17: generalized to ANY SparkEntry query — per-stage rows now
  * carry the stage's callsite name, which is what attributes cost
  * inside multi-job operators (d6's shingle pass vs its contraction
  * rounds). Per the r16 advisory, executorRunTime is reported as
  * `exec_run_s` (task wall: includes shuffle-fetch wait and GC) and
  * true CPU as `exec_cpu_s` (executorCpuTime); a stage with no
  * completion event omits a real wall and reports -1.
  *
  * Usage: ShuffleProbe [sf_dir] [queryKey ...]
  * Default queries: q31_sliding_dau q32_retention (the original probe;
  * this default mode also prints the fact/user context counts).
  *
  * GRAFT_PROBE_OUT=<dir>: materialize each probed query to
  * <dir>/<key> parquet instead of the noop sink — lets one expensive
  * decade run serve both the stage receipt and a correctness-mirror
  * input (e.g. tools/check_cc.py wants d6's result on disk). The
  * parquet write adds its encode cost to query_wall_s; stage rows
  * attribute it.
  */
object ShuffleProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("scale_sf100")
    val explicit = args.drop(1).toSeq
    val keys =
      if (explicit.nonEmpty) explicit
      else Seq("q31_sliding_dau", "q32_retention")
    val unknown = keys.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown query keys: ${unknown.mkString(",")}")

    val spark = GraftSession.local("graft-shuffle-probe")
    spark.sparkContext.setLogLevel("ERROR")

    val lock = new Object
    // write recs, write bytes, tasks, executor run ms, executor cpu ns
    var stages = Map[Int, (Long, Long, Long, Long, Long)]()
    var meta = Map[Int, (Long, String)]() // stageId -> (wall ms | -1, callsite)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = lock.synchronized {
        val m = t.taskMetrics
        if (m != null) {
          val (wr, wb, n, rt, ct) = stages.getOrElse(t.stageId, (0L, 0L, 0L, 0L, 0L))
          stages += t.stageId -> (wr + m.shuffleWriteMetrics.recordsWritten,
            wb + m.shuffleWriteMetrics.bytesWritten, n + 1,
            rt + m.executorRunTime, ct + m.executorCpuTime)
        }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        lock.synchronized {
          val i = s.stageInfo
          val wall = (for { a <- i.submissionTime; b <- i.completionTime }
            yield b - a).getOrElse(-1L)
          meta += i.stageId -> (wall, i.name.takeWhile(_ != '\n'))
        }
    })

    // context counts only in the default q31/q32 mode — an explicit
    // probe wants its first timed stage to be the operator's own
    if (explicit.isEmpty) {
      val events = Tables(spark, sfDir, "events")
      val factRows = events.count()
      val users = events.select("user_id").distinct().count()
      println(s"""{"context":{"fact_rows":$factRows,"distinct_users":$users}}""")
    }

    for (name <- keys) {
      lock.synchronized { stages = Map.empty; meta = Map.empty }
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      sys.env.get("GRAFT_PROBE_OUT") match {
        case Some(dir) => df.write.mode("overwrite").parquet(s"$dir/$name")
        case None      => df.write.mode("overwrite").format("noop").save()
      }
      val wallS = (System.nanoTime() - t0) / 1e9
      Thread.sleep(2000) // listener bus drains asynchronously
      val snap = lock.synchronized(stages).toSeq.sortBy(_._1)
      val metaSnap = lock.synchronized(meta)
      val lines = snap.collect { case (id, (wr, wb, n, rt, ct)) if wr > 0 || rt > 1000 =>
        val (wall, at) = metaSnap.getOrElse(id, (-1L, ""))
        s"""{"stage":$id,"at":"$at","write_records":$wr,"write_mb":${wb / 1048576},""" +
          s""""tasks":$n,"wall_s":${if (wall < 0) -1 else wall / 1000.0},""" +
          s""""exec_run_s":${rt / 1000.0},"exec_cpu_s":${ct / 1e9}}"""
      }
      val totalRecs = snap.map(_._2._1).sum
      println(s"""{"probe":"$name","sf_dir":"$sfDir","query_wall_s":$wallS,""" +
        s""""total_shuffle_records":$totalRecs,""" +
        s""""stages":[${lines.mkString(",")}]}""")
    }
    spark.stop()
  }
}
