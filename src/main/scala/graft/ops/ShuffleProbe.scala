package graft.ops

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}

import graft.{GraftSession, Tables}

/** Observed-shuffle receipt for the q31/q32 flat-parquet residual
  * (round 16, verdict item: "measure the partial-combine claim").
  *
  * The r15 disposition argued the flat-layout residual is the
  * irreducible distributed-distinct Exchange: with U distinct users
  * spread uniformly over M map tasks, map-side combine can shrink the
  * fact rows only to ≈ U × M / words partial rows (every map task sees
  * almost every user at sf100's density), so the Exchange carries tens
  * of millions of rows no matter how the aggregate is shaped. That was
  * COMPUTED, not observed. This probe runs the shipped q31/q32 forms
  * once at the given SF and prints per-stage shuffle write records /
  * bytes straight from the task metrics, so BASELINE can carry the
  * observed numbers. Usage: ShuffleProbe [sf_dir]
  */
object ShuffleProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("scale_sf100")
    val spark = GraftSession.local("graft-shuffle-probe")
    spark.sparkContext.setLogLevel("ERROR")

    val lock = new Object
    // write recs, write bytes, tasks, executor run ms (summed over tasks)
    var stages = Map[Int, (Long, Long, Long, Long)]()
    var walls = Map[Int, Long]() // stageId -> wall ms (submission→completion)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = lock.synchronized {
        val m = t.taskMetrics
        if (m != null) {
          val (wr, wb, n, rt) = stages.getOrElse(t.stageId, (0L, 0L, 0L, 0L))
          stages += t.stageId -> (wr + m.shuffleWriteMetrics.recordsWritten,
            wb + m.shuffleWriteMetrics.bytesWritten, n + 1,
            rt + m.executorRunTime)
        }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        lock.synchronized {
          val i = s.stageInfo
          walls += i.stageId -> (for {a <- i.submissionTime; b <- i.completionTime}
            yield b - a).getOrElse(-1L)
        }
    })

    val events = Tables(spark, sfDir, "events")
    val factRows = events.count()
    val users = events.select("user_id").distinct().count()
    lock.synchronized { stages = Map.empty } // drop the setup stages

    for ((name, df) <- Seq("q31" -> Relational.slidingDau(events),
      "q32" -> Relational.retention(events))) {
      lock.synchronized { stages = Map.empty; walls = Map.empty }
      df.write.mode("overwrite").format("noop").save()
      Thread.sleep(2000) // listener bus drains asynchronously
      val snap = lock.synchronized(stages).toSeq.sortBy(_._1)
      val wallSnap = lock.synchronized(walls)
      val lines = snap.collect { case (id, (wr, wb, n, rt)) if wr > 0 || rt > 1000 =>
        s"""{"stage":$id,"write_records":$wr,"write_mb":${wb / 1048576},""" +
          s""""tasks":$n,"wall_s":${wallSnap.getOrElse(id, -1L) / 1000.0},""" +
          s""""exec_cpu_s":${snap.toMap.get(id).map(_._4).getOrElse(0L) / 1000.0}}"""
      }
      val totalRecs = snap.map(_._2._1).sum
      println(s"""{"probe":"$name","sf_dir":"$sfDir","fact_rows":$factRows,""" +
        s""""distinct_users":$users,"total_shuffle_records":$totalRecs,""" +
        s""""stages":[${lines.mkString(",")}]}""")
    }
    spark.stop()
  }
}
