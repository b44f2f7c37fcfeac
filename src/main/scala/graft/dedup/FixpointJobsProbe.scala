package graft.dedup

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Job-count + wall receipt for the connected-components fixpoint
  * (optimization round 19). The round-18 verdict's top remaining cost
  * was the fixpoint's per-round driver overhead: ~45% of d6/d8 gate
  * wall was planning/scheduling gaps between ~20 tiny jobs (each round
  * paid a checkpoint job AND a star-forest probe job). Round 19 folds
  * the probe into the round's materialization via observe(), so this
  * probe exists to receipt the job count per fixpoint-bearing query:
  * it runs d6 (and d8) once warm with a job listener and prints
  * jobs + wall.
  *
  * Usage: runMain graft.dedup.FixpointJobsProbe [sfDir] [runs]
  */
object FixpointJobsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = if (args.length > 1) args(1).toInt else 3
    val spark = graft.GraftSession.local("graft-fixpoint-jobs")
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    for (key <- Seq("d6_dup_groups", "d8_dedup_apply")) {
      val fn = DedupQueries.queries(key)
      // warm once (codegen, session init)
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      val samples = (1 to runs).map { _ =>
        jobs.set(0)
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        (jobs.get(), (System.nanoTime() - t0) / 1e9)
      }
      val medWall = samples.map(_._2).sorted.apply(runs / 2)
      println(f"[fixpoint-jobs] $key%-16s jobs=${samples.map(_._1).min}%3d " +
        f"wall_median=$medWall%.3f s over $runs runs ($sfDir)")
    }
    spark.stop()
  }
}
