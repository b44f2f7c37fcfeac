package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}

/** Bucketed-layout receipt (round 12): t6 and c1's 100 TB story both
  * end with "…and on a doc_id-bucketed corpus table the text-side
  * shuffle disappears". This probe MEASURES that claim instead of
  * arguing it:
  *
  *   1. writes the scaled documents table twice — flat parquet and a
  *      doc_id-bucketed catalog table (the layout a production corpus
  *      store would maintain anyway for point lookup + co-located join);
  *   2. pins the PLAN deltas with AQE off (PlanAudit's convention):
  *      - t6: the ranking window's `Exchange hashpartitioning(doc_id)`
  *        — the only corpus-sized shuffle in the query — must be ABSENT
  *        on the bucketed layout (the scan's bucket partitioning feeds
  *        the window directly);
  *      - c1: no shuffle may carry the `text` column on the bucketed
  *        layout (the fetch join reads text straight from buckets; only
  *        ~60-byte winner rows still cross the wire);
  *   3. races flat vs bucketed, interleaved, median of N, results
  *      asserted hash-identical.
  *
  * Usage: BucketProbe [sf_dir] (default scale_sf1); GRAFT_BENCH_RUNS=N.
  * Numbers land in BASELINE.md "bucketed-layout receipt".
  */
object BucketProbe {

  val Buckets = 16

  private def shuffles(df: DataFrame): Seq[ShuffleExchangeLike] =
    df.queryExecution.executedPlan.collect { case s: ShuffleExchangeLike => s }

  private def resultHash(df: DataFrame, cols: String*): Long =
    df.selectExpr(s"sum(hash(${cols.mkString(", ")}))").first().getLong(0)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("scale_sf1")
    val runs = sys.env.get("GRAFT_BENCH_RUNS").map(_.toInt).getOrElse(5)
    val spark = GraftSession.local("graft-bucket-probe")
    spark.sparkContext.setLogLevel("ERROR")

    val flat = Tables(spark, sfDir, "documents")
    // a prior run that died after the write left an orphaned location
    // the fresh in-memory catalog can't adopt — clear both layers first
    spark.sql("DROP TABLE IF EXISTS graft_docs_bucketed")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), "graft_docs_bucketed")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    Bucketed.writeBucketed(flat, "graft_docs_bucketed", "doc_id", Buckets)
    val bucketed = spark.table("graft_docs_bucketed")

    val forms: Seq[(String, DataFrame => DataFrame)] = Seq(
      "t6_tfidf" -> (d => graft.text.TextQueries.tfidfTop3(d)),
      "c1_curation" -> (d => graft.pipelines.CurationQueries.curateHashExchange(d)))

    // ---- plan pins (static plans, AQE off — PlanAudit's convention).
    // Each query is pinned under ITS honest 100 TB broadcast regime:
    // - t6 with auto-broadcast ON: its only joined relation (dfreq) is
    //   VOCABULARY-sized — sub-linear in the corpus and broadcastable
    //   at any corpus scale — so the broadcast is the production plan,
    //   and what bucketing must remove is the ranking window's
    //   corpus-sized Exchange on doc_id;
    // - c1 with auto-broadcast OFF: its winners relation is
    //   CORPUS-sized (one row per surviving doc) and never fits memory,
    //   so the size-based broadcast that hides the flat layout's text
    //   shuffle at test SF is exactly the misleading shape to exclude —
    //   what bucketing must remove is any shuffle CARRYING text. ----
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val oldBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    def pinStats(f: DataFrame => DataFrame): ((Int, Int, Int), (Int, Int, Int)) = {
      def stats(d: DataFrame) = {
        val sh = shuffles(f(d))
        (sh.size, sh.count(_.outputPartitioning.toString.contains("doc_id")),
          sh.count(_.output.exists(_.name == "text")))
      }
      (stats(flat), stats(bucketed))
    }
    def report(name: String, s: ((Int, Int, Int), (Int, Int, Int))): Unit = {
      val ((fn, fd, ft), (bn, bd, bt)) = s
      println(s"[plan] $name flat: $fn shuffles ($fd on doc_id, $ft carrying text); " +
        s"bucketed: $bn shuffles ($bd on doc_id, $bt carrying text)")
    }
    // the static planner estimates dfreq's size from the SCAN, so past
    // sf1 it overshoots the 10 MB default and plans SMJ-on-term — the
    // decision AQE reverses at runtime once it sees the actual
    // vocabulary-sized aggregate. Raise the threshold so the static pin
    // models the runtime plan (the pin's subject is the window's
    // Exchange, not the join strategy).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (256 << 20).toString)
    val t6Pin = pinStats(forms(0)._2)
    report("t6_tfidf", t6Pin)
    require(t6Pin._1._2 >= 1, "control: flat t6 must shuffle on doc_id")
    require(t6Pin._2._2 == 0,
      "bucketed t6 must not shuffle on doc_id — the window reads bucket partitioning")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val c1Pin = pinStats(forms(1)._2)
    report("c1_curation", c1Pin)
    require(c1Pin._1._3 >= 1, "control: flat c1's fetch join must shuffle text once")
    require(c1Pin._2._3 == 0,
      "bucketed c1 must not shuffle text — the fetch join reads it from buckets")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldBroadcast)

    // ---- result equality ----
    require(resultHash(graft.text.TextQueries.tfidfTop3(flat),
        "doc_id", "term", "tf", "df", "tfidf", "rk") ==
      resultHash(graft.text.TextQueries.tfidfTop3(bucketed),
        "doc_id", "term", "tf", "df", "tfidf", "rk"), "t6 results differ")
    require(resultHash(graft.pipelines.CurationQueries.curateHashExchange(flat),
        "doc_id", "lang", "split", "n_tokens", "clean_len") ==
      resultHash(graft.pipelines.CurationQueries.curateHashExchange(bucketed),
        "doc_id", "lang", "split", "n_tokens", "clean_len"), "c1 results differ")

    // ---- interleaved timing, median of N ----
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val layouts: Seq[(String, DataFrame)] = Seq("flat" -> flat, "bucketed" -> bucketed)
    forms.foreach { case (qname, f) => // warmup
      layouts.foreach { case (_, d) =>
        f(d).write.mode("overwrite").format("noop").save()
      }
    }
    val times = scala.collection.mutable.Map[(String, String), List[Double]]()
      .withDefaultValue(Nil)
    (1 to runs).foreach { _ =>
      forms.foreach { case (qname, f) =>
        layouts.foreach { case (lname, d) =>
          times((qname, lname)) ::=
            time(f(d).write.mode("overwrite").format("noop").save())
        }
      }
    }
    forms.foreach { case (qname, _) =>
      val line = layouts.map { case (lname, _) =>
        val ts = times((qname, lname)).sorted
        s"$lname=${graft.Fmt.dec(ts(ts.size / 2))} s"
      }.mkString("  ")
      println(s"[time] $qname  $line  (median of $runs)")
    }
    spark.sql("DROP TABLE IF EXISTS graft_docs_bucketed")
    spark.stop()
  }
}
