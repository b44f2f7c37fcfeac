package graft.pipelines

import graft.{GraftSession, Tables}

/** A/B probe for the c1 Exchange-payload question (r10 verdict #2):
  * keep-first with the text-bearing Exchange ([[CurationQueries.curate]],
  * the production form) vs the hash-only Exchange + second-scan text
  * fetch ([[CurationQueries.curateHashExchange]]).
  *
  * Interleaved A/B/A/B with a warmup pass each, median reported — the
  * same discipline as the r8/r9 kernel probes. Run via
  * `SPARK_GRAFT_SF_DIR=<dir> tools/run_graft.sh graft.pipelines.CurationProbe`.
  */
object CurationProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/scale_sf1")
    val runs = sys.env.get("GRAFT_BENCH_RUNS").map(_.toInt).getOrElse(5)
    val spark = GraftSession.local("c1-probe")
    spark.sparkContext.setLogLevel("ERROR")
    val d = Tables(spark, sfDir, "documents")

    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }
    val forms: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "text_exchange" -> (() => CurationQueries.curate(d)),
      "hash_exchange" -> (() => CurationQueries.curateHashExchange(d)))

    // warmup both
    forms.foreach { case (_, f) =>
      f().write.mode("overwrite").format("noop").save()
    }
    val times = scala.collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
    (1 to runs).foreach { _ =>
      forms.foreach { case (name, f) =>
        times(name) ::= time(f().write.mode("overwrite").format("noop").save())
      }
    }
    forms.foreach { case (name, _) =>
      val ts = times(name).sorted
      println(f"$name%-14s " + s"median=${graft.Fmt.dec(ts(ts.size / 2))} s  all=${ts.map(t => graft.Fmt.dec(t, 2)).mkString(",")}")
    }
    // sanity: identical results
    val a = forms(0)._2().selectExpr("sum(hash(doc_id, lang, split, n_tokens, clean_len))").first().getLong(0)
    val b = forms(1)._2().selectExpr("sum(hash(doc_id, lang, split, n_tokens, clean_len))").first().getLong(0)
    println(s"result_hash_equal=${a == b}")
    spark.stop()
  }
}
