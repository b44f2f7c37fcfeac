package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SparkSessionExtensions integration: SQL-callable native expressions
  * and the automatic HOF→CountInSet optimizer rewrite. Runs on the
  * shared session — GraftSession wires the extensions into every
  * session it builds, so this also proves the production wiring. */
class ExtensionsSpec extends SparkTestBase {

  import spark.implicits._

  private def countInSets(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
    plan.flatMap(_.expressions.flatMap(_.collect { case c: text.CountInSet => c }))

  test("graft_dot and graft_count_in_set are callable from SQL") {
    val dot = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .as[Double].head()
    assert(dot == 32.0)
    val hits = spark.sql(
      "SELECT graft_count_in_set(array('the', 'cat', 'the'), 'the', 'a') AS h")
      .as[Int].head()
    assert(hits == 2)
  }

  test("optimizer rewrites size(filter(x, isin(...))) to the native CountInSet") {
    // real scan (literal-backed inputs constant-fold to a LocalRelation
    // before the rule could show up in the plan)
    val df = Tables(spark, sfDir, "documents")
      .select(split(lower(col("text")), "\\s+").as("toks"))
      .select(size(filter(col("toks"), t => t.isin("the", "a"))).as("hits"))
    // under ANSI (Spark 4 default) size(NULL) is null — same semantics
    // as CountInSet, so the rewrite fires even on a nullable column
    assert(countInSets(df.queryExecution.optimizedPlan).nonEmpty,
      s"rewrite did not fire:\n${df.queryExecution.optimizedPlan}")
    // results identical to the direct native form
    val direct = Tables(spark, sfDir, "documents")
      .select(text.TextFunctions.hitCount(
        split(lower(col("text")), "\\s+"), Seq("the", "a")).as("hits"))
    assert(df.as[Int].collect().toSeq == direct.as[Int].collect().toSeq)
  }

  test("rewrite does NOT fire when legacy size(NULL)=-1 semantics differ") {
    val old = (spark.conf.get("spark.sql.ansi.enabled"),
      spark.conf.get("spark.sql.legacy.sizeOfNull"))
    try {
      spark.conf.set("spark.sql.ansi.enabled", "false")
      spark.conf.set("spark.sql.legacy.sizeOfNull", "true")
      val df = Tables(spark, sfDir, "documents")
        .select(split(lower(col("text")), "\\s+").as("toks")) // nullable source
        .select(size(filter(col("toks"), t => t.isin("the"))).as("hits"))
      assert(countInSets(df.queryExecution.optimizedPlan).isEmpty,
        "null-semantics-changing rewrite must not fire on a nullable array")
    } finally {
      spark.conf.set("spark.sql.ansi.enabled", old._1)
      spark.conf.set("spark.sql.legacy.sizeOfNull", old._2)
    }
  }

  private def shingleExprs(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
    plan.flatMap(_.expressions.flatMap(_.collect { case s: text.Shingles => s }))

  test("graft_shingles is callable from SQL (with optional distinct)") {
    val sh = spark.sql(
      "SELECT graft_shingles(array('a', 'b', 'c', 'b', 'c'), 2) AS s")
      .as[Seq[String]].head()
    assert(sh == Seq("a b", "b c", "c b", "b c"))
    val dsh = spark.sql(
      "SELECT graft_shingles(array('a', 'b', 'c', 'b', 'c'), 2, true) AS s")
      .as[Seq[String]].head()
    assert(dsh == Seq("a b", "b c", "c b"))
  }

  test("optimizer rewrites the guarded HOF shingle idiom to the native Shingles") {
    // the exact guarded formulation graft itself shipped before the
    // native kernel — what a user following the docs would write
    def hofShingles(toks: org.apache.spark.sql.Column, k: Int) =
      when(size(toks) < k, array().cast("array<string>"))
        .otherwise(transform(
          sequence(lit(1), size(toks) - lit(k - 1)),
          i => concat_ws(" ", slice(toks, i, lit(k)))))
    val df = Tables(spark, sfDir, "documents")
      .select(hofShingles(split(lower(col("text")), "\\s+"), 3).as("sh"))
    assert(shingleExprs(df.queryExecution.optimizedPlan).nonEmpty,
      s"shingle rewrite did not fire:\n${df.queryExecution.optimizedPlan}")
    // results identical to the direct native form (short docs included)
    val direct = Tables(spark, sfDir, "documents")
      .select(text.TextFunctions.shingles(split(lower(col("text")), "\\s+"), 3).as("sh"))
    assert(df.as[Seq[String]].collect().toSeq == direct.as[Seq[String]].collect().toSeq)
  }

  test("runtime bloom-filter pruning: selective dim filter injects might_contain into the fact scan") {
    // inert at local SF under the default 10 GB application-side
    // threshold (GraftSession turns the feature on); forcing the
    // thresholds down shows what a 1000-executor fact scan gets
    val forced = Map(
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10GB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = forced.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      forced.foreach { case (k, v) => spark.conf.set(k, v) }
      def q = Tables(spark, sfDir, "lineitem")
        .join(Tables(spark, sfDir, "orders").filter(col("o_totalprice") > 400000),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain") && optimized.contains("bloom_filter_agg"),
        s"bloom filter not injected:\n$optimized")
      val withBloom = q.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      // no false negatives: result identical with the feature off
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val without = q.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(withBloom == without && withBloom.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      saved.foreach { case (k, vOpt) =>
        vOpt.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
    }
  }

  test("shingle rewrite does NOT fire on a non-space separator or mismatched k") {
    val toks = split(lower(col("text")), "\\s+")
    val wrongSep = Tables(spark, sfDir, "documents")
      .select(when(size(toks) < 3, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(1), size(toks) - lit(2)),
          i => concat_ws("|", slice(toks, i, lit(3))))).as("sh"))
    assert(shingleExprs(wrongSep.queryExecution.optimizedPlan).isEmpty,
      "rewrite must not fire for a non-shingle separator")
    val wrongK = Tables(spark, sfDir, "documents")
      .select(when(size(toks) < 4, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(1), size(toks) - lit(2)),
          i => concat_ws(" ", slice(toks, i, lit(3))))).as("sh"))
    assert(shingleExprs(wrongK.queryExecution.optimizedPlan).isEmpty,
      "rewrite must not fire when the guard k disagrees with the slice k")
  }
}
