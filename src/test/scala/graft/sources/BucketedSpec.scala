package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The bucketing contract: a join between co-bucketed tables runs with
  * NO shuffle exchange — the disk layout IS the partitioning. */
class BucketedSpec extends SparkTestBase {

  test("co-bucketed join is shuffle-free and matches the plain join") {
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val orders = graft.Tables(spark, sfDir, "orders")
      val lineitem = graft.Tables(spark, sfDir, "lineitem")
        .select("l_orderkey", "l_quantity")
      Bucketed.writeBucketed(orders, "graft_bkt_orders", "o_orderkey", 4)
      Bucketed.writeBucketed(lineitem, "graft_bkt_lineitem", "l_orderkey", 4)

      val joined = Bucketed.coLocatedJoin(spark,
        "graft_bkt_orders", "graft_bkt_lineitem", "o_orderkey", "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"co-bucketed join must not shuffle:\n$plan")
      assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
        "scan must be bucket-aware")

      // results identical to the unbucketed join
      val bucketedAgg = joined.groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("q"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
      val plainAgg = orders.join(lineitem, col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("q"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(bucketedAgg == plainAgg)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_orders")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_lineitem")
    }
  }

  /** Round-12 layout receipts (BucketProbe's pins, enforced): t6 and
    * c1's 100 TB story ends with "on a doc_id-bucketed corpus table the
    * text-side shuffle disappears" — assert the plan deltas here so a
    * regression can't sneak in between probe runs. Each query is pinned
    * under its honest broadcast regime (see BucketProbe's Scaladoc):
    * t6 with broadcasts on (dfreq is vocabulary-sized), c1 with them
    * off (winners are corpus-sized). */
  private def shuffles(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => s
    }

  private def withDocsBucketed(testBody: org.apache.spark.sql.DataFrame => Unit): Unit = {
    val oldAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_docs")
      Bucketed.writeBucketed(
        graft.Tables(spark, sfDir, "documents"), "graft_bkt_docs", "doc_id", 4)
      testBody(spark.table("graft_bkt_docs"))
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", oldAqe)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_docs")
    }
  }

  test("t6 on a doc_id-bucketed table loses its window Exchange") {
    withDocsBucketed { bucketed =>
      val flat = graft.Tables(spark, sfDir, "documents")
      def docSide(d: org.apache.spark.sql.DataFrame) =
        shuffles(graft.text.TextQueries.tfidfTop3(d))
          .count(_.outputPartitioning.toString.contains("doc_id"))
      assert(docSide(flat) >= 1, "control: flat t6 must shuffle on doc_id")
      assert(docSide(bucketed) == 0,
        "bucketed t6 must not shuffle on doc_id — the window reads bucket partitioning")
      // same rows either way
      val cols = Seq("doc_id", "term", "tf", "df", "tfidf", "rk")
      def rows(d: org.apache.spark.sql.DataFrame) =
        graft.text.TextQueries.tfidfTop3(d)
          .selectExpr(s"sum(hash(${cols.mkString(", ")})) AS h").first().getLong(0)
      assert(rows(flat) == rows(bucketed))
    }
  }

  test("c1 on a doc_id-bucketed table shuffles no text bytes") {
    withDocsBucketed { bucketed =>
      val flat = graft.Tables(spark, sfDir, "documents")
      val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        def textShuffles(d: org.apache.spark.sql.DataFrame) =
          shuffles(graft.pipelines.CurationQueries.curateHashExchange(d))
            .count(_.output.exists(_.name == "text"))
        assert(textShuffles(flat) >= 1,
          "control: flat c1's fetch join must shuffle text once")
        assert(textShuffles(bucketed) == 0,
          "bucketed c1 must not shuffle text — the fetch join reads it from buckets")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    }
  }

  /** r15 (verdict item): the layout that closed the q31/q32 perf flags
    * is a SUPPORTED deployment shape, not a bench artifact — pin its
    * plan contract next to the gate queries themselves. */
  test("q31/q32 on the user_id-bucketed events layout run with zero user_id shuffles") {
    val oldAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_events")
      val flat = graft.Tables(spark, sfDir, "events")
      Bucketed.writeEventsByUser(flat.select(col("user_id"), col("ts")),
        "graft_bkt_events", numBuckets = 4)
      val bucketed = spark.table("graft_bkt_events")
      import graft.ops.Relational
      for ((name, q) <- Seq(
          "q31" -> (Relational.slidingDau _),
          "q32" -> (Relational.retention _))) {
        val flatUser = shuffles(q(flat)).count(_.output.exists(_.name == "user_id"))
        val bktUser = shuffles(q(bucketed)).count(_.output.exists(_.name == "user_id"))
        assert(flatUser >= 1, s"control: flat $name must shuffle on user_id")
        assert(bktUser == 0,
          s"$name on the bucketed layout must not shuffle user_id — bucket " +
            "partitioning satisfies the per-user aggregate's distribution")
        // results hash-identical across layouts
        def h(df: org.apache.spark.sql.DataFrame) = {
          val cols = df.columns.sorted.mkString(", ")
          df.selectExpr(s"sum(hash($cols))").first().getLong(0)
        }
        assert(h(q(flat)) == h(q(bucketed)), s"$name results differ between layouts")
      }
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", oldAqe)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_events")
    }
  }

  test("negative control: the same join unbucketed shuffles both sides") {
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val orders = graft.Tables(spark, sfDir, "orders")
      val lineitem = graft.Tables(spark, sfDir, "lineitem")
        .select("l_orderkey", "l_quantity")
      val plan = orders.join(lineitem, col("o_orderkey") === col("l_orderkey"))
        .queryExecution.executedPlan.toString
      assert(plan.contains("Exchange hashpartitioning"),
        s"unbucketed fact-fact join must shuffle (control for the bucketed assert):\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }
}
