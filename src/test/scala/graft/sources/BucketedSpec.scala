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
