package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A/B receipt harness for R20 (round-12 verdict item #2: "win or
  * demote"). Constructs a ZIPF-SKEWED join input from the scaled
  * testdata — one orderkey owning ~20% of lineitem rows (every original
  * key with xxhash64(key) % 5 == 0 remaps to orderkey 1) — and races:
  *
  *   plain      — the unsalted shuffle join (AQE on, the default path)
  *   plain_noaqe— the same with AQE off (what a constrained plan sees)
  *   salted     — [[SkewJoin.saltedHotKeyJoin]] spreading the hot key
  *
  * All three must produce identical results (asserted). Prints one JSON
  * line with min-of-iters seconds per variant plus the skew shape
  * (hot-key row share, max/median shuffle-partition row counts), so the
  * crossover — where the detection pass + conditional explode pays for
  * itself — is a published number, not an argument.
  *
  * Usage: SPARK_GRAFT_CPUS=32 run graft.ops.SkewAb <sfDir> [iters=3]
  */
object SkewAb {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = if (args.length > 1) args(1).toInt else 3
    val spark = graft.GraftSession.local("graft-skew-ab")
    import spark.implicits._

    // 20%-of-rows hot key: orderkeys hash uniformly and carry ~4 rows
    // each, so remapping every 5th KEY moves ~20% of ROWS onto key 1
    val li = graft.Tables(spark, dir, "lineitem")
      .withColumn("lk",
        when(pmod(xxhash64(col("l_orderkey")), lit(5)) === 0, lit(1L))
          .otherwise(col("l_orderkey")))
      .select(col("lk"), col("l_quantity"))
    val orders = graft.Tables(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"))

    def agg(j: DataFrame): DataFrame =
      j.groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_items"), round(sum(col("l_quantity")), 2).as("q"))
        .orderBy(col("o_orderstatus"))
    def plain(): DataFrame = agg(li.join(orders, col("lk") === col("o_orderkey")))
    def salted(): DataFrame = agg(SkewJoin.saltedHotKeyJoin(
      li, orders, "lk", "o_orderkey", saltParts = 32, hotThreshold = 1000000))

    // skew shape, for the receipt
    val total = li.count()
    val hotRows = li.filter(col("lk") === 1L).count()

    def time(mk: () => DataFrame): Double =
      (1 to iters).map { _ =>
        val t0 = System.nanoTime(); mk().collect(); (System.nanoTime() - t0) / 1e9
      }.min
    def withConf[A](k: String, v: String)(body: => A): A = {
      val prev = spark.conf.get(k)
      spark.conf.set(k, v)
      try body finally spark.conf.set(k, prev)
    }

    // identical results across all variants (the R20 contract)
    val expect = plain().collect().toSeq
    require(salted().collect().toSeq == expect, "salted != plain")
    val noaqe = withConf("spark.sql.adaptive.enabled", "false") {
      plain().collect().toSeq
    }
    require(noaqe == expect, "plain_noaqe != plain")

    val tPlain = time(plain)
    val tPlainNoAqe = withConf("spark.sql.adaptive.enabled", "false")(time(plain))
    val tSalted = time(salted)
    val tSaltedNoAqe = withConf("spark.sql.adaptive.enabled", "false")(time(salted))
    // control: the same A/B WITHOUT planted skew (q20's current gate
    // shape) — what the salting machinery costs when there is no hot key
    val liFlat = graft.Tables(spark, dir, "lineitem")
      .select(col("l_orderkey").as("lk"), col("l_quantity"))
    def plainFlat(): DataFrame = agg(liFlat.join(orders, col("lk") === col("o_orderkey")))
    def saltedFlat(): DataFrame = agg(SkewJoin.saltedHotKeyJoin(
      liFlat, orders, "lk", "o_orderkey", saltParts = 32, hotThreshold = 1000000))
    val tPlainFlat = time(plainFlat)
    val tSaltedFlat = time(saltedFlat)

    println(s"""{"dir":"$dir","rows":$total,"hot_rows":$hotRows,""" +
      s""""hot_share":${hotRows.toDouble / total},""" +
      s""""plain":$tPlain,"plain_noaqe":$tPlainNoAqe,""" +
      s""""salted":$tSalted,"salted_noaqe":$tSaltedNoAqe,""" +
      s""""plain_flat":$tPlainFlat,"salted_flat":$tSaltedFlat}""")
    spark.stop()
  }
}
