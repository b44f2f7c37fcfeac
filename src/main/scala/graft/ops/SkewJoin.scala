package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Exact

/** Salted equi-join for skewed keys (SURVEY §2.2 R18, §4).
  *
  * When one join key carries a disproportionate share of rows ("hot
  * key"), a plain shuffle join lands that key's entire volume on one
  * task. Salting splits it: the skewed (probe) side adds a deterministic
  * salt in [0, saltParts), the other (build) side is replicated once per
  * salt value, and the join key becomes (key, salt) — the hot key now
  * spreads over saltParts tasks. Cost: build side shuffles ×saltParts,
  * so use it when probe skew dominates build size (the typical fact⨝dim
  * or fact⨝smaller-fact shape). AQE's skew-join handles many cases at
  * runtime; explicit salting is the deterministic-plan form that also
  * works where AQE can't split (e.g. under aggregations keyed on the
  * join key).
  *
  * The salt is content-derived (xxhash64 of the probe row's columns),
  * not random — re-runs produce identical plans and results, and the
  * join output is provably identical to the unsalted join (the gate
  * checks q18 against a plain-join oracle). */
object SkewJoin {

  def saltedEquiJoin(skewed: DataFrame, other: DataFrame,
                     skewedKey: String, otherKey: String,
                     saltParts: Int): DataFrame = {
    val salted = skewed.withColumn("graft_salt",
      pmod(xxhash64(skewed.columns.map(col).toIndexedSeq: _*), lit(saltParts)))
    val replicated = other.withColumn("graft_salt",
      explode(array((0 until saltParts).map(lit(_)): _*)))
    salted.join(replicated,
        salted(skewedKey) === replicated(otherKey)
          && salted("graft_salt") === replicated("graft_salt"))
      .drop("graft_salt")
  }

  /** Two-level salting: only keys whose probe-side row count exceeds
    * `hotThreshold` get salted (and only their build rows replicate);
    * the cold majority takes the plain join path. This is the form that
    * scales — uniform salting replicates the ENTIRE build side
    * ×saltParts, hot-key salting replicates only the hot keys' build
    * rows. Costs one extra aggregation pass over the probe side to find
    * the heavy hitters (map-side-combined (key, count) partials — the
    * wire never carries data rows), broadcast back as a tiny set.
    * Results are provably identical to the plain join (q20's oracle).
    *
    * The hot set is capped at the `maxHotKeys` HEAVIEST keys (r11): a
    * salting decision never changes results, only which keys spread, so
    * the cap bounds the set by construction — on a low-skew input an
    * absolute threshold can otherwise capture a large fraction of the
    * key space (measured at sf1: ~29% of orderkeys "hot"). The
    * TakeOrdered tiebreak on the key keeps the set deterministic.
    *
    * Because the cap makes the hot set PROVABLY bounded, it collects to
    * the driver (one detection job) and both sides test membership with
    * an `InSet` literal — plan-audited at sf1, the earlier
    * broadcast-join formulation planned the detection subtree TWICE
    * (once per side's left join, no ReuseExchange across broadcast
    * subtrees), i.e. two extra full probe-side aggregations. This is
    * the fifth documented bounded collect (≤ maxHotKeys keys), beside
    * the histogram/centroid/prefix/bucket-id sites. */
  def saltedHotKeyJoin(skewed: DataFrame, other: DataFrame,
                       skewedKey: String, otherKey: String,
                       saltParts: Int, hotThreshold: Long,
                       maxHotKeys: Int = 1000): DataFrame = {
    val hotKeys = skewed.groupBy(col(skewedKey)).agg(count(lit(1)).as("graft_kn"))
      .filter(col("graft_kn") > hotThreshold)
      .orderBy(col("graft_kn").desc, col(skewedKey))
      .limit(maxHotKeys)
      .select(col(skewedKey))
      .collect().map(_.get(0)).toIndexedSeq
    def isHot(c: org.apache.spark.sql.Column) =
      if (hotKeys.isEmpty) lit(false) else c.isin(hotKeys: _*)
    val salted = skewed.withColumn("graft_salt",
      when(isHot(col(skewedKey)),
        pmod(xxhash64(skewed.columns.map(col).toIndexedSeq: _*), lit(saltParts)))
        .otherwise(lit(0)))
    // generators can't sit inside CASE: explode a conditional array
    // instead — hot keys fan out ×saltParts, cold keys stay single
    val replicated = other.withColumn("graft_salt", explode(
      when(isHot(col(otherKey)), array((0 until saltParts).map(lit(_)): _*))
        .otherwise(array(lit(0)))))
    salted.join(replicated,
        salted(skewedKey) === replicated(otherKey)
          && salted("graft_salt") === replicated("graft_salt"))
      .drop("graft_salt")
  }

  /** R18 gate query: lineitem (probe, salted) ⨝ orders (replicated) with
    * revenue per priority — results identical to the unsalted join, which
    * is exactly what the oracle asserts. Exact integer money space, as in
    * q4. */
  def q18SaltedJoin(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val li = graft.Tables(s, dir, "lineitem")
      .withColumn("rev_e4",
        Exact.e2(col("l_extendedprice")) *
          (lit(100L) - Exact.e2(col("l_discount"))))
    val orders = graft.Tables(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"))
    // saltParts = 4: enough to demonstrate hot-key spreading while
    // keeping the deliberate build-side replication cost (the contrast
    // case vs q20's hot-key-only form) near the 2x bench budget.
    saltedEquiJoin(li, orders, "l_orderkey", "o_orderkey", saltParts = 4)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        (sum(col("rev_e4")) / lit(10000.0)).as("revenue"))
  }

  val oracle: String =
    """SELECT o_orderpriority,
      |  count(*) AS n_items,
      |  sum(CAST(round(l_extendedprice * 100) AS BIGINT)
      |    * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0 AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1""".stripMargin

  /** R20 gate query: hot-key-only salting on the same join — identical
    * results to the plain join, different aggregation so q18/q20 stay
    * distinguishable. Threshold 5 makes some lineitem orderkeys "hot"
    * (~4 rows/key average) so both the salted and plain paths carry
    * rows. */
  def q20HotKeySaltedJoin(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val li = graft.Tables(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
    val orders = graft.Tables(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"))
    saltedHotKeyJoin(li, orders, "l_orderkey", "o_orderkey",
      saltParts = 4, hotThreshold = 5)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_items"), round(sum(col("l_quantity")), 2).as("total_qty"))
  }

  val hotKeyOracle: String =
    """SELECT o_orderstatus, count(*) AS n_items,
      |  round(sum(l_quantity), 2) AS total_qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1""".stripMargin
}
