package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed catalog tables (SURVEY §4) — the persistent form of
  * co-located joins.
  *
  * A fact table bucketed on its join key is pre-shuffled ON DISK: every
  * subsequent join or aggregation on that key reads bucket files
  * straight into correctly-partitioned tasks, eliminating the shuffle
  * that dominates large-join cost. At 100 TB this converts the daily
  * fact⨝fact join from a full-network shuffle into a local merge —
  * bucket pruning also applies to point lookups on the bucket key.
  *
  * Buckets should be sized so one bucket of the LARGEST co-bucketed
  * table fits an executor's memory (numBuckets ≈ table_size /
  * target_partition_size, same power-of-two across co-joined tables).
  * BucketedSpec proves the plan property: joining two co-bucketed tables
  * produces no Exchange on either side. */
object Bucketed {

  /** Write df as a parquet catalog table bucketed (and sorted) on
    * `bucketCol` — sorting within buckets lets SortMergeJoin skip its
    * sort step too. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).format("parquet")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  /** Join two co-bucketed tables on their bucket keys — shuffle-free
    * when both sides share the bucket count. */
  def coLocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                    leftKey: String, rightKey: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    spark.table(leftTable).join(spark.table(rightTable), col(leftKey) === col(rightKey))
  }
}
