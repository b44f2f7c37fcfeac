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

  /** The events-pack deployment layout (r15, promoted from
    * EventsLayoutProbe): the events fact bucketed on `user_id`.
    *
    * Every per-user analytic in the pack — q31 sliding DAU, q32
    * retention, q17 sessions, q30 funnel — starts with a user-keyed
    * aggregate, and on a flat table that aggregate is THE fact-sized
    * Exchange (at 100 TB: the network bottleneck). Bucketing on
    * user_id satisfies the required clustered distribution from disk,
    * so the whole pipeline runs with ZERO fact-sized shuffles; only
    * calendar-bounded day/cohort rows move. This is the layout a
    * production event store keeps anyway (user-keyed ingest, point
    * lookup). Measured at sf100 (32 cores, r15 matched pair): q31
    * 4.80 → 1.29 s, q32 3.88 → 0.95 s — both ahead of the DuckDB
    * baseline on the same host window (4.69 / 1.31 s).
    *
    * Plan contract enforced by BucketedSpec: on the bucketed table
    * neither query's plan may contain a shuffle carrying `user_id`. */
  def writeEventsByUser(events: DataFrame, table: String,
                        numBuckets: Int = 32): Unit =
    writeBucketed(events, table, "user_id", numBuckets)

  /** Join two co-bucketed tables on their bucket keys — shuffle-free
    * when both sides share the bucket count. */
  def coLocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                    leftKey: String, rightKey: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    spark.table(leftTable).join(spark.table(rightTable), col(leftKey) === col(rightKey))
  }
}
