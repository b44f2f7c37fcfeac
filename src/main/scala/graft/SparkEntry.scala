package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.Relational.queries ++ ops.Sampling.queries ++ model.ModelQueries.queries ++
      model.legend.LegendQueries.queries ++
      text.TextQueries.queries ++ dedup.DedupQueries.queries ++
      sim.SimQueries.queries ++ multimodal.Multimodal.queries ++
      pipelines.CurationQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    ops.Relational.oracles ++ ops.Sampling.oracles ++ model.ModelQueries.oracles ++
      model.legend.LegendQueries.oracles ++
      text.TextQueries.oracles ++ dedup.DedupQueries.oracles ++
      sim.SimQueries.oracles ++ multimodal.Multimodal.oracles ++
      pipelines.CurationQueries.oracles
}
