package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the driver-generated TPC-H-ish testdata.
  *
  * All operators take their inputs from here; at cluster scale the same
  * call sites would point at a catalog / object-store path, so nothing
  * below assumes local files beyond the path string.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") normalizeEventsTs(spark.read.parquet(s"$dir/$name.parquet"))
    else spark.read.parquet(s"$dir/$name.parquet")

  /** events.ts has shipped as both TIMESTAMP(NANOS) (read as long nanos
    * via spark.sql.legacy.parquet.nanosAsLong, set once in GraftSession)
    * and TIMESTAMP(MICROS, isAdjustedToUTC=false) (inferred as NTZ).
    * Branch on the type actually read so either generation of the data
    * works; shared with the streaming specs so test and production
    * normalization cannot drift. The nanos path converts exactly
    * (integer DIV — a double division would lose precision above 2^53
    * ns); the NTZ cast is instant-exact because the session tz is pinned
    * to UTC. Both paths land on TimestampType, the type every downstream
    * consumer (unix_micros, watermarks, windows) compiles against. */
  def normalizeEventsTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts DIV 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", org.apache.spark.sql.functions.col("ts")
          .cast(org.apache.spark.sql.types.TimestampType))
      case org.apache.spark.sql.types.TimestampType => df
      case other =>
        // a THIRD physical encoding must fail here, loudly and named —
        // not flow downstream to surface as opaque per-query errors
        // (the exact failure mode of the r9 testdata re-encode)
        throw new IllegalStateException(
          s"events.ts read as unexpected type $other (expected LONG nanos, " +
            "TIMESTAMP_NTZ, or TIMESTAMP) — the testdata encoding drifted " +
            "again; extend Tables.normalizeEventsTs with an exact conversion")
    }
}
