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
    if (name == "events") {
      // events.ts is TIMESTAMP(NANOS) parquet, read as long nanos
      // (spark.sql.legacy.parquet.nanosAsLong is set once in
      // GraftSession) and converted exactly (integer DIV — a double
      // division would lose precision above 2^53 ns).
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts DIV 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")
}
