package graft

import org.apache.spark.sql.types._

/** Schema-drift alarm for the driver-generated testdata.
  *
  * The testdata is regenerated between rounds and its PHYSICAL types are
  * not stable: events.ts has shipped as TIMESTAMP(NANOS) (reads as long
  * under nanosAsLong) and as TIMESTAMP(MICROS, isAdjustedToUTC=false)
  * (reads as TIMESTAMP_NTZ). The round-9→10 regeneration silently broke
  * every events-based gate query at analysis time because the loader
  * assumed the nanos encoding. This spec pins the LOGICAL schema
  * [[Tables.apply]] must present to operators, independent of the
  * physical encoding — so the next drift fails here, loudly, with the
  * table and column named, instead of as six opaque query failures in
  * the driver's verify log.
  */
class TablesSpec extends SparkTestBase {

  private def normalized(name: String): Map[String, DataType] =
    Tables(spark, sfDir, name).schema.fields.map(f => f.name -> f.dataType).toMap

  test("events normalizes ts to TimestampType under every shipped physical encoding") {
    val s = normalized("events")
    assert(s("ts") == TimestampType, s"events.ts must normalize to TIMESTAMP, got ${s("ts")}")
    assert(s("event_id") == LongType && s("user_id") == LongType)
    assert(s("event_type") == StringType && s("props") == StringType)
    assert(s("value") == DoubleType)
  }

  test("a THIRD unexpected ts encoding fails fast with the type named") {
    import org.apache.spark.sql.functions.col
    val weird = Tables(spark, sfDir, "events").withColumn("ts", col("ts").cast(StringType))
    val ex = intercept[IllegalStateException](Tables.normalizeEventsTs(weird))
    assert(ex.getMessage.contains("events.ts") && ex.getMessage.contains("StringType"))
    // TimestampType itself passes through unchanged
    val ok = Tables.normalizeEventsTs(Tables(spark, sfDir, "events"))
    assert(ok.schema("ts").dataType == TimestampType)
  }

  test("fact/dim tables present the column types operators compile against") {
    val li = normalized("lineitem")
    assert(li("l_orderkey") == LongType && li("l_quantity") == DoubleType)
    assert(li("l_returnflag") == StringType)
    // l_shipdate/o_orderdate: any date-or-timestamp flavor works for the
    // operators (year()/date_trunc() accept all three); pin that much.
    assert(Set[DataType](DateType, TimestampType, TimestampNTZType).contains(li("l_shipdate")),
      s"l_shipdate must be date-like, got ${li("l_shipdate")}")
    val o = normalized("orders")
    assert(o("o_orderkey") == LongType && o("o_totalprice") == DoubleType)
    assert(Set[DataType](DateType, TimestampType, TimestampNTZType).contains(o("o_orderdate")))
    val d = normalized("documents")
    assert(d("doc_id") == LongType && d("text") == StringType && d("lang") == StringType)
    val e = normalized("embeddings")
    assert(e("vec_id") == LongType)
    assert(e("embedding") == ArrayType(FloatType) || e("embedding") == ArrayType(FloatType, true),
      s"embedding must be array<float>, got ${e("embedding")}")
  }

  test("every table in Tables.all loads and is non-empty at sf0.001") {
    Tables.all.foreach { t =>
      val n = Tables(spark, sfDir, t).limit(1).count()
      assert(n > 0, s"table $t is empty or unreadable")
    }
  }
}
