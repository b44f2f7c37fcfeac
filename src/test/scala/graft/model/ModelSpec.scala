package graft.model

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Semantics of the model subsystem (SURVEY §2.1 M1–M11). Behaviours
  * pinned to the reference: schema derivation incl. inheritance/nesting/
  * multiplicity/docs (Legend.scala:433-502, LegendEntityTest.scala:75-88),
  * expectations (Legend.scala:515-595), validation (package.scala:33-51),
  * service SQL (Legend.scala:105-152). */
class ModelSpec extends SparkTestBase {

  import spark.implicits._

  lazy val model: GraftModel = ModelQueries.model

  // A model exercising nesting, arrays, enums, docs in one place.
  lazy val nestedModel: GraftModel = ModelLoader.fromJson(
    """{
      |"enums": [{"name": "x::Color", "values": ["RED", "BLUE"]}],
      |"classes": [
      |  {"name": "x::Address", "doc": "An address",
      |   "properties": [
      |     {"name": "street", "type": "String", "multiplicity": "[1]"},
      |     {"name": "zip", "type": "String", "multiplicity": "[0..1]"}]},
      |  {"name": "x::Person",
      |   "properties": [
      |     {"name": "name", "type": "String", "multiplicity": "[1]", "doc": "Full name"},
      |     {"name": "home", "type": "x::Address", "multiplicity": "[0..1]"},
      |     {"name": "offices", "type": "x::Address", "multiplicity": "[0..*]"},
      |     {"name": "favorite", "type": "x::Color", "multiplicity": "[0..1]"},
      |     {"name": "nicknames", "type": "String", "multiplicity": "[1..3]"}]}
      |]}""".stripMargin)

  test("M1: multiplicity parsing") {
    assert(Multiplicity.parse("[1]") == Multiplicity(1, Some(1)))
    assert(Multiplicity.parse("[0..1]") == Multiplicity.ZeroOrOne)
    assert(Multiplicity.parse("[0..*]") == Multiplicity.ZeroMany)
    assert(Multiplicity.parse("[2..5]") == Multiplicity(2, Some(5)))
    assertThrows[IllegalArgumentException](Multiplicity.parse("1..2"))
    assert(Multiplicity.parse("[1..3]").isCollection)
    assert(!Multiplicity.parse("[0..1]").isCollection)
  }

  test("M1: JSON loader parses classes, enums, mappings, services") {
    assert(model.classes.contains("tpch::Customer"))
    assert(model.enums("tpch::Segment").values.size == 5)
    assert(model.mappings.contains("tpch::mapping::Customer"))
    assert(model.services.contains("tpch::service::SegmentStats"))
    // inheritance resolved, supertype properties first (reference order)
    assert(model.allProperties("tpch::Customer").map(_.name) ==
      Seq("name", "nationKey", "custKey", "acctBal", "mktSegment"))
  }

  test("M2: schema derivation — nullability, arrays, nesting, enum, comments") {
    val s = SchemaGen.schemaOf(nestedModel, "x::Person")
    assert(s.fieldNames.toSeq == Seq("name", "home", "offices", "favorite", "nicknames"))
    assert(!s("name").nullable && s("name").metadata.getString("comment") == "Full name")
    // [0..1] class-typed -> nullable struct
    assert(s("home").nullable)
    assert(s("home").dataType.isInstanceOf[StructType])
    val home = s("home").dataType.asInstanceOf[StructType]
    assert(!home("street").nullable && home("zip").nullable)
    // [0..*] class-typed -> array of struct
    assert(s("offices").dataType.isInstanceOf[ArrayType])
    assert(s("offices").dataType.asInstanceOf[ArrayType].elementType.isInstanceOf[StructType])
    // enum -> string
    assert(s("favorite").dataType == StringType)
    // [1..3] -> non-nullable array
    assert(s("nicknames").dataType.isInstanceOf[ArrayType] && !s("nicknames").nullable)
  }

  test("M2: mapping schema renames fields to table columns") {
    val s = SchemaGen.schemaOfMapping(model, "tpch::mapping::Customer")
    assert(s.fieldNames.toSeq ==
      Seq("c_name", "c_nationkey", "c_custkey", "c_acctbal", "c_mktsegment"))
    assert(s("c_name").metadata.getString("comment") == "Legal name")
  }

  test("M3+M4: expectations — mandatory, collection size, enum domain, business") {
    val rules = Expectations.forClass(nestedModel, "x::Person").toMap
    assert(rules("[name] is mandatory") == "name IS NOT NULL")
    assert(rules("[nicknames] has invalid size").contains("SIZE(nicknames) BETWEEN 1 AND 3"))
    assert(rules("[favorite] not allowed value").contains("favorite IN ('RED', 'BLUE')"))
    // nested non-collection class rules use dotted paths
    assert(rules.contains("[home.street] is mandatory"))
    val cust = Expectations.forMapping(model, "tpch::mapping::Customer").toMap
    assert(cust("positive account balance").contains("c_acctbal"))
    assert(cust("[name] is mandatory").contains("c_name"))
  }

  test("M5: validator appends violations array; null rule counts as violated") {
    val df = Seq[(String, java.lang.Double)](
      ("Customer#1", 10.0),   // clean
      ("Customer#2", -5.0),   // violates balance rule
      ("bogus", 1.0),         // violates name format
      (null, null)            // nulls: mandatory + null-balance rule
    ).toDF("name", "bal")
    val rules = Seq(
      "[name] is mandatory" -> "name IS NOT NULL",
      "positive balance" -> "bal >= 0.0",
      "name format" -> "name LIKE 'Customer#%'")
    val out = Validator.validate(df, rules).select("graft_violations").as[Seq[String]].collect()
    assert(out(0).isEmpty)
    assert(out(1) == Seq("positive balance"))
    assert(out(2) == Seq("name format"))
    // NULL rule result counts as a violation (can't prove compliance)
    assert(out(3).toSet == Set("[name] is mandatory", "positive balance", "name format"))
    assert(Validator.clean(df, rules).count() == 1)
    assert(Validator.quarantine(df, rules).count() == 3)
  }

  test("M6: transformer renames are a lossless round trip") {
    val m = model.mapping("tpch::mapping::Customer")
    val table = graft.Tables(spark, sfDir, "customer")
    val entity = Transformer.toEntity(table, m)
    assert(entity.columns.toSet ==
      Set("name", "nationKey", "custKey", "acctBal", "mktSegment"))
    assert(Transformer.toTable(entity, m).columns.sorted.toSeq ==
      table.columns.sorted.toSeq)
  }

  test("M7: derivations evaluate model expressions") {
    val m = model.mapping("tpch::mapping::Customer")
    val df = Transformer.withDerivations(
      Transformer.toEntity(graft.Tables(spark, sfDir, "customer"), m), model, m.entity)
    val row = df.filter(col("acctBal") >= 5000).select("balanceBand", "nameLen", "name").head()
    assert(row.getString(0) == "HIGH")
    assert(row.getInt(1) == row.getString(2).length)
  }

  test("M8: service SQL compiles to table space and runs") {
    val sql = ServiceGen.serviceSql(model, "tpch::service::SegmentStats")
    assert(sql.contains("FROM customer"))
    assert(sql.contains("c_mktsegment"))       // entity attr rewritten
    assert(sql.contains("AS numCustomers"))
    assert(sql.contains("ORDER BY numCustomers DESC"))
    assert(sql.contains("LIMIT 3"))
    assert(!sql.contains("mktSegment AS"))     // no entity names leak into projection
    graft.Tables(spark, sfDir, "customer").createOrReplaceTempView("customer")
    val out = ServiceGen.runService(spark, model, "tpch::service::SegmentStats")
    assert(out.columns.toSeq == Seq("segment", "numCustomers", "avgBal"))
    assert(out.count() == 3)
  }

  test("M8: mapping SQL projects entity names and pushes expectations to WHERE") {
    val sql = ServiceGen.mappingSql(model, "tpch::mapping::Customer")
    assert(sql.contains("c_name AS name"))
    assert(sql.contains("AS balanceBand"))     // derivations included
    assert(sql.contains("WHERE"))
    assert(sql.contains("c_acctbal"))          // business rule in table space
  }

  /** The delta branches execute against [[graft.testdelta.DeltaishCatalog]]
    * (r15): an in-memory DSv2 catalog supporting group-based row-level
    * operations — the same connector contracts Delta implements — so the
    * dispatch path (availability probe → DDL with USING delta →
    * `MERGE INTO` SQL) runs END TO END here, with only real-Delta
    * semantics (log, time travel) out of scope per the BASELINE
    * infeasibility note. Tables live under an explicit catalog prefix;
    * the parquet branches keep exercising the session catalog. */
  private def deltaTable(name: String): String = {
    spark.conf.set("spark.sql.catalog.graft_delta",
      classOf[graft.testdelta.DeltaishCatalog].getName)
    s"graft_delta.default.$name"
  }

  // format-parameterized M9: the DDL/dispatch plumbing is identical for
  // every TableFormat; execution runs for each format the session can
  // actually execute (parquet in the session catalog; delta through the
  // row-level-ops test catalog)
  for (format <- Seq("parquet", "delta"))
    test(s"M9: table DDL carries comments; create+write+read round trip [$format]") {
      val fmt = TableFormat.forName(format)
      val ddl = TableGen.ddl(model, "tpch::mapping::Customer", format)
      assert(ddl.contains("CREATE TABLE IF NOT EXISTS customer"))
      assert(ddl.contains("COMMENT 'Legal name'"))
      assert(ddl.contains(s"USING $format"))
      assume(fmt.available(spark), s"$format jars not on this classpath")
      val tbl = if (format == "delta") deltaTable("graft_m9_tmp") else "graft_m9_tmp"
      val tmpModel = model.copy(mappings = model.mappings +
        ("tmp" -> model.mapping("tpch::mapping::Customer").copy(table = tbl)))
      try {
        TableGen.create(spark, tmpModel, "tmp", format)
        val src = graft.Tables(spark, sfDir, "customer").limit(5)
        TableGen.write(src, tmpModel, "tmp")
        assert(spark.table(tbl).count() == 5)
      } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
    }

  // format-parameterized M14 like M9: parquet always executes; the delta
  // branch delegates to real MERGE INTO and cancels without delta jars
  for (format <- Seq("parquet", "delta"))
    test(s"M14: SCD-1 merge round trip - insert, update, no-op rows [$format]") {
      val fmt = TableFormat.forName(format)
      assume(fmt.available(spark), s"$format jars not on this classpath")
      val tbl = if (format == "delta") deltaTable("graft_m14_tmp") else "graft_m14_tmp"
      val tmpModel = model.copy(mappings = model.mappings +
        ("tmp" -> model.mapping("tpch::mapping::Customer").copy(table = tbl)))
      try {
        TableGen.create(spark, tmpModel, "tmp", format)
        val src = graft.Tables(spark, sfDir, "customer")
          .orderBy("c_custkey").limit(5)
        TableGen.write(src, tmpModel, "tmp")
        val before = spark.table(tbl).collect()
          .map(r => r.getAs[Long]("c_custkey") -> r).toMap
        val keys = before.keySet.toSeq.sorted
        // source: update rows for keys(0), keys(1); insert one new key;
        // keys(2..4) untouched (no-op)
        val updates = spark.table(tbl)
          .filter(org.apache.spark.sql.functions.col("c_custkey").isin(keys(0), keys(1)))
          .withColumn("c_acctbal", org.apache.spark.sql.functions.lit(9999.25))
          .localCheckpoint() // detach from the table before it is rewritten
        val insert = graft.Tables(spark, sfDir, "customer")
          .orderBy(org.apache.spark.sql.functions.col("c_custkey").desc).limit(1)
          .withColumn("c_custkey", org.apache.spark.sql.functions.lit(999999L))
        TableGen.merge(spark, tmpModel, "tmp", updates.unionByName(insert), Seq("c_custkey"), format)
        val after = spark.table(tbl).collect()
          .map(r => r.getAs[Long]("c_custkey") -> r).toMap
        assert(after.size == 6) // 5 originals + 1 insert
        assert(after(keys(0)).getAs[Double]("c_acctbal") == 9999.25)
        assert(after(keys(1)).getAs[Double]("c_acctbal") == 9999.25)
        assert(after.contains(999999L))
        // no-op rows byte-identical
        for (k <- keys.drop(2)) assert(after(k) == before(k))
      } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
    }

  test("M14: merge honors reliable-checkpoint mode; refusal leaves the table untouched") {
    // r18 audit: the merge's pre-overwrite materialization is
    // merged-table-sized and load-bearing for durability (the overwrite
    // deletes the files it was computed from), so it now routes through
    // the same checkpoint-mode policy as the dedup chain. Receipts:
    // (a) mode on + no dir → loud refusal BEFORE any write, table
    // byte-identical; (b) mode on + dir → correct merge with ZERO new
    // block-manager RDDs and real checkpoint files.
    val tmpModel = model.copy(mappings = model.mappings +
      ("tmp" -> model.mapping("tpch::mapping::Customer").copy(table = "graft_m14_rel")))
    spark.conf.set(graft.dedup.Dedup.ReliableCheckpointKey, "true")
    try {
      TableGen.create(spark, tmpModel, "tmp")
      TableGen.write(graft.Tables(spark, sfDir, "customer")
        .orderBy("c_custkey").limit(5), tmpModel, "tmp")
      val before = spark.table("graft_m14_rel").collect()
        .map(r => r.getAs[Long]("c_custkey") -> r).toMap
      val src = spark.table("graft_m14_rel").limit(1)
        .withColumn("c_acctbal", org.apache.spark.sql.functions.lit(4321.5))
        .localCheckpoint()
      spark.sparkContext.setCheckpointDir(null)
      val ex = intercept[IllegalArgumentException] {
        TableGen.merge(spark, tmpModel, "tmp", src, Seq("c_custkey"))
      }
      assert(ex.getMessage.contains("setCheckpointDir"))
      val unchanged = spark.table("graft_m14_rel").collect()
        .map(r => r.getAs[Long]("c_custkey") -> r).toMap
      assert(unchanged == before, "refused merge must not touch the table")

      val dir = java.nio.file.Files.createTempDirectory("graft_merge_ckpt").toString
      spark.sparkContext.setCheckpointDir(dir)
      val persistedBefore = spark.sparkContext.getPersistentRDDs.keySet
      TableGen.merge(spark, tmpModel, "tmp", src, Seq("c_custkey"))
      assert((spark.sparkContext.getPersistentRDDs.keySet -- persistedBefore).isEmpty,
        "reliable-mode merge must not pin block-manager state")
      def files(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles.map(files).sum
        else if (f.isFile && f.length > 0) 1L else 0L
      assert(files(new java.io.File(dir)) > 0,
        "reliable-mode merge must write checkpoint files")
      val after = spark.table("graft_m14_rel").collect()
        .map(r => r.getAs[Long]("c_custkey") -> r).toMap
      assert(after.size == before.size)
      assert(after.values.count(_.getAs[Double]("c_acctbal") == 4321.5) == 1)
    } finally {
      spark.conf.unset(graft.dedup.Dedup.ReliableCheckpointKey)
      spark.sql("DROP TABLE IF EXISTS graft_m14_rel")
    }
  }

  test("M14: partitioned merge rewrites ONLY touched partitions") {
    val tmpModel = model.copy(mappings = model.mappings +
      ("tmp" -> model.mapping("tpch::mapping::Customer").copy(table = "graft_m14_part")))
    val warehouse = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), "graft_m14_part")
    def rmDir(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmDir)
      f.delete(); ()
    }
    rmDir(warehouse)
    try {
      TableGen.create(spark, tmpModel, "tmp", partitionBy = Seq("c_mktsegment"))
      TableGen.write(graft.Tables(spark, sfDir, "customer").limit(40), tmpModel, "tmp")
      def filesOf(segment: String): Set[String] = {
        val dir = new java.io.File(warehouse, s"c_mktsegment=$segment")
        Option(dir.listFiles()).fold(Set.empty[String])(
          _.map(_.getName).filter(_.endsWith(".parquet")).toSet)
      }
      val segments = spark.table("graft_m14_part")
        .select("c_mktsegment").distinct()
        .collect().map(_.getString(0)).sorted
      assert(segments.length >= 2, "test needs at least two partitions")
      val (hot, cold) = (segments.head, segments.last)
      val coldBefore = filesOf(cold)
      assert(coldBefore.nonEmpty)
      // merge one updated row inside `hot` only
      val src = spark.table("graft_m14_part")
        .filter(org.apache.spark.sql.functions.col("c_mktsegment") === hot)
        .limit(1)
        .withColumn("c_acctbal", org.apache.spark.sql.functions.lit(1234.5))
        .localCheckpoint()
      val nBefore = spark.table("graft_m14_part").count()
      TableGen.merge(spark, tmpModel, "tmp", src, Seq("c_custkey"))
      assert(spark.table("graft_m14_part").count() == nBefore)
      // untouched partition's files were not rewritten (names unchanged —
      // any rewrite produces fresh task UUID filenames)
      assert(filesOf(cold) == coldBefore, "cold partition was rewritten")
      assert(filesOf(hot).nonEmpty)
      val updated = spark.table("graft_m14_part")
        .filter(org.apache.spark.sql.functions.col("c_acctbal") === 1234.5).count()
      assert(updated == 1)
    } finally spark.sql("DROP TABLE IF EXISTS graft_m14_part")
  }

  test("M14: validatePartitionStability rejects a key that moves partitions, before writing") {
    val tmpModel = model.copy(mappings = model.mappings +
      ("tmp" -> model.mapping("tpch::mapping::Customer").copy(table = "graft_m14_stab")))
    try {
      TableGen.create(spark, tmpModel, "tmp", partitionBy = Seq("c_mktsegment"))
      TableGen.write(graft.Tables(spark, sfDir, "customer").limit(20), tmpModel, "tmp")
      val segments = spark.table("graft_m14_stab")
        .select("c_mktsegment").distinct().collect().map(_.getString(0)).sorted
      assert(segments.length >= 2)
      // source row keeps its key but flips the partition column — the
      // stale copy would survive in the old partition
      val moved = spark.table("graft_m14_stab")
        .filter(org.apache.spark.sql.functions.col("c_mktsegment") === segments.head)
        .limit(1)
        .withColumn("c_mktsegment", org.apache.spark.sql.functions.lit(segments.last))
        .localCheckpoint()
      val before = spark.table("graft_m14_stab").collect().toSet
      val e = intercept[IllegalArgumentException] {
        TableGen.merge(spark, tmpModel, "tmp", moved, Seq("c_custkey"),
          validatePartitionStability = true)
      }
      assert(e.getMessage.contains("across"), e.getMessage)
      // nothing was written
      assert(spark.table("graft_m14_stab").collect().toSet == before)
      // a partition-stable source under the same flag merges fine
      val stable = spark.table("graft_m14_stab").limit(1)
        .withColumn("c_acctbal", org.apache.spark.sql.functions.lit(77.5))
        .localCheckpoint()
      TableGen.merge(spark, tmpModel, "tmp", stable, Seq("c_custkey"),
        validatePartitionStability = true)
      assert(spark.table("graft_m14_stab")
        .filter(org.apache.spark.sql.functions.col("c_acctbal") === 77.5).count() == 1)
      // a partition column that is ITSELF a merge key cannot move — the
      // check must pass trivially, not crash on the duplicated column
      val keyed = spark.table("graft_m14_stab").limit(1)
        .withColumn("c_acctbal", org.apache.spark.sql.functions.lit(88.25))
        .localCheckpoint()
      TableGen.merge(spark, tmpModel, "tmp", keyed,
        Seq("c_custkey", "c_mktsegment"), validatePartitionStability = true)
      assert(spark.table("graft_m14_stab")
        .filter(org.apache.spark.sql.functions.col("c_acctbal") === 88.25).count() == 1)
    } finally spark.sql("DROP TABLE IF EXISTS graft_m14_stab")
  }

  test("join orientation: self-association and bare-name collisions reject loudly") {
    // true self-join: both sides are the same table
    val self = GraftJoinDef("ManagerOf", "default.person", "manager_id",
      "default.person", "person_id")
    val e1 = intercept[IllegalArgumentException] { self.orient("person") }
    assert(e1.getMessage.contains("ambiguous"), e1.getMessage)
    // two schemas sharing a bare table name: qualified probes resolve,
    // a bare probe is ambiguous and must not silently pick the left side
    val cross = GraftJoinDef("X", "s1.t", "a", "s2.t", "b")
    assert(cross.orient("s1.t").contains(("a", "b")))
    assert(cross.orient("s2.t").contains(("b", "a")))
    val e2 = intercept[IllegalArgumentException] { cross.orient("t") }
    assert(e2.getMessage.contains("ambiguous"), e2.getMessage)
    // the unambiguous bare fallback still works (mainTable is often unqualified)
    val plain = GraftJoinDef("OC", "default.orders", "o_custkey",
      "default.customer", "c_custkey")
    assert(plain.orient("orders").contains(("o_custkey", "c_custkey")))
    assert(plain.orient("nation").isEmpty)
  }

  test("M9: write aligns to the STORED schema when the partition column is not last") {
    // partition by c_nationkey — a MIDDLE mapping column. Spark moves
    // partition columns to the END of a datasource table's stored
    // schema; positional insertInto against mapping-declaration order
    // would silently swap columns.
    val tmpModel = model.copy(mappings = model.mappings +
      ("tmp" -> model.mapping("tpch::mapping::Customer").copy(table = "graft_m9_mid")))
    def rmDir(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmDir)
      f.delete(); ()
    }
    rmDir(new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), "graft_m9_mid"))
    try {
      TableGen.create(spark, tmpModel, "tmp", partitionBy = Seq("c_nationkey"))
      val src = graft.Tables(spark, sfDir, "customer").limit(20).localCheckpoint()
      TableGen.write(src, tmpModel, "tmp")
      val names = spark.table("graft_m9_mid").columns.toSeq
      def keyed(df: org.apache.spark.sql.DataFrame) = df
        .select(names.map(org.apache.spark.sql.functions.col): _*)
        .collect().map(r => r.getAs[Long]("c_custkey") -> r.getValuesMap[Any](names)).toMap
      assert(keyed(spark.table("graft_m9_mid")) == keyed(src))
    } finally spark.sql("DROP TABLE IF EXISTS graft_m9_mid")
  }

  test("M9: an unavailable format fails fast with its name, before any DDL") {
    // r15: the test classpath now carries the DeltaCatalog probe marker,
    // so unavailability is exercised through the operational kill-switch
    // (graft.format.disable) rather than the bare classpath — the same
    // require path either way
    spark.conf.set("graft.format.disable", "delta")
    try {
      assert(!TableFormat.Delta.available(spark))
      val e = intercept[IllegalArgumentException] {
        TableGen.create(spark, model, "tpch::mapping::Customer", "delta")
      }
      assert(e.getMessage.contains("delta"))
    } finally spark.conf.unset("graft.format.disable")
    assert(TableFormat.Delta.available(spark), "probe marker must be on the test classpath")
    // r16 (advisory): the probe FQCN is Delta's real plugin name — assert
    // the class the probe actually loads is OUR test marker (it exposes
    // the GraftTestMarker tag), so an accidental real delta-spark test
    // dependency fails loudly instead of silently shadowing the marker
    // and making probe results depend on classpath order.
    val loaded = Class.forName("org.apache.spark.sql.delta.catalog.DeltaCatalog$")
    val tag = scala.util.Try(
      loaded.getMethod("GraftTestMarker")
        .invoke(loaded.getField("MODULE$").get(null)))
    assert(tag == scala.util.Success(true),
      s"the loaded DeltaCatalog is not graft's test marker (got $tag) — " +
        "a real delta-spark jar is shadowing it on the test classpath")
    // generic formats pass through the seam unprobed
    assert(TableFormat.forName("orc") == TableFormat.Passthrough("orc"))
    assert(TableGen.ddl(model, "tpch::mapping::Customer", "orc").contains("USING orc"))
  }

  test("M9: partitioned governed table prunes partitions on read") {
    val tmpModel = model.copy(mappings = model.mappings +
      ("tmp" -> model.mapping("tpch::mapping::Customer").copy(table = "graft_m9_part")))
    def rmDir(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmDir)
      f.delete(); ()
    }
    rmDir(new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), "graft_m9_part"))
    try {
      val ddl = TableGen.ddl(model, "tpch::mapping::Customer",
        partitionBy = Seq("c_mktsegment"))
      assert(ddl.contains("PARTITIONED BY (c_mktsegment)"))
      // unknown partition column fails fast, before any DDL runs
      intercept[IllegalArgumentException] {
        TableGen.ddl(model, "tpch::mapping::Customer", partitionBy = Seq("nope"))
      }
      TableGen.create(spark, tmpModel, "tmp", partitionBy = Seq("c_mktsegment"))
      TableGen.write(graft.Tables(spark, sfDir, "customer").limit(40), tmpModel, "tmp")
      val read = spark.table("graft_m9_part")
        .filter(org.apache.spark.sql.functions.col("c_mktsegment") === "BUILDING")
      assert(read.count() > 0)
      val scan = read.queryExecution.executedPlan.toString
      // the filter must prune DIRECTORIES (partition filter), not rows
      assert(scan.contains("PartitionFilters: [") && scan.contains("c_mktsegment"),
        s"expected partition pruning in:\n$scan")
    } finally spark.sql("DROP TABLE IF EXISTS graft_m9_part")
  }

  test("M10: reverse codegen emits classes, store, and mappings") {
    val schema = StructType(Seq(
      StructField("user_id", LongType, nullable = false),
      StructField("user_name", StringType, nullable = true,
        new MetadataBuilder().putString("comment", "the name").build()),
      StructField("scores", ArrayType(IntegerType), nullable = true),
      StructField("address", StructType(Seq(
        StructField("street", StringType), StructField("zip", StringType))))))
    val txt = PureGen.fromSchema("org::test", "db", "user_table", schema)
    assert(txt.contains("Class org::test::classes::UserTable"))
    // nested struct -> Base / Serializable split
    assert(txt.contains("Class org::test::classes::UserTableBase"))
    assert(txt.contains("Class org::test::classes::UserTableSerializable extends"))
    assert(txt.contains("userId: Number[1];"))
    assert(txt.contains("{meta::pure::profiles::doc.doc = 'the name'} userName: String[0..1];"))
    assert(txt.contains("scores: Integer[0..*];"))
    assert(txt.contains("Database org::test::Store"))
    assert(txt.contains("Table user_table"))
    assert(txt.contains("Mapping org::test::mapping::UserTable"))
    assert(PureGen.camelCaseEntity("user_table") == "UserTable")
    assert(PureGen.camelCaseField("user_name") == "userName")
    assertThrows[IllegalArgumentException](
      PureGen.fromSchema("BadNamespace", "db", "t", schema))
  }

  test("M10: catalog-walking codegen covers every table of a database") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_m10_db")
    try {
      graft.Tables(spark, sfDir, "region")
        .write.mode("overwrite").saveAsTable("graft_m10_db.region_tbl")
      graft.Tables(spark, sfDir, "nation")
        .write.mode("overwrite").saveAsTable("graft_m10_db.nation_tbl")
      val txt = PureGen.fromDatabase(spark, "org::test", "graft_m10_db")
      assert(txt.contains("Class org::test::classes::RegionTbl"))
      assert(txt.contains("Class org::test::classes::NationTbl"))
      assert(txt.contains("Table region_tbl") && txt.contains("Table nation_tbl"))
      assert(txt.contains("Mapping org::test::mapping::NationTbl"))
      // deterministic: nation_tbl sorts (and therefore renders) first
      assert(txt.indexOf("Table nation_tbl") < txt.indexOf("Table region_tbl"))
      assertThrows[IllegalArgumentException](
        PureGen.fromDatabase(spark, "org::test", "graft_no_such_db"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_m10_db.region_tbl")
      spark.sql("DROP TABLE IF EXISTS graft_m10_db.nation_tbl")
      spark.sql("DROP DATABASE IF EXISTS graft_m10_db")
    }
  }

  test("M11: full pipeline lift -> validate -> derive in one plan") {
    val p = GraftPipeline(model, "tpch::mapping::Orders")
    val out = p.derive(p.validate(graft.Tables(spark, sfDir, "orders")))
    assert(out.columns.contains("graft_violations"))
    assert(out.columns.contains("orderYear"))
    assert(out.columns.contains("highValue"))
    // derived orderYear must agree with year() of the source column
    assert(out.filter(col("orderYear") =!= year(col("o_orderdate"))).count() == 0)
    // schema-enforced entity read path
    assert(p.entitySchema.fieldNames.contains("orderKey"))
  }

  test("M1: entityNames lists all addressable names; directory loader merges files") {
    assert(model.entityNames.contains("tpch::Customer"))
    assert(model.entityNames.contains("tpch::Segment"))
    assert(model.entityNames.contains("tpch::mapping::Orders"))
    assert(model.entityNames.contains("tpch::service::SegmentStats"))
    val dir = java.nio.file.Files.createTempDirectory("graft-models")
    java.nio.file.Files.writeString(dir.resolve("a.json"),
      """{"classes": [{"name": "d::A", "properties": [{"name": "x", "type": "String"}]}]}""")
    java.nio.file.Files.writeString(dir.resolve("b.json"),
      """{"enums": [{"name": "d::E", "values": ["V"]}]}""")
    val merged = ModelLoader.fromDirectory(dir.toString)
    assert(merged.entityNames == Set("d::A", "d::E"))
  }

  test("M11: end-to-end mirror of the reference pipeline on raw JSON") {
    // mirrors LegendSparkTest.scala:42-72: schema-enforced READ of raw
    // entity-space records -> TRANSFORM -> VALIDATE -> count violations
    // by rule -> DERIVE
    val p = GraftPipeline(model, "tpch::mapping::Customer")
    val dir = java.nio.file.Files.createTempDirectory("graft-json")
    java.nio.file.Files.writeString(dir.resolve("customers.json"),
      """{"name": "Customer#001", "nationKey": 1, "custKey": 1, "acctBal": 100.5, "mktSegment": "BUILDING"}
        |{"name": "Customer#002", "nationKey": 2, "custKey": 2, "acctBal": -7.0, "mktSegment": "MACHINERY"}
        |{"name": "wrong", "nationKey": 3, "custKey": 3, "acctBal": 1.0, "mktSegment": "BUILDING"}
        |{"name": "Customer#004", "nationKey": 4, "custKey": 4, "acctBal": 9000.0, "mktSegment": "SAILBOATS"}
        |""".stripMargin)
    val bronze = p.read(spark, "json", dir.toString)
    // file sources force nullable=true; names/types come from the model
    // (null enforcement is validation's job, as in the reference)
    assert(bronze.schema.fields.map(f => f.name -> f.dataType).toSeq ==
      p.entitySchema.fields.map(f => f.name -> f.dataType).toSeq)
    val gold = p.derive(p.validate(p.transform(bronze)))
    val byRule = gold.select(explode(col("graft_violations")).as("rule"))
      .groupBy("rule").count()
      .as[(String, Long)].collect().toMap
    assert(byRule == Map(
      "positive account balance" -> 1L,
      "customer name format" -> 1L,
      "[mktSegment] not allowed value" -> 1L))
    // derivations applied in the same plan
    assert(gold.filter(col("balanceBand") === "NEGATIVE").count() == 1)
    assert(p.clean(p.transform(bronze)).count() == 1)
  }

  test("M3: Try-based compile surfaces bad constraints without failing the rest") {
    val broken = ModelLoader.fromJson(
      """{"classes": [{"name": "x::B",
        |  "properties": [{"name": "v", "type": "Integer", "multiplicity": "[1]"}],
        |  "constraints": [
        |    {"name": "ok rule", "expr": "v > 0"},
        |    {"name": "bad rule", "expr": "v >>>> 0"}]}]}""".stripMargin)
    val compiled = Expectations.compiledForClass(broken, "x::B")
    assert(compiled("ok rule").isSuccess)
    assert(compiled("bad rule").isFailure)
    assert(compiled("[v] is mandatory").isSuccess)
  }

  test("schema drift: missing/extra/type/nullability divergences detected") {
    import org.apache.spark.sql.types._
    val expected = SchemaGen.schemaOfMapping(model, "tpch::mapping::Customer")
    // actual table: c_name dropped, c_acctbal became string, extra col
    val actual = StructType(Seq(
      StructField("c_nationkey", IntegerType, nullable = true),
      StructField("c_custkey", LongType, nullable = false),
      StructField("c_acctbal", StringType, nullable = true),
      StructField("c_mktsegment", StringType, nullable = true),
      StructField("c_extra", StringType, nullable = true)))
    val drifts = SchemaDiff.diff(expected, actual)
    val byField = drifts.groupBy(_.field)
    assert(byField("c_name").map(_.kind) == Seq(SchemaDiff.MissingColumn))
    assert(byField("c_extra").map(_.kind) == Seq(SchemaDiff.UnexpectedColumn))
    assert(byField("c_acctbal").map(_.kind) == Seq(SchemaDiff.TypeMismatch))
    assert(byField("c_nationkey").map(_.kind).contains(SchemaDiff.NullabilityWeakened))
    assert(!SchemaDiff.conforms(model, "tpch::mapping::Customer", actual))
    // the real table conforms
    val real = graft.Tables(spark, sfDir, "customer").schema
    assert(SchemaDiff.conforms(model, "tpch::mapping::Customer", real))
  }

  test("SqlRewrite renames only mapped attribute heads") {
    val out = SqlRewrite.rename("acctBal >= 0.0 AND other.x = 1",
      Map("acctBal" -> "c_acctbal"))
    assert(out.contains("c_acctbal"))
    assert(out.contains("other.x"))
    assertThrows[Exception](SqlRewrite.validateSyntax("SELECT FROM WHERE"))
  }
}
