package graft

/** Differential execution sweep: every gate query, default plan vs
  * codegen forced OFF (`wholeStage=false` + `factoryMode=NO_CODEGEN`).
  *
  * The DuckDB oracle catches semantic drift against another engine; this
  * catches drift WITHIN the engine between the two execution paths every
  * native kernel ships — `doGenCode` (the production path) and `eval`
  * (the fallback Spark uses under interpreted mode, in `Literal.create`,
  * in constant folding, and wherever codegen is unavailable). TextSpec
  * pins individual kernels against the composable forms they replaced;
  * this sweeps the COMPOSED queries end-to-end, so a divergence anywhere
  * in DotProduct / NearestCentroids / CountInSet / Shingles / TokenChunks
  * / CharClassCount / TermCounts / TokenCount / LexerTokenCount /
  * JsonGetInt — or in how they interact under a whole plan — fails here
  * with the query named.
  */
class DifferentialSpec extends SparkTestBase {

  private def normalize(v: Any): Any = v match {
    case null => "NULL"
    case d: Double => if (d.isNaN) "NaN" else BigDecimal(d).setScale(9, BigDecimal.RoundingMode.HALF_EVEN)
    case f: Float => normalize(f.toDouble)
    case s: Seq[_] => s.map(normalize)
    case m: scala.collection.Map[_, _] =>
      m.toSeq.map { case (k, x) => (normalize(k), normalize(x)) }.sortBy(_.toString)
    case r: org.apache.spark.sql.Row => r.toSeq.map(normalize)
    case b: Array[Byte] => b.toSeq
    case other => other
  }

  // multiset of normalized rows — a sort key like mkString("|") would be
  // ambiguous (a string cell containing the separator can collide), and
  // collect() order is not comparable across the two executions
  private def rowsOf(name: String): Map[Seq[Any], Int] = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect().toSeq.map(_.toSeq.map(normalize))
      .groupBy(identity).view.mapValues(_.size).toMap
  }

  test("every gate query returns identical rows with codegen forced OFF") {
    val keys = SparkEntry.queries.keys.toSeq.sorted
    val baseline = keys.map(k => k -> rowsOf(k)).toMap
    val saved = Seq("spark.sql.codegen.wholeStage", "spark.sql.codegen.factoryMode")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val diverged = keys.filter(k => rowsOf(k) != baseline(k))
      assert(diverged.isEmpty,
        s"codegen vs interpreted divergence in: ${diverged.mkString(", ")}")
    } finally saved.foreach { case (k, vOpt) =>
      vOpt.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }
}
