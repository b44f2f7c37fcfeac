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

  private def normalize(v: Any, scale: Int): Any = v match {
    case null => "NULL"
    case d: Double =>
      if (d.isNaN) "NaN"
      else if (d.isInfinite) if (d > 0) "Inf" else "-Inf" // BigDecimal(Infinity) throws
      else BigDecimal(d).setScale(scale, BigDecimal.RoundingMode.HALF_EVEN)
    case f: Float => normalize(f.toDouble, scale)
    case s: Seq[_] => s.map(normalize(_, scale))
    case m: scala.collection.Map[_, _] =>
      m.toSeq.map { case (k, x) => (normalize(k, scale), normalize(x, scale)) }.sortBy(_.toString)
    case r: org.apache.spark.sql.Row => r.toSeq.map(normalize(_, scale))
    case b: Array[Byte] => b.toSeq
    case other => other
  }

  // multiset of normalized rows — a sort key like mkString("|") would be
  // ambiguous (a string cell containing the separator can collide), and
  // collect() order is not comparable across the two executions
  private def rowsOf(name: String, scale: Int = 9): Map[Seq[Any], Int] = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect().toSeq.map(_.toSeq.map(normalize(_, scale)))
      .groupBy(identity).view.mapValues(_.size).toMap
  }

  test("every gate query returns identical rows with codegen forced OFF") {
    val keys = SparkEntry.queries.keys.toSeq.sorted
    val baseline = keys.map(k => k -> rowsOf(k)).toMap
    val saved = Seq("spark.sql.codegen.wholeStage", "spark.sql.codegen.factoryMode")
      .map(k => k -> spark.conf.getOption(k)).toMap
    def interpreted[A](body: => A): A =
      try {
        spark.conf.set("spark.sql.codegen.wholeStage", "false")
        spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
        body
      } finally saved.foreach { case (k, vOpt) =>
        vOpt.fold(spark.conf.unset(k))(spark.conf.set(k, _))
      }
    val diverged9 = interpreted { keys.filter(k => rowsOf(k) != baseline(k)) }
    // a 1-ULP difference between the paths can straddle a HALF_EVEN
    // boundary at scale 9 — re-check apparent divergences at scale 6
    // (codegen baseline recomputed OUTSIDE interpreted mode, else this
    // would compare interpreted to interpreted and always pass) so only
    // real drift, not a rounding-boundary artifact, fails
    val diverged = diverged9.filter { k =>
      val base6 = rowsOf(k, scale = 6)
      interpreted { rowsOf(k, scale = 6) } != base6
    }
    assert(diverged.isEmpty,
      s"codegen vs interpreted divergence in: ${diverged.mkString(", ")}")
  }
}
