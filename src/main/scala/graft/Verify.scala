package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional name filter (args 2+): re-dump just those queries into an
    // existing outDir — the full oracle_sql.json/queries.json are still
    // (re)written, so a filtered rerun composes with a prior full run
    val only = args.drop(2).toSet
    val spark = GraftSession.local("graft-verify")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Full query list (separate file so the driver's name→sql parse of
    // oracle_sql.json is untouched): lets the local gate mirror flag a
    // query that threw (and so produced no result dir) as a failure.
    val qlist = SparkEntry.queries.keys.toSeq.sorted.map(q).mkString("[", ",", "]")
    Files.writeString(Paths.get(s"$outDir/queries.json"), qlist)
    // Paperwork drift alarm (SURVEY §2 pattern rule): a gate query with
    // no SURVEY/BASELINE row ships ungraded. CoverageSpec is the hard
    // gate (fails `sbt test`); this repeats the warning in the driver's
    // verify log so the drift is visible even on a test-skipping run.
    // Warning only — failing the whole verify run here would zero the
    // round's correctness artifact over a docs gap.
    for (doc <- Seq("SURVEY.md", "BASELINE.md")) {
      val p = Paths.get(doc)
      if (Files.exists(p)) {
        val text = Files.readString(p)
        val missing = SparkEntry.queries.keys.filterNot(text.contains).toSeq.sorted
        if (missing.nonEmpty)
          System.err.println(s"[verify] PAPERWORK MISSING in $doc: ${missing.mkString(", ")}")
      }
    }
    spark.stop()
  }
}
