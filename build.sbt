ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "legendcommunitydeltaspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Driver bench contract (optimization round 19): the harness parses ONE
// JSON line from `sbt "runMain graft.Bench"` stdout, but sbt's default
// LoggedOutput strategy wraps the forked program's stdout as
// "[info] {...}" and appends its own "[success] Total time: ..." line —
// BENCH_r16/r17/r18 all carry the JSON in their tail yet parsed: null.
// StdoutOutput inherits the forked JVM's stdout/stderr unprefixed, and
// showSuccess=false drops the trailing [success] line, so the program's
// JSON really is the last bare stdout line. (Build/test failures still
// surface through sbt's nonzero exit code, which is what the harness's
// compile_ok/tests_ok track — see VERIFY_rNN.json rc semantics.)
outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// showSuccess is read by sbt's command engine, not by a task — exclude
// it from the unused-key lint (the suppressed [success] line proves it
// is honored)
Global / excludeLintKeys += showSuccess
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
