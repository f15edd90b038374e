ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "sybilspark"
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
// The bench/verify harness parses the LAST stdout line as JSON; sbt's
// trailing "[success] Total time: ..." line would shadow it. Timing
// still reaches the harness inside the JSON itself.
Global / showSuccess := false
// r18: pass the forked JVM's output through RAW. sbt's default logger
// prefixes every forked-stdout line with "[info] " — which made the
// bench's final JSON line unparseable to a collector doing
// json.loads(last_line) (every round's BENCH_r*.json shows
// `parsed: null` with the JSON sitting right there behind an "[info] "
// prefix). StdoutOutput hands the subprocess's stdout/stderr to the
// parent's unmodified, so the contract line is byte-clean.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// showSuccess is consumed by sbt's command engine, not another setting —
// exclude it from the unused-key lint
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
