ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "bdtenwikisearchhadoopspark"
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
// Per-unit-row evidence artifact: on a FULL test run the reporter writes
// UNIT_RESULTS.json (suite/test/status for every oracle=unit query) so
// the driver/judge can confirm the 27 no-oracle rows without re-running
// the suite. Partial (testOnly) runs leave the file untouched.
Test / testOptions +=
  Tests.Argument(TestFrameworks.ScalaTest, "-C", "graft.UnitResultsReporter")
// The driver parses ONE raw JSON line from `runMain graft.Bench` stdout.
// Default LoggedOutput prefixes every forked-stdout line with "[info] "
// and sbt appends "[success] Total time..." — both broke the driver's
// parser in rounds 1-2 (`parsed: null`). StdoutOutput passes the forked
// JVM's stdout through verbatim; showSuccess drops the trailer.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
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
  // 8g was GC-bound across the 217-query bench (multi-second pauses
  // showing up as 5-12 s outliers on otherwise sub-second queries);
  // the box has 128 GiB — give the single shared JVM real headroom.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
) ++
  // opt-in GC/safepoint log for adjudicating bench noise (round 12):
  // SPARK_GRAFT_GCLOG=/tmp/gc.log correlates multi-second bench-row
  // inflation with collector pauses vs external interference
  sys.env.get("SPARK_GRAFT_GCLOG")
    .map(p => s"-Xlog:gc,safepoint:file=$p:uptime").toSeq
