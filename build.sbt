ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "oeemetlspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// per-test durations in the report (-oD): the suite is a pre-commit
// gate, so slow tests must be visible, not discovered once a round
Test / testOptions += Tests.Argument(TestFrameworks.ScalaTest, "-oD")
run / fork := true
// Forked run output goes straight to stdout, NOT through sbt's logger:
// the driver parses Bench's single JSON line, and an "[info] " prefix
// broke that parse in round 1 (BENCH_r01.json "parsed": null).
run / outputStrategy := Some(StdoutOutput)
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
  // Single-JVM local mode: driver heap IS executor memory. The bench
  // machine has 125 GB; size so shuffles/sorts/broadcasts at sf0.1
  // never GC-thrash (measured: knn sort in 8g degraded 6s -> 15s on
  // the second run from collector pressure).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // batch-throughput collector: bench queries allocate in bursts
  // (broadcasts, codegen'd row buffers); G1 pause-avoidance cost the
  // suite ~2x run-to-run variance in measurement.
  "-XX:+UseParallelGC",
)
