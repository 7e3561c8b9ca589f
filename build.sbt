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
  // Single-JVM local mode: driver heap IS executor memory. Sized so
  // shuffles/sorts/broadcasts at sf0.1 never GC-thrash (measured:
  // knn sort in 8g degraded 6s -> 15s on the second run from
  // collector pressure; 16g holds the full suite steady — A/B'd
  // equal to 48g per-query, see the pre-touch note below).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // Fixed, pre-touched heap: with a growable heap, every expansion
  // stalls ALL threads while the kernel zeroes the newly committed
  // pages, and the stall is booked as GC time — measured as
  // multi-second bimodal swings on identical queries (e.g. the same
  // stage showing gc=0.0s on one run and 86.7s summed across 32
  // tasks on the next; round-6 diagnosis). Pre-touch is NOT optional
  // on this microVM even with Xms=Xmx: first-touch faults resolve at
  // only ~200 MB/s aggregate (93 CPU-minutes of sys time for 48g),
  // and without pre-touch ParallelGC's eden marches through untouched
  // pages DURING queries — A/B'd: the same suite ran 27.3s lazy vs
  // 5.3s pre-touched (sim_knn_topk 14.0s vs 0.9s). The heap is sized
  // to the measured bench working set rather than all of RAM so the
  // one-time pre-touch stays ~1min, not 4min (48g pre-touch measured
  // 4m06s wall on an idle host, THP on or off).
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  "-XX:+AlwaysPreTouch",
  // Deliberately NO -XX:+UseTransparentHugePages: it cuts the
  // pre-touch fault count 512x, but query-time first-touch of
  // OFF-heap memory (netty/shuffle direct buffers, which are not
  // pre-touched) then zeroes 2 MB per fault at this microVM's
  // ~200 MB/s — A/B'd at local[32]: sim_knn_topk 0.90-0.96s with THP
  // vs 0.40-0.41s without across repeated full-suite runs, headline
  // total 4.25s vs 3.75-4.08s.
  // batch-throughput collector: bench queries allocate in bursts
  // (broadcasts, codegen'd row buffers). A/B'd against G1 (4-22s on
  // the simhash probe — worst), ZGC (1.1-1.4s steady but a 9s
  // allocation-stall outlier), ParallelGC+Xmn2g (1.9-2.9s): plain
  // ParallelGC over a pre-touched heap wins (0.95-1.6s, no
  // outliers). Env-switchable for future A/B (GRAFT_GC=UseG1GC,
  // extra flags via GRAFT_GC_OPTS, space-separated).
  s"-XX:+${sys.env.getOrElse("GRAFT_GC", "UseParallelGC")}",
) ++ sys.env.get("GRAFT_GC_OPTS").toSeq.flatMap(_.split("\\s+").toSeq)
// The test fork works at sf0.001/0.01 (plus the env-gated 10x stress
// corpus) — it never needs more heap than the main fork's default.
// Last -Xmx/-Xms flag wins in HotSpot, so this appended pair
// overrides the SPARK_DRIVER_MEM-defaulted 16g pair above for tests
// only (pinning tests at 16g even when SPARK_DRIVER_MEM raises the
// main fork); GRAFT_TEST_MEM bumps it for the GRAFT_FULL_TESTS
// stress runs if ever needed.
Test / javaOptions ++= Seq(
  // 8g, not the main fork's 16g (round 19 gate-budget pass): the test
  // fork runs sf0.001/0.01 fixtures (plus a few ungated sf0.1 smoke
  // rows) on local[4] — its working set never approaches the bench's;
  // a smaller committed heap means less first-touch zeroing paid
  // DURING the run now that pre-touch is off below.
  s"-Xmx${sys.env.getOrElse("GRAFT_TEST_MEM", "8g")}",
  s"-Xms${sys.env.getOrElse("GRAFT_TEST_MEM", "8g")}",
  // NO pre-touch for the TEST fork (round 19 gate-budget pass): the
  // pre-touch exists to keep BENCH timings GC-noise-free; tests assert
  // results, not times (the few wall-clock smoke rows have generous
  // bounds). Measured: a 0.1 s suite cost 31 s wall / 8.5 CPU-min of
  // sys time with pre-touch on — all of it first-touch zeroing of the
  // 16 GiB heap this microVM faults at ~200 MB/s. Last flag wins, so
  // this overrides the inherited +AlwaysPreTouch for tests only; the
  // run fork (Bench/Verify) keeps it.
  "-XX:-AlwaysPreTouch",
)
