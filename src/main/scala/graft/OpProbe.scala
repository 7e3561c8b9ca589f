package graft

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageSubmitted}
import org.apache.spark.sql.SparkSession

/** Optimization-round measurement aid (guide §1): time named operators
  * in isolation AND count the Spark jobs/stages each invocation
  * schedules — the metric the snapshot-family optimizations move
  * (fused probe jobs, persisted change sets), which wall time alone
  * can't attribute. Also dumps the graded DataFrame's formatted plan
  * when GRAFT_PLAN_DIR is set (the plans/r18 before/after artifacts).
  *
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *     GRAFT_PLAN_DIR=plans/r18 GRAFT_PLAN_SUFFIX=_before \
  *     sbt "runMain graft.OpProbe etl_snapshot_merge_timetravel ..."
  *
  * Session config matches graft.Bench (AQE off, 32 shuffle
  * partitions) so its times read on the same scale as FULLBENCH rows.
  * One warm pass at sf0.001 (codegen/JIT), then best-of-3 timed runs;
  * jobs/stages are counted on the LAST timed run (identical plans →
  * identical counts on every warm run).
  */
object OpProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: OpProbe <op> [<op> ...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val planDir = sys.env.get("GRAFT_PLAN_DIR")
    val planSuffix = sys.env.getOrElse("GRAFT_PLAN_SUFFIX", "")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        { jobs.incrementAndGet(); () }
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
        { stages.incrementAndGet(); () }
    })
    val qs = SparkEntry.queries
    val warmDir = {
      val p = java.nio.file.Paths.get(sfDir).resolveSibling("sf0.001")
      if (java.nio.file.Files.isDirectory(p)) p.toString else sfDir
    }
    args.foreach { name =>
      require(qs.contains(name), s"unknown op $name")
      try { qs(name)(spark, warmDir).count() }
      catch { case e: Throwable =>
        System.err.println(s"[probe] warm $name failed: ${e.getMessage}") }
      val runs = (1 to 3).map { _ =>
        jobs.set(0); stages.set(0)
        val t0 = System.nanoTime()
        val df = qs(name)(spark, sfDir)
        df.count()
        val t = (System.nanoTime() - t0) / 1e9
        // the listener posts asynchronously; keep the old 200 ms floor
        // (so a slow bus can never yield a 0-job read the stability
        // poll would accept), THEN poll until the counters stop moving
        // (two consecutive identical reads 100 ms apart) instead of
        // trusting the fixed sleep alone, which under-reported on a
        // loaded host (ADVICE r18) — waitUntilEmpty is private[spark]
        Thread.sleep(200)
        var prev = (-1, -1)
        var cur = (jobs.get(), stages.get())
        var spins = 20
        while (prev != cur && spins > 0) {
          Thread.sleep(100); prev = cur
          cur = (jobs.get(), stages.get()); spins -= 1
        }
        (t, jobs.get(), stages.get(), df)
      }
      val best = runs.map(_._1).min
      val (_, j, s, df) = runs.last
      planDir.foreach { dir =>
        val p = java.nio.file.Paths.get(dir)
        java.nio.file.Files.createDirectories(p)
        java.nio.file.Files.write(p.resolve(s"$name$planSuffix.txt"),
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode).getBytes("UTF-8"))
      }
      println(f"""{"op":"$name","best_sec":$best%.3f,"jobs":$j,"stages":$s}""")
    }
    spark.stop()
  }
}
