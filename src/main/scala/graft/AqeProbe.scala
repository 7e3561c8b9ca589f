package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main (not driver-invoked): measures every headline
  * query best-of-3 with AQE OFF and AQE ON on otherwise-identical
  * fresh sessions, and summarizes the FINAL adaptive plan (post-
  * re-optimization) structurally — join-strategy counts, exchange
  * count, AQEShuffleRead (partition-coalesce) count — next to the
  * static AQE-off plan. Output: one JSON line per query + a total
  * line. This is the evidence behind BASELINE.md's "AQE-on gap"
  * section: at 100 TB AQE defaults ON, so its per-query cost at
  * bench scale must be attributed (fixed per-stage re-planning
  * latency vs a genuine plan change), not assumed.
  *
  * Usage: sbt "runMain graft.AqeProbe" (env SPARK_GRAFT_SF_DIR /
  * SPARK_GRAFT_CPUS as in Bench).
  */
object AqeProbe {

  private def session(cpus: String, aqe: Boolean): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", aqe.toString)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Structural fingerprint of an executed plan string: the counts a
    * genuine AQE plan CHANGE would move (join strategies, exchanges)
    * plus the count AQE always adds at tiny scale (coalesced reads).
    * `private[graft]`: Bench's full-sweep regression tripwire records
    * the same fingerprint per op (round 16 — VERDICT r15 ask 2) so a
    * named time growth self-triages as plan change vs host stall. */
  private[graft] def shape(plan: String): Map[String, Int] = Map(
    "bhj" -> "BroadcastHashJoin".r.findAllIn(plan).size,
    "smj" -> "SortMergeJoin".r.findAllIn(plan).size,
    "shj" -> "ShuffledHashJoin".r.findAllIn(plan).size,
    "bnlj" -> "BroadcastNestedLoopJoin".r.findAllIn(plan).size,
    // shuffle exchanges only: "Exchange hashpartitioning/rangepartitioning/
    // SinglePartition" — a bare "Exchange " prefix also matches
    // "BroadcastExchange ", which would double-move two counters on a
    // broadcast<->shuffle swap (ADVICE r13)
    "exchange" -> "(?<!Broadcast)Exchange ".r.findAllIn(plan).size,
    "aqeRead" -> "AQEShuffleRead".r.findAllIn(plan).size
  )

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val qs = SparkEntry.queries
    val names = if (args.nonEmpty) args.toSeq else Bench.headline
    val warmDir = {
      val p = java.nio.file.Paths.get(sfDir).resolveSibling("sf0.001")
      if (java.nio.file.Files.isDirectory(p)) p.toString else sfDir
    }

    def measure(aqe: Boolean): Map[String, (Double, Map[String, Int])] = {
      val s = session(cpus, aqe)
      try {
        names.foreach(n => try { qs(n)(s, warmDir).count() } catch { case _: Throwable => () })
        names.map { n =>
          val times = (1 to 3).map { _ =>
            val t0 = System.nanoTime()
            qs(n)(s, sfDir).count()
            (System.nanoTime() - t0) / 1e9
          }
          // plan shape from a dedicated executed run (AQE finalizes
          // the physical plan only after execution)
          val df = qs(n)(s, sfDir)
          df.count()
          n -> (times.min, shape(df.queryExecution.executedPlan.toString))
        }.toMap
      } finally s.stop()
    }

    // Both orders must be run to attribute any delta: the second
    // session inherits a JIT-warm JVM, so a single ordering conflates
    // AQE cost with warm-up (observed: whichever mode runs second
    // wins by ~0.5-1 s on the 12-query suite).
    val onFirst = sys.env.get("SPARK_GRAFT_AQE_ORDER").contains("on_first")
    val (off, on) = if (onFirst) {
      val o = measure(aqe = true); (measure(aqe = false), o)
    } else {
      val o = measure(aqe = false); (o, measure(aqe = true))
    }
    names.foreach { n =>
      val (tOff, sOff) = off(n)
      val (tOn, sOn) = on(n)
      val structural = (sOff - "aqeRead").exists { case (k, v) => sOn(k) != v }
      println(f"""{"q":"$n","off_s":$tOff%.3f,"on_s":$tOn%.3f,"delta_s":${tOn - tOff}%.3f,""" +
        f""""off_shape":${sOff.toSeq.sortBy(_._1).map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")},""" +
        f""""on_shape":${sOn.toSeq.sortBy(_._1).map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")},""" +
        f""""structural_change":$structural}""")
    }
    val tOff = off.values.map(_._1).sum
    val tOn = on.values.map(_._1).sum
    println(f"""{"total_off_s":$tOff%.3f,"total_on_s":$tOn%.3f,"delta_s":${tOn - tOff}%.3f}""")
  }
}
