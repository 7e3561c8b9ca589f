package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
import org.apache.spark.sql.execution.{FileSourceScanExec, GlobalLimitExec,
  LocalLimitExec, LocalTableScanExec, RDDScanExec, RangeExec, SparkPlan,
  TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec,
  CartesianProductExec}

/** VERDICT r12/r13: the PLANS.md nested-loop contract, EXECUTABLE over
  * every registered operator instead of prose plus per-query pins.
  *
  * The contract (PLANS.md header, `Plans.scala`): no
  * `CartesianProduct` anywhere, and any `BroadcastNestedLoopJoin`'s
  * build side must be a BROADCAST, metadata-scale subplan. The three
  * documented idioms map onto four CHECKABLE rules:
  *
  *   1. STRUCTURALLY ROW-BOUNDED build subtree — a limit /
  *      `TakeOrderedAndProject` (fixed query sets), an aggregate
  *      (keyless 1-row scalars, idiom (b); per-type metadata lists,
  *      idiom (c) — output is group-cardinality, not fact-scale), a
  *      literal local table, or a small `Range`.
  *   2. CHECKPOINTED METADATA INTERMEDIATE — a `localCheckpoint`'d
  *      build side plans as an opaque `RDDScanExec`, hiding its
  *      upstream bounding aggregate; the rows are already
  *      materialized, so the sweep COUNTS them (cheap — the RDD is
  *      cached) and admits ≤ 8192 at sf0.001 (every legitimate such
  *      build is a daily series / centroid list, orders of magnitude
  *      under that; a leaked fact table at sf0.001 is already 6k+
  *      rows per table and growing with SF, while these stay flat).
  *   3. FIXED-CARDINALITY CATALOG DIM — region (5 rows) / nation
  *      (25 rows) are constant-size at EVERY scale factor by the
  *      data model, so a cross over them is metadata-scale by
  *      definition (`join_cross_dims`).
  *   4. BOUNDED-HEAP SCORED SCAN (idiom (a)) — the brute-force
  *      kNN/maxsim baselines broadcast one corpus-scale side BY
  *      CONTRACT (SURVEY §2 defines them as the exact baselines; the
  *      documented 100 TB path is the ANN index swap). Their
  *      signature is structural: the join's scores are consumed by a
  *      bounded-heap `TopKAgg` ABOVE the join, so the join output is
  *      k·|queries| regardless of corpus size and is never
  *      materialized.
  *
  * A raw scan→filter→project build chain with none of these grows
  * linearly with the fact table — exactly the fact×fact loop the
  * contract forbids — and fails the sweep (planted-violation tests
  * below prove it). The sweep runs on the LOGICALLY planned physical
  * tree (`queryExecution.sparkPlan`, pre-AQE, pre-exchange-insertion)
  * so the traversal sees the real join nodes regardless of the
  * adaptive wrapper, at sf0.001 so it stays a pre-commit gate. */
class PlanContractSpec extends SparkSpec {

  private val catalogDims = Set("region.parquet", "nation.parquet")

  /** Row count (capped at 8193) of a pre-exchange physical subtree:
    * plan its subqueries and insert the exchanges `sparkPlan` omits,
    * then execute. Over-counting is fine (the caller compares ≤); a
    * subtree that cannot execute at all reports Long.MaxValue. */
  private def executedRowBound(p: SparkPlan): Long =
    try {
      val executable =
        org.apache.spark.sql.execution.ApplyColumnarRulesAndInsertTransitions(
          spark.sessionState.columnarRules, outputsColumnar = false)(
          org.apache.spark.sql.execution.exchange.EnsureRequirements()(
            org.apache.spark.sql.execution.PlanSubqueries(
              spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession])(p)))
      executable.execute().take(8193).length.toLong
    } catch { case _: Throwable => Long.MaxValue }

  /** Rule 1-3: the build subtree is row-bounded. */
  private def boundedBuild(p: SparkPlan): Boolean = p.find {
    case _: GlobalLimitExec | _: LocalLimitExec |
         _: TakeOrderedAndProjectExec => true
    case a: BaseAggregateExec =>
      // ADVICE r14: only KEYLESS aggregates are structurally bounded
      // (≤ 1 row per partition). A keyed aggregate's output is its
      // group cardinality — metadata-scale for the blessed idioms
      // (per-type / per-day lists) but fact-scale for a
      // high-cardinality groupBy — so it must PROVE its bound via the
      // rule-2 row count. The subtree comes from the pre-exchange
      // sparkPlan, so it is made executable first (plan subqueries,
      // insert exchanges); a missing final shuffle can only
      // over-count groups (per-partition partials), so a ≤ 8192
      // verdict is conservative; an execution failure counts as
      // unbounded.
      a.groupingExpressions.isEmpty || executedRowBound(a) <= 8192L
    case _: LocalTableScanExec => true
    case r: RangeExec => r.numElements <= BigInt(10000)
    case f: FileSourceScanExec =>
      f.relation.location.rootPaths.forall(rp => catalogDims(rp.getName))
    case r: RDDScanExec =>
      // checkpointed intermediate: already materialized, count is cheap
      (try r.rdd.count() catch { case _: Throwable => Long.MaxValue }) <= 8192L
    case _ => false
  }.nonEmpty

  /** All contract violations in one query's physical plan. `topkAbove`
    * carries rule 4 down the tree: a bounded-heap top-k aggregate
    * anywhere above the join blesses the brute-force scored scan. */
  private def violations(df: DataFrame): Seq[String] = {
    val out = scala.collection.mutable.Buffer.empty[String]
    def walk(p: SparkPlan, topkAbove: Boolean): Unit = {
      val tk = topkAbove || (p match {
        case a: BaseAggregateExec =>
          a.aggregateExpressions.exists(
            _.toString.toLowerCase.contains("topk"))
        case _ => false
      })
      p match {
        case c: CartesianProductExec =>
          out += s"CartesianProduct: ${c.simpleStringWithNodeId()}"
        case j: BroadcastNestedLoopJoinExec =>
          val build = j.buildSide match {
            case BuildLeft  => j.left
            case BuildRight => j.right
          }
          if (!boundedBuild(build) && !tk)
            out += ("BroadcastNestedLoopJoin with UNBOUNDED build side (no " +
              "aggregate/limit/local-table/catalog-dim on the build side " +
              s"and no bounded-heap top-k above the join):\n$build")
        case _ => ()
      }
      p.children.foreach(walk(_, tk))
    }
    walk(df.queryExecution.sparkPlan, topkAbove = false)
    out.toSeq
  }

  test("every registered operator obeys the nested-loop contract (no cartesian; BNLJ build sides metadata-scale)") {
    // 12 plans in flight (round-19 gate-budget pass; the same pattern
    // as the PermutationInvariance sweep): the sweep is plan ANALYSIS
    // per op — driver-side Catalyst work plus the occasional rule-2
    // bounded execute — and ran serially at 67 s; ops are independent
    // (distinct temp dirs/views) and Catalyst planning is thread-safe
    // on one session, so the wall time is cut without losing coverage.
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(12)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val offenders = try {
      val futures = SparkEntry.queries.toSeq.sortBy(_._1).map {
        case (name, fn) => Future {
          // pool threads lack the thread-local active session; rule 2's
          // bounded execute (SQLConf.get, codegen) needs it — without
          // it an execution failure reads as Long.MaxValue and flags a
          // legitimate keyed-aggregate build as a false violation
          org.apache.spark.sql.SparkSession.setActiveSession(spark)
          val vs = try violations(fn(spark, sf001)) catch {
            case e: Throwable =>
              Seq(s"construction failed: ${e.getClass.getSimpleName}: ${e.getMessage}")
          }
          vs.map(v => s"$name: $v")
        }
      }
      Await.result(Future.sequence(futures), Duration.Inf).flatten
    } finally pool.shutdown()
    assert(offenders.isEmpty,
      s"${offenders.size} nested-loop contract violation(s):\n" +
        offenders.mkString("\n---\n"))
  }

  test("the sweep detects a planted fact-by-fact cross join") {
    val l = Tables.lineitem(spark, sf001).select(col("l_orderkey"))
    val o = Tables.orders(spark, sf001).select(col("o_orderkey"))
    // at sf0.001 the planner may realize this as CartesianProduct or
    // as a BNLJ (one side under the auto-broadcast threshold); the
    // contract flags the fact×fact loop under either node
    val vs = violations(l.crossJoin(o))
    assert(vs.nonEmpty, "planted fact×fact cross join not flagged")
    assert(vs.exists(v => v.contains("CartesianProduct") ||
      v.contains("UNBOUNDED build side")), vs.mkString("\n"))
  }

  test("the sweep detects a planted unbounded broadcast nested loop") {
    val l = Tables.lineitem(spark, sf001)
      .select(col("l_orderkey"), col("l_quantity"))
    val o = Tables.orders(spark, sf001)
      .select(col("o_orderkey"), col("o_totalprice"))
    // a broadcast fact table under a theta predicate: BNLJ whose build
    // side is a raw scan — the exact shape the contract forbids
    val planted = l.join(broadcast(o), col("l_quantity") > col("o_totalprice"))
    val vs = violations(planted)
    assert(vs.exists(_.contains("UNBOUNDED build side")),
      s"planted unbounded BNLJ not flagged: $vs")
    // and the same shape with a row bound on the build side passes
    val boundedDf = l.join(broadcast(o.limit(10)),
      col("l_quantity") > col("o_totalprice"))
    assert(violations(boundedDf).isEmpty, "row-bounded BNLJ wrongly flagged")
  }

  test("the sweep does not bless a HIGH-CARDINALITY keyed aggregate on the build side") {
    // ADVICE r14: a keyed groupBy whose group count is fact-scale used
    // to pass on the blanket aggregate bless; it must now fail the
    // rule-2 row count (> 8192 groups), while a KEYLESS scalar
    // aggregate over the same input stays structurally blessed
    val probe = Tables.orders(spark, sf001)
      .select(col("o_orderkey"), col("o_totalprice"))
    val bigAgg = spark.range(20000).toDF("id")
      .groupBy(col("id")).agg(count(lit(1)).as("n"))
    val planted = probe.join(broadcast(bigAgg),
      col("o_totalprice") > col("id") + col("n"))
    assert(violations(planted).exists(_.contains("UNBOUNDED build side")),
      "fact-scale keyed-aggregate build not flagged")
    val scalar = Tables.lineitem(spark, sf001)
      .agg(max(col("l_quantity")).as("mx"))
    val blessed = probe.join(broadcast(scalar), col("o_totalprice") > col("mx"))
    assert(violations(blessed).isEmpty, "keyless scalar build wrongly flagged")
    // a metadata-scale keyed aggregate (≤ 8192 groups) proves its
    // bound through the row count and still passes
    val smallAgg = spark.range(500).toDF("id")
      .groupBy(col("id")).agg(count(lit(1)).as("n"))
    val ok = probe.join(broadcast(smallAgg),
      col("o_totalprice") > col("id") + col("n"))
    assert(violations(ok).isEmpty, "metadata-scale keyed build wrongly flagged")
  }

  test("the sweep does not bless a checkpointed FACT table on the build side") {
    // rule 2's row count is the guard: a checkpointed fact-scale
    // intermediate exceeds the 8192 bound and still fails
    val big = Tables.lineitem(spark, sf001)
      .select(col("l_orderkey"), col("l_quantity"))
      .unionAll(Tables.lineitem(spark, sf001)
        .select(col("l_orderkey"), col("l_quantity")))
      .localCheckpoint()
    assert(big.count() > 8192, "fixture must exceed the rule-2 bound")
    val l = Tables.orders(spark, sf001).select(col("o_orderkey"), col("o_totalprice"))
    val planted = l.join(broadcast(big), col("o_totalprice") > col("l_quantity"))
    assert(violations(planted).exists(_.contains("UNBOUNDED build side")),
      "checkpointed fact build side wrongly blessed")
  }
}
