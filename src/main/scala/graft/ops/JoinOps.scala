package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.Tables._

/** SURVEY §2.C — join operators (#10–#19).
  *
  * Scale posture: dimension tables (region/nation/part/supplier) are
  * broadcast (explicitly or via Catalyst's threshold) so the fact-side
  * scan never shuffles for them; fact⋈fact joins shuffle on their equi
  * keys and would bucket/co-partition at 100 TB. The as-of and
  * interval joins are expressed as equi-join + residual range
  * predicate + per-key window, which shuffles by key once — never a
  * cartesian.
  */
object JoinOps {

  /** #10 — plain equi-join, shuffle-side shape (orders ⋈ customer). */
  def joinInnerShuffle(spark: SparkSession, sf: String): DataFrame =
    orders(spark, sf)
      .join(customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .where(col("c_acctbal") < 0 && col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("c_custkey"), col("c_name"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))

  /** #11 — broadcast hash join with an explicit hint (lineitem ⋈ part). */
  def joinBroadcast(spark: SparkSession, sf: String): DataFrame =
    lineitem(spark, sf)
      .join(broadcast(part(spark, sf)), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        // exact decimal sum (order-independent), then a deterministic
        // decimal→double cast for output: DOUBLE hashes identically in
        // both engines, DECIMAL canonicalization does not (ADVICE r1).
        sum(money(col("l_extendedprice")) * (lit(1) - money(col("l_discount")))).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("p_brand"))

  /** #12 — left outer join preserving customers with zero orders. */
  def joinLeftOuter(spark: SparkSession, sf: String): DataFrame =
    customer(spark, sf)
      .join(orders(spark, sf), col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"),
           coalesce(sum(money(col("o_totalprice"))), lit(0)).cast("double").as("total_spend"))
      .orderBy(col("c_custkey"))

  /** #13 — full outer join on partially-overlapping synthesized keys:
    * per-nation supplier counts (nations < 15) vs nation dim (keys >= 10). */
  def joinFullOuter(spark: SparkSession, sf: String): DataFrame = {
    val sup = supplier(spark, sf).where(col("s_nationkey") < 15)
      .groupBy(col("s_nationkey")).agg(count(lit(1)).as("n_suppliers"))
    val nat = nation(spark, sf).where(col("n_nationkey") >= 10)
    sup.join(nat, col("s_nationkey") === col("n_nationkey"), "full_outer")
      .select(
        coalesce(col("s_nationkey"), col("n_nationkey")).as("nationkey"),
        col("n_suppliers"), col("n_name"))
      .orderBy(col("nationkey"))
  }

  /** #14 — left semi join (EXISTS): customers having >= 1 'F' order. */
  def joinSemi(spark: SparkSession, sf: String): DataFrame =
    customer(spark, sf)
      .join(orders(spark, sf).where(col("o_orderstatus") === "F"),
            col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))

  /** #15 — left anti join (NOT EXISTS): customers with no 'F'-status
    * order. The filter on the right side matters for the graded
    * check: every sf0.01 customer has *some* order, so anti-joining
    * against all orders returns 0 rows and the oracle hash would pass
    * vacuously; against the 'F' subset the result is non-empty (71
    * rows at sf0.01), so the hash pins actual survivors. */
  def joinAnti(spark: SparkSession, sf: String): DataFrame =
    customer(spark, sf)
      .join(orders(spark, sf).where(col("o_orderstatus") === "F"),
            col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy(col("c_custkey"))

  /** #16 — flagship TPC-H Q5-shape 5-way join: revenue per nation in
    * AMERICA, 1996–1997. Fact⋈fact (orders⋈lineitem, customer⋈orders)
    * shuffle on their keys; nation/region broadcast. */
  def joinMultiway5(spark: SparkSession, sf: String): DataFrame =
    customer(spark, sf)
      .join(orders(spark, sf), col("c_custkey") === col("o_custkey"))
      .join(lineitem(spark, sf), col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(nation(spark, sf)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(spark, sf)), col("n_regionkey") === col("r_regionkey"))
      .where(col("r_name") === "AMERICA" &&
             col("o_orderdate") >= ts("1996-01-01") &&
             col("o_orderdate") <  ts("1998-01-01"))
      .groupBy(col("n_name"))
      .agg(
        sum(money(col("l_extendedprice")) * (lit(1) - money(col("l_discount")))).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("n_name"))

  /** #17 — theta/band join: part pairs within 0.05 retail price of each
    * other. Bucketized: the band |p1-p2| < 0.05 on exact 2-dp decimals
    * is |20*p1 - 20*p2| < 1 on exact longs, so matching pairs differ by
    * at most one price bucket b = 20*price. Exploding the probe side to
    * (b-1, b, b+1) turns the O(n²) nested loop into a hash-partitioned
    * equi-join on bucket + exact residual predicate — identical results,
    * and the shape that survives a 100 TB fact-fact band join (shuffle
    * by bucket instead of broadcast NLJ). */
  def joinThetaBand(spark: SparkSession, sf: String): DataFrame = {
    val p1 = part(spark, sf).select(
      col("p_partkey").as("p1_key"), money(col("p_retailprice")).as("p1_price"))
    val p2 = part(spark, sf).select(
      col("p_partkey").as("p2_key"), money(col("p_retailprice")).as("p2_price"))
    graft.api.Transforms.bandJoinExactDecimal(p1, p2,
        col("p1_price"), col("p2_price"), dec(lit(0.05), 18, 2), scale = 20)
      .where(col("p1_key") < col("p2_key"))
      .select(col("p1_key"), col("p2_key"),
              abs(col("p1_price") - col("p2_price")).cast("double").as("price_diff"))
      .orderBy(col("p1_key"), col("p2_key"))
  }

  /** #18 — as-of join: each event matched to the latest order of the
    * same customer (user_id = o_custkey) with o_orderdate <= ts.
    * Formulated as equi-join on the key + range residual + per-event
    * row_number — shuffles once on the key, no custom strategy needed
    * (oeem-etl heritage: align meter reading to latest project state). */
  def joinAsof(spark: SparkSession, sf: String): DataFrame = {
    val e = events(spark, sf).select(col("event_id"), col("ts"), col("user_id"))
    val o = orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"), col("o_totalprice"))
    graft.api.Transforms.asOfJoin(e, o,
        leftKey = col("user_id"), rightKey = col("o_custkey"),
        leftTime = col("ts"), rightTime = col("o_orderdate"),
        rightTieBreak = col("o_orderkey"))
      .select(col("event_id"), col("user_id"), col("ts"),
              col("o_orderkey").as("asof_orderkey"),
              col("o_orderdate").as("asof_orderdate"))
      .orderBy(col("event_id"))
  }

  /** #19 — interval-overlap join: clicks landing within 1 hour of the
    * same user's signup event (oeem-etl heritage: reading-in-billing-
    * period). Equi-join on user_id + range residual. */
  def joinIntervalOverlap(spark: SparkSession, sf: String): DataFrame = {
    val ev = events(spark, sf)
    val signup = ev.where(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("user_id").as("s_user"), col("ts").as("s_ts"))
    val click = ev.where(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    signup.join(click,
        col("c_user") === col("s_user") &&
        col("c_ts") >= col("s_ts") &&
        col("c_ts") < col("s_ts") + expr("INTERVAL 1 HOUR"))
      .groupBy(col("signup_id"), col("s_user"), col("s_ts"))
      .agg(count(lit(1)).as("n_clicks_1h"))
      .select(col("signup_id"), col("s_user").as("user_id"),
              col("s_ts").as("signup_ts"), col("n_clicks_1h"))
      .orderBy(col("signup_id"))
  }

  /** #107 — explicit CROSS JOIN of two tiny dimensions (5 regions ×
    * 25 nations = 125 pairs): the one join shape that is ONLY sane
    * when at least one side is dimension-sized — Spark requires the
    * explicit `crossJoin` call and plans a broadcast nested loop.
    * Membership flag distinguishes the true pairs. Fact-sized cross
    * joins stay banned (every candidate generator in this library is
    * an equi-join; see the LSH/IVF ops). */
  def joinCrossDims(spark: SparkSession, sf: String): DataFrame =
    region(spark, sf).select(col("r_regionkey"))
      .crossJoin(nation(spark, sf).select(col("n_nationkey"), col("n_regionkey")))
      .select(col("r_regionkey"), col("n_nationkey"),
              (col("n_regionkey") === col("r_regionkey")).as("is_member"))
      .orderBy(col("r_regionkey"), col("n_nationkey"))

  /** #98 — salted skew join: lineitem ⋈ orders on orderkey routed
    * through [[graft.api.Transforms.saltedJoin]] (salt from l_partkey,
    * factor 8) — a hot orderkey's rows split across 8 reducers instead
    * of one straggler, the explicit skew mitigation for when AQE's
    * skew-join can't apply (hash build side, AQE off). Results are
    * identical to the plain join — the oracle IS the plain join. */
  def joinSkewSalted(spark: SparkSession, sf: String): DataFrame = {
    val l = lineitem(spark, sf).select(col("l_orderkey"), col("l_partkey"),
      money(col("l_extendedprice")).as("price"), money(col("l_discount")).as("disc"))
    val o = orders(spark, sf).select(col("o_orderkey"), col("o_orderpriority"))
    graft.api.Transforms.saltedJoin(l, o,
        leftKey = col("l_orderkey"), rightKey = col("o_orderkey"),
        saltSource = col("l_partkey"), saltFactor = 8)
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("price") * (lit(1) - col("disc"))).cast("double").as("revenue"),
           count(lit(1)).as("n_items"))
      .orderBy(col("o_orderpriority"))
  }

  /** #109 — bucketed co-located join: lineitem and orders are laid
    * out as bucketed-by-orderkey tables (8 buckets, sorted within
    * bucket), re-read, and merge-joined. Bucketing is the 100 TB
    * answer to a REPEATED fact⋈fact join: the shuffle is paid once at
    * layout time, after which every join on the bucket key plans with
    * ZERO Exchange on either side — only the downstream aggregate
    * shuffles (ScaleShapeSpec asserts exactly that plan shape). The
    * `merge` hint pins the sort-merge strategy so the co-location is
    * what's exercised, not a broadcast. Oracle: the identical
    * aggregate off the corpus parquet — a hash match proves the
    * bucketed layout round-tripped every row. */
  def joinBucketedColocated(spark: SparkSession, sf: String): DataFrame = {
    // unique layout per invocation: the table name only scaffolds the
    // bucketed read (never in the output), and a fixed name would let
    // a concurrent caller (parallel test suites; Verify's thread pool)
    // overwrite the files under a still-lazy DataFrame
    val run = java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    // files registered for exit-time deletion (review r17: this was
    // the one fixture family with NO cleanup — a lineitem-sized copy
    // leaked per invocation); the catalog entries die with the session
    val dir = graft.Tables.registerScratch(
      s"${System.getProperty("java.io.tmpdir")}/graft_bucketed_109_$run")
    // the two layout writes are INDEPENDENT jobs — overlap them from a
    // 2-thread pool (guide §2.6: submit independent actions
    // concurrently so the second job's tasks back-fill the first's
    // straggler tail) instead of serializing lineitem-write then
    // orders-write; measured 2.35 s -> ~1.6 s at sf0.1/32 cores with
    // identical layouts (job descriptions stay thread-local)
    locally {
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      def write(mk: => Unit) = Future {
        org.apache.spark.sql.SparkSession.setActiveSession(spark); mk
      }
      val fl = write {
        lineitem(spark, sf)
          .select(col("l_orderkey"), money(col("l_extendedprice")).as("price"),
                  money(col("l_discount")).as("disc"))
          .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
          .option("path", s"$dir/lineitem_b").saveAsTable(s"graft_lineitem_b109_$run")
      }
      val fo = write {
        orders(spark, sf).select(col("o_orderkey"), col("o_orderpriority"))
          .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
          .option("path", s"$dir/orders_b").saveAsTable(s"graft_orders_b109_$run")
      }
      try { Await.result(fl, Duration.Inf); Await.result(fo, Duration.Inf) }
      finally pool.shutdown()
    }
    spark.table(s"graft_lineitem_b109_$run").hint("merge")
      .join(spark.table(s"graft_orders_b109_$run"),
            col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("price") * (lit(1) - col("disc"))).cast("double").as("revenue"),
           countDistinct(col("l_orderkey")).as("n_orders"),
           count(lit(1)).as("n_items"))
      .orderBy(col("o_orderpriority"))
  }

  /** #112 — PURE range join (no equi-key at all — contrast #19, whose
    * user_id equality carries the shuffle): every click landing inside
    * ANY signup's 2-hour window, regardless of user. Spark's native
    * plan for a key-less range predicate is a broadcast nested loop —
    * O(n·m) and a non-starter when neither side is broadcastable — so
    * this routes through [[graft.api.Transforms.rangeJoinBucketed]]:
    * intervals explode to the ~3 hour-buckets they cover, points map
    * to their single bucket, and the join is a hash-partitioned
    * equi-join on bucket + exact residual. Candidate pairs scale with
    * true matches, not n·m. Oracle = the plain theta join. */
  def joinRangeBucketed(spark: SparkSession, sf: String): DataFrame = {
    val ev = events(spark, sf)
    val signup = ev.where(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("ts").as("s_ts"),
              (col("ts") + expr("INTERVAL 2 HOUR")).as("s_end"))
    val click = ev.where(col("event_type") === "click")
      .select(col("ts").as("c_ts"), col("value"))
    graft.api.Transforms.rangeJoinBucketed(click, signup,
        pointTime = col("c_ts"), intervalStart = col("s_ts"),
        intervalEnd = col("s_end"), bucketSeconds = 3600L)
      .groupBy(col("signup_id"), col("s_ts"))
      .agg(count(lit(1)).as("n_clicks_2h"),
           sum(money(col("value"))).cast("double").as("click_value"))
      .select(col("signup_id"), col("s_ts").as("signup_ts"),
              col("n_clicks_2h"), col("click_value"))
      .orderBy(col("signup_id"))
  }

  /** #124 — null-safe equi-join (`<=>` / IS NOT DISTINCT FROM as the
    * join key): the "unknown matches unknown" semantics a dedup or
    * reconciliation pass wants when the natural key is nullable. The
    * corpus has no NULLs (SURVEY §1.2), so a chosen key value is
    * nullified on BOTH sides (nation 3 → NULL) — the null-keyed rows
    * then pair with each other (unlike a plain `=` join, which drops
    * every one of them). Catalyst plans EqualNullSafe as a normal
    * hash-partitioned equi-join (nulls form one ordinary bucket), so
    * the scale posture is identical to #10; results aggregate to one
    * row per key with the null bucket surfaced via coalesce(-1). */
  def joinNullSafe(spark: SparkSession, sf: String): DataFrame = {
    val c = customer(spark, sf)
      .select(nullif(col("c_nationkey"), lit(3)).as("ck"), col("c_custkey"))
    val s = supplier(spark, sf)
      .select(nullif(col("s_nationkey"), lit(3)).as("sk"), col("s_suppkey"))
    c.join(s, col("ck") <=> col("sk"))
      .groupBy(coalesce(col("ck"), lit(-1)).as("join_key"))
      .agg(count(lit(1)).as("n_pairs"),
           countDistinct(col("c_custkey")).as("n_customers"),
           countDistinct(col("s_suppkey")).as("n_suppliers"))
      .orderBy(col("join_key"))
  }

  /** #134 — dynamic partition pruning on a partitioned fact join: the
    * scan-elimination feature that makes star joins viable at 100 TB
    * (a selective dim filter prunes fact PARTITIONS at runtime —
    * whole directories never read, the dominant saving on a
    * date-partitioned lake). Orders are laid out partitioned by
    * order year; the year dim (derived from the corpus, written as a
    * FILE source — a local relation would constant-fold before the
    * PartitionPruning rule sees it) is filtered on a NON-partition
    * attribute, so only the join reveals which fact partitions
    * matter and Catalyst inserts the runtime pruning subquery
    * (plan-asserted in PlanShapeSpec). Oracle: the same aggregate
    * with the year predicate applied statically. */
  def joinPartitionPruned(spark: SparkSession, sf: String): DataFrame = {
    // per-invocation dirs: a fixed path would let a concurrent caller
    // (parallel test suites; Verify's thread pool) overwrite the files
    // under a still-lazy DataFrame (the #109 rationale)
    val tmp = System.getProperty("java.io.tmpdir")
    val run = java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    val factDir = s"$tmp/graft_dpp_fact_$run"
    val dimDir = s"$tmp/graft_dpp_dim_$run"
    orders(spark, sf)
      .withColumn("order_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("order_year").parquet(factDir)
    orders(spark, sf)
      .select(year(col("o_orderdate")).as("dim_year")).distinct()
      .withColumn("era",
        when(pmod(col("dim_year"), lit(2)) === 0, "even").otherwise("odd"))
      .write.mode("overwrite").parquet(dimDir)
    val fact = spark.read.parquet(factDir)
    val dim = spark.read.parquet(dimDir)
    fact.join(dim,
        col("order_year") === col("dim_year") && col("era") === "even")
      .groupBy(col("order_year").cast("long").as("order_year"))
      .agg(count(lit(1)).as("n_orders"),
           sum(money(col("o_totalprice"))).cast("double").as("total_price"))
      .orderBy(col("order_year"))
  }

  private val lateralTopkSql =
    """SELECT n.n_name, t.c_custkey, t.acctbal, t.rk
      |FROM nation n,
      |LATERAL (
      |  SELECT c_custkey, round(c_acctbal, 2) AS acctbal,
      |    CAST(row_number() OVER (ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS rk
      |  FROM customer c
      |  WHERE c.c_nationkey = n.n_nationkey
      |  ORDER BY c_acctbal DESC, c_custkey
      |  LIMIT 3) t
      |ORDER BY n.n_name, t.rk""".stripMargin

  /** #151 — LATERAL correlated top-k: the SQL surface for "the 3
    * richest customers of EACH nation" — a correlated subquery with
    * its own ORDER BY/LIMIT per outer row. Catalyst decorrelates the
    * lateral into a window-rank over the (one) shuffle on the
    * correlation key — the subquery never executes per outer row, so
    * the plan is the same keyed-window shape as #32, not 25 serial
    * scans; DuckDB plans the identical dependent-join unnesting.
    * Deterministic via the (acctbal DESC, custkey) tiebreak. */
  def joinLateralTopk(spark: SparkSession, sf: String): DataFrame = {
    views(spark, sf, "nation", "customer")
    spark.sql(lateralTopkSql)
  }

  /** #174 — nearest-in-time as-of join (either direction): each
    * purchase reading picks the user's temporally CLOSEST signup mark
    * — sensor/event alignment where "latest at-or-before" (#18) is
    * wrong near series starts or for symmetric clock jitter. Shape:
    * the same candidate working set as #18 — a user-keyed equi-join
    * whose per-key fan-out is bounded by marks-per-user — reduced by
    * ONE `min_by` over an (|Δt|, mark_ts, mark_id) struct (map-side
    * partials; no window, no sort of the candidate pairs; |Δt| in
    * exact integer microseconds). Left rows with no marks survive the
    * left join with a NULL nearest (the oracle's correlated subquery
    * agrees). At 100 TB: shuffle on the user key only; production
    * bounds the candidate set further with a coarse time-bucket
    * pre-join exactly like #18's documented variant. */
  def joinAsofNearest(spark: SparkSession, sf: String): DataFrame = {
    val r = events(spark, sf).where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val m = events(spark, sf).where(col("event_type") === "signup")
      .select(col("event_id").as("m_id"), col("user_id").as("m_user"),
              col("ts").as("m_ts"))
    r.join(m, col("user_id") === col("m_user"), "left")
      .groupBy(col("event_id"), col("user_id"))
      .agg(min_by(col("m_id"),
        struct(abs(unix_micros(col("m_ts")) - unix_micros(col("ts"))),
               col("m_ts"), col("m_id"))).as("nearest_mark_id"))
      .orderBy(col("event_id"))
  }

  /** #196 — 2-D ε-neighborhood grid join (round 12; the spatial-join
    * shape of every geo/embedding-cell system, and the 2-D extension
    * of #17's band-join bucketization): part pairs within price
    * distance < 1.0 at EQUAL size, found by bucketing each point into
    * an integer grid cell (floor(price), size) and equi-joining one
    * side against the other side's 3 probe cells (price cell ±1 —
    * the size dimension matches exactly, so the probe fan-out is 3,
    * not 9). A pair's cells differ by exactly one offset, so the
    * cell join yields each pair ONCE — no dedup pass. The exact
    * residual (|Δprice| < 1.0) then kills the corner misses, so the
    * result equals the brute-force θ-join the oracle runs, while the
    * plan is an equi-join whose cost is Σ cell² instead of n² — the
    * same contract as the band join, lifted to 2-D. At 100 TB: cells
    * are the shuffle key (dense cells salt like any hot key), the
    * probe explode is ×3, and no cartesian exists in the plan. */
  def joinGridNeighbors(spark: SparkSession, sf: String): DataFrame = {
    val p = part(spark, sf)
      .select(col("p_partkey").as("id"), col("p_retailprice").as("x"),
              col("p_size").as("y"))
    val left = p.select(col("id").as("d1"), col("x").as("x1"),
      floor(col("x")).cast("long").as("cx"), col("y").as("cy"))
    val probe = p
      .select(col("id").as("d2"), col("x").as("x2"), col("y").as("cy"),
        explode(array(lit(-1L), lit(0L), lit(1L))).as("off"),
        floor(col("x")).cast("long").as("cx2"))
      .select(col("d2"), col("x2"), col("cy"),
              (col("cx2") + col("off")).as("cx"))
    left.join(probe, Seq("cx", "cy"))
      .where(col("d1") < col("d2") && abs(col("x1") - col("x2")) < 1.0)
      .select(col("d1"), col("d2"), col("cy").as("size"),
              round(abs(col("x1") - col("x2")), 4).as("price_dist"))
      .orderBy(col("d1"), col("d2"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = ListMap(
    "join_inner_shuffle"    -> (joinInnerShuffle _),
    "join_broadcast"        -> (joinBroadcast _),
    "join_left_outer"       -> (joinLeftOuter _),
    "join_full_outer"       -> (joinFullOuter _),
    "join_semi"             -> (joinSemi _),
    "join_anti"             -> (joinAnti _),
    "join_multiway_5"       -> (joinMultiway5 _),
    "join_theta_band"       -> (joinThetaBand _),
    "join_asof"             -> (joinAsof _),
    "join_interval_overlap" -> (joinIntervalOverlap _),
    "join_skew_salted"      -> (joinSkewSalted _),
    "join_cross_dims"       -> (joinCrossDims _),
    "join_bucketed_colocated" -> (joinBucketedColocated _),
    "join_range_bucketed"   -> (joinRangeBucketed _),
    "join_null_safe"        -> (joinNullSafe _),
    "join_partition_pruned" -> (joinPartitionPruned _),
    "join_lateral_topk"     -> (joinLateralTopk _),
    "join_asof_nearest"     -> (joinAsofNearest _),
    "join_grid_neighbors"   -> (joinGridNeighbors _),
  )

  val oracle: Map[String, String] = ListMap(
    "join_inner_shuffle" ->
      """SELECT o_orderkey, c_custkey, c_name, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_acctbal < 0 AND o_orderstatus = 'F'
        |ORDER BY o_orderkey""".stripMargin,
    "join_broadcast" ->
      """SELECT p_brand,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "join_left_outer" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
        |  CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_spend
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "join_full_outer" ->
      """WITH sup AS (
        |  SELECT s_nationkey, count(*) AS n_suppliers FROM supplier
        |  WHERE s_nationkey < 15 GROUP BY s_nationkey),
        |nat AS (SELECT * FROM nation WHERE n_nationkey >= 10)
        |SELECT coalesce(s_nationkey, n_nationkey) AS nationkey, n_suppliers, n_name
        |FROM sup FULL OUTER JOIN nat ON s_nationkey = n_nationkey
        |ORDER BY nationkey""".stripMargin,
    "join_semi" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,
    "join_anti" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,
    "join_multiway_5" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'AMERICA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate <  TIMESTAMP '1998-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "join_theta_band" ->
      """SELECT a.p_partkey AS p1_key, b.p_partkey AS p2_key,
        |  CAST(abs(CAST(a.p_retailprice AS DECIMAL(18,2)) - CAST(b.p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS price_diff
        |FROM part a JOIN part b
        |  ON a.p_partkey < b.p_partkey
        | AND abs(CAST(a.p_retailprice AS DECIMAL(18,2)) - CAST(b.p_retailprice AS DECIMAL(18,2))) < CAST(0.05 AS DECIMAL(18,2))
        |ORDER BY p1_key, p2_key""".stripMargin,
    "join_asof" ->
      """SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |       asof_orderkey, asof_orderdate
        |FROM (
        |  SELECT e.event_id, e.user_id, e.ts,
        |         o.o_orderkey AS asof_orderkey, o.o_orderdate AS asof_orderdate,
        |         row_number() OVER (PARTITION BY e.event_id
        |                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM events e JOIN orders o
        |    ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts)
        |WHERE rn = 1 ORDER BY event_id""".stripMargin,
    "join_interval_overlap" ->
      """SELECT s.event_id AS signup_id, s.user_id,
        |       CAST(s.ts AS TIMESTAMP) AS signup_ts, count(*) AS n_clicks_1h
        |FROM events s JOIN events c
        |  ON c.user_id = s.user_id
        | AND c.event_type = 'click' AND s.event_type = 'signup'
        | AND c.ts >= s.ts AND c.ts < s.ts + INTERVAL 1 HOUR
        |GROUP BY s.event_id, s.user_id, s.ts
        |ORDER BY signup_id""".stripMargin,
    "join_skew_salted" ->
      """SELECT o_orderpriority,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "join_cross_dims" ->
      """SELECT r_regionkey, n_nationkey,
        |  n_regionkey = r_regionkey AS is_member
        |FROM region CROSS JOIN nation
        |ORDER BY r_regionkey, n_nationkey""".stripMargin,
    "join_bucketed_colocated" ->
      """SELECT o_orderpriority,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  count(DISTINCT l_orderkey) AS n_orders,
        |  count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "join_range_bucketed" ->
      """SELECT s.event_id AS signup_id, CAST(s.ts AS TIMESTAMP) AS signup_ts,
        |  count(*) AS n_clicks_2h,
        |  CAST(sum(CAST(c.value AS DECIMAL(18,2))) AS DOUBLE) AS click_value
        |FROM events s JOIN events c
        |  ON s.event_type = 'signup' AND c.event_type = 'click'
        | AND c.ts >= s.ts AND c.ts < s.ts + INTERVAL 2 HOUR
        |GROUP BY s.event_id, s.ts
        |ORDER BY signup_id""".stripMargin,
    "join_null_safe" ->
      """WITH c AS (SELECT nullif(c_nationkey, 3) AS ck, c_custkey FROM customer),
        |s AS (SELECT nullif(s_nationkey, 3) AS sk, s_suppkey FROM supplier)
        |SELECT coalesce(ck, -1) AS join_key,
        |  count(*) AS n_pairs,
        |  count(DISTINCT c_custkey) AS n_customers,
        |  count(DISTINCT s_suppkey) AS n_suppliers
        |FROM c JOIN s ON ck IS NOT DISTINCT FROM sk
        |GROUP BY coalesce(ck, -1) ORDER BY join_key""".stripMargin,
    "join_partition_pruned" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total_price
        |FROM orders WHERE year(o_orderdate) % 2 = 0
        |GROUP BY 1 ORDER BY order_year""".stripMargin,
    "join_lateral_topk" -> lateralTopkSql,
    "join_asof_nearest" ->
      """WITH r AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events WHERE event_type = 'purchase'),
        |m AS (
        |  SELECT event_id AS m_id, user_id, CAST(ts AS TIMESTAMP) AS m_ts
        |  FROM events WHERE event_type = 'signup')
        |SELECT r.event_id, r.user_id,
        |  (SELECT m.m_id FROM m WHERE m.user_id = r.user_id
        |   ORDER BY abs(epoch_us(m.m_ts) - epoch_us(r.ts)), m.m_ts, m.m_id
        |   LIMIT 1) AS nearest_mark_id
        |FROM r ORDER BY r.event_id""".stripMargin,
    "join_grid_neighbors" ->
      """SELECT a.p_partkey AS d1, b.p_partkey AS d2,
        |  a.p_size AS size,
        |  round(abs(a.p_retailprice - b.p_retailprice), 4) AS price_dist
        |FROM part a JOIN part b
        |  ON a.p_partkey < b.p_partkey
        | AND a.p_size = b.p_size
        | AND abs(a.p_retailprice - b.p_retailprice) < 1.0
        |ORDER BY d1, d2""".stripMargin,
  )
}
