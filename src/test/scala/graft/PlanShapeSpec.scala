package graft

import graft.ops._

/** SURVEY §5.3 plan-shape assertions: the optimizations we design for
  * must be visible in the physical plan, not assumed. */
class PlanShapeSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("scan_pruned_pushdown pushes the shipdate filter into the parquet scan") {
    val p = plan(ScanOps.scanPrunedPushdown(spark, sf001))
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), p)
  }

  test("scan_pruned_pushdown prunes to the 3 projected columns") {
    val p = plan(ScanOps.scanPrunedPushdown(spark, sf001))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_shipdate"))
    assert(!readSchema.contains("l_extendedprice"), readSchema)
  }

  test("join_broadcast plans a BroadcastHashJoin") {
    assert(plan(JoinOps.joinBroadcast(spark, sf001)).contains("BroadcastHashJoin"))
  }

  test("retention cohort is a single scan with no join") {
    val p = plan(EtlOps.eventsRetentionCohort(spark, sf001))
    assert(p.sliding("Scan parquet".length).count(_ == "Scan parquet") == 1, p)
    assert(!p.contains("Join"), p)
  }

  test("bpe encode is a pure scan: the merge chain stays in one projection with no join") {
    // #213's scale contract — 8 chained replaces must fold into the
    // scan-side projection (a regression that materializes the merge
    // table as a join would show as a Join here, and one that breaks
    // column pruning would widen ReadSchema past (source, text))
    val p = plan(CorpusOps.textBpeEncode(spark, sf001))
    assert(!p.contains("Join"), p)
    assert(p.sliding("Scan parquet".length).count(_ == "Scan parquet") == 1, p)
    val readSchema = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(readSchema.contains("source") && readSchema.contains("text") &&
      !readSchema.contains("n_chars") && !readSchema.contains("lang"), readSchema)
  }

  test("grid-neighbor join is a pure equi-join: no cartesian, no loop join") {
    // the 2-D band-join contract: pair generation must ride the cell
    // equi-join; a planner regression to the raw theta predicate
    // would surface as a nested-loop/cartesian here
    val p = plan(JoinOps.joinGridNeighbors(spark, sf001))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert(p.contains("Join"), p)
  }

  test("rolling actives and markov transitions never plan a loop join") {
    for (df <- Seq(EtlOps.eventsRollingActive(spark, sf001),
                   EtlOps.eventsMarkovTransitions(spark, sf001))) {
      val p = plan(df)
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    }
    // the markov row totals come back as a broadcast, not a shuffle
    assert(plan(EtlOps.eventsMarkovTransitions(spark, sf001))
      .contains("BroadcastHashJoin"))
  }

  test("join_theta_band is a hash/merge equi-join, not a nested loop") {
    val p = plan(JoinOps.joinThetaBand(spark, sf001))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("join_range_bucketed is an equi-join on the bucket, not a nested loop") {
    val p = plan(JoinOps.joinRangeBucketed(spark, sf001))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    // the bucket equality must be a real join key (hash or merge join)
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
           p.contains("ShuffledHashJoin"), p)
  }

  test("dedup_bloom_prefilter probes the bloom BELOW the residual join") {
    val p = plan(CorpusOps.dedupBloomPrefilter(spark, sf001))
    assert(p.contains("might_contain"), p)
    // the probe must be a pre-join Filter, not post-join: every
    // might_contain occurrence sits strictly after (deeper than) the
    // last join operator line in the tree printout
    val lines = p.linesIterator.toSeq
    val joinIdx = lines.lastIndexWhere(l =>
      l.contains("HashJoin") || l.contains("SortMergeJoin"))
    val probeIdx = lines.indexWhere(_.contains("might_contain"))
    assert(joinIdx >= 0 && probeIdx > joinIdx,
      s"bloom probe not below the join (join@$joinIdx, probe@$probeIdx)\n$p")
  }

  test("agg_regression partial-aggregates the regr_* co-moments") {
    val p = plan(AggOps.aggRegression(spark, sf001))
    assert(p.contains("partial_regr_slope") || p.contains("partial_"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("sim_knn_topk has no cartesian product and no sort of the scored pairs") {
    val p = plan(TextOps.simKnnTopk(spark, sf001))
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("topk_by_score"), p)
    assert(!p.contains("Window"), p) // bounded-heap aggregate replaced the window
  }

  test("agg_hash_groupby does partial (map-side) aggregation") {
    val p = plan(AggOps.aggHashGroupby(spark, sf001))
    assert(p.contains("HashAggregate"), p)
    assert(p.contains("partial_"), p)
  }

  test("join_multiway_5 broadcasts the nation and region dimensions") {
    val p = plan(JoinOps.joinMultiway5(spark, sf001))
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("dedup_embedding_cosine is banded equi-joins, not an all-pairs scan") {
    val p = plan(LlmOps.dedupEmbeddingCosine(spark, sf001))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("join_asof partial-aggregates (max_by) before the exchange") {
    val p = plan(JoinOps.joinAsof(spark, sf001))
    val partialIdx = p.indexOf("partial_max_by")
    assert(partialIdx >= 0, p)
    // the map-side partial sits BELOW (after, in toString order) no
    // exchange other than the broadcast: the shuffle above it carries
    // one row per left row
    assert(p.contains("max_by"), p)
  }

  test("win_ntile has no partition-less window (global sort eliminated)") {
    val p = plan(WindowOps.winNtile(spark, sf001))
    // a windowspecdefinition whose FIRST argument is an order spec has
    // an empty partition clause — the single-task global window the
    // ntileByRange rewrite exists to avoid
    p.linesIterator.filter(_.contains("windowspecdefinition(")).foreach { l =>
      assert(!l.matches(""".*windowspecdefinition\([^,]*(ASC|DESC) NULLS (FIRST|LAST).*"""), l)
    }
    // the quantile sketch runs as its own eager job at build time and
    // lands in the plan as a LITERAL boundary array — the graded plan
    // must stay as clean as the fixed-width variant's: N rides the
    // metadata offsets broadcast, no scalar-count cross join, no
    // single-partition exchange, no NLJ
    assert(!p.contains("Exchange SinglePartition"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // and the adaptive boundaries are really in the plan, as the
    // BINARY-SEARCH when-tree (one plan line nesting many CASE WHEN
    // boundary comparisons) — not the linear size(filter(...)) HOF
    // scan, whose per-evaluation cost the rank machinery pays 3×
    // (join key / aggregate key / window partition carry no
    // subexpression elimination; measured 1.8s of win_ntile's 2.3s
    // sf0.1 wall before the tree rewrite)
    assert(!p.contains("size(filter("), p)
    val treeLine = p.linesIterator.find(l =>
      l.sliding("CASE WHEN".length).count(_ == "CASE WHEN") >= 5)
    assert(treeLine.isDefined, p)
  }

  test("text_sample_per_group uses the bounded heap, not a per-language window") {
    val p = plan(LlmOps.textSamplePerGroup(spark, sf001))
    assert(p.contains("topk_by_score"), p)
    assert(!p.contains("windowspecdefinition"), p)
    assert(p.contains("BroadcastHashJoin"), p) // picks broadcast back to docs
  }

  test("agg_mode_argmax partial-aggregates max_by (no window over counts)") {
    val p = plan(AggOps.aggModeArgmax(spark, sf001))
    assert(p.contains("partial_max_by"), p)
    assert(!p.contains("windowspecdefinition"), p)
  }

  test("etl_scd2_intervals windows are keyed by user (no global window)") {
    val p = plan(EtlOps.etlScd2Intervals(spark, sf001))
    p.linesIterator.filter(_.contains("windowspecdefinition(")).foreach { l =>
      assert(!l.matches(""".*windowspecdefinition\([^,]*(ASC|DESC) NULLS (FIRST|LAST).*"""), l)
    }
    // both windows partition by user_id and the change filter preserves
    // order, so the lead window must reuse the lag window's exchange:
    // exactly one hash exchange in the whole plan
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1, p)
    // backstop for the regex above (it can't see past a comma inside a
    // multi-arg ORDER BY expression): a partition-less window would
    // also surface as a single-partition exchange
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("chunkByRange windows carry a partition spec (no global data window)") {
    val p = plan(EtlOps.etlChunkBatches(spark, sf001))
    // every Window line must list a partition spec: the data window is
    // keyed by bucket; the metadata prefix-sum by a constant key
    p.linesIterator.filter(_.trim.startsWith("+- Window")).foreach { l =>
      assert(l.contains("windowspecdefinition(") &&
        !l.matches(""".*windowspecdefinition\([^,]*(ASC|DESC) NULLS (FIRST|LAST).*"""), l)
    }
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("graph_pagerank iterates over the checkpointed edge list, not the fact joins") {
    val p = plan(GraphOps.graphPagerank(spark, sf001))
    // the 5 unrolled iterations must re-read the materialized
    // (localCheckpoint'd) transition table — visible as ExistingRDD
    // scans — and must NOT replay the lineitem⋈orders⋈customer⋈
    // supplier derivation per iteration
    assert(p.contains("Scan ExistingRDD"), p)
    val factScans = p.linesIterator.count(_.contains("lineitem.parquet"))
    assert(factScans == 0, s"fact joins replayed in the iteration plan:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("graph_triangle_count enumerates via equi-joins (no nested loop)") {
    val p = plan(GraphOps.graphTriangleCount(spark, sf001))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("agg_unpivot expands rows without any extra exchange") {
    val p = plan(AggOps.aggUnpivot(spark, sf001))
    // unpivot is an Expand over the aggregate output; the only
    // exchanges are the aggregate's own and the final total-order sort
    assert(p.contains("Expand"), p)
    val exchanges = p.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 3, s"unexpected exchanges ($exchanges):\n$p")
  }

  test("minhash/simhash fan-outs run AFTER the doc-id repartition") {
    // the round-6 single-task-scan fix: the expensive md5 fan-out must
    // sit above an Exchange keyed by doc_id, not inside the scan stage
    Seq(plan(TextOps.dedupMinhashNear(spark, sf001)),
        plan(LlmOps.textSimhash(spark, sf001))).foreach { p =>
      val lines = p.linesIterator.toSeq
      val md5Idx = lines.indexWhere(_.contains("md5("))
      val exIdxs = lines.zipWithIndex.collect {
        case (l, i) if l.contains("Exchange hashpartitioning(doc_id") => i }
      assert(md5Idx >= 0 && exIdxs.exists(_ > md5Idx),
        s"md5 fan-out not above a doc_id exchange (md5@$md5Idx, ex@$exIdxs)\n$p")
    }
  }

  test("join_null_safe plans the <=> key as a real equi-join") {
    val p = plan(JoinOps.joinNullSafe(spark, sf001))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
           p.contains("ShuffledHashJoin"), p)
  }

  test("etl_outlier_zscore broadcasts the stats back — no window, no fact re-shuffle") {
    val p = plan(EtlOps.etlOutlierZscore(spark, sf001))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("Window"), p)
    assert(p.contains("partial_sum") || p.contains("partial_"), p)
    // the fact side must reach the join straight from the scan: the
    // only hash exchange belongs to the stats aggregate
    val hashEx = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashEx <= 1, s"unexpected fact shuffle ($hashEx hash exchanges):\n$p")
  }

  test("join_partition_pruned carries the runtime pruning subquery") {
    val p = plan(JoinOps.joinPartitionPruned(spark, sf001))
    assert(p.toLowerCase.contains("dynamicpruning"), p.take(4000))
  }

  test("join_lateral_topk decorrelates to a keyed window, not a per-row loop") {
    val p = plan(JoinOps.joinLateralTopk(spark, sf001))
    // the lateral ORDER BY/LIMIT must become a rank over the
    // correlation key — one window, one join, zero nested loops
    assert(p.contains("Window"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("agg_filter_clause is ONE hash aggregate pass — no self-joins") {
    val p = plan(AggOps.aggFilterClause(spark, sf001))
    // the distinct FILTER aggregate costs one expand, never a join
    assert(!p.contains("Join"), p)
    assert(p.contains("partial_"), p)
  }

  test("attribution and interval join are user-keyed equi-joins with residuals, not loops") {
    Seq(EtlOps.eventsAttributionLasttouch(spark, sf001),
        StreamOps.streamJoinInterval(spark, sf001),
        EtlOps.joinScd2Pointintime(spark, sf001)).foreach { df =>
      val p = plan(df)
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
             p.contains("BroadcastHashJoin"), p)
    }
  }

  test("BPE pair explode runs off the vocab aggregate, not the raw corpus") {
    val p = plan(CorpusOps.textBpePairCounts(spark, sf001))
    // shape: corpus wordcount agg BELOW the pair explode (Generate) —
    // the explode's input is the vocabulary, so the corpus is read once
    val lines = p.linesIterator.toSeq
    val genIdx = lines.indexWhere(_.contains("Generate"))
    val aggBelow = lines.drop(genIdx + 1).exists(_.contains("HashAggregate"))
    assert(genIdx >= 0 && aggBelow, s"pair explode not fed by the vocab aggregate\n$p")
  }

  test("text_ngram_novelty shuffles grams once and never joins pairwise") {
    val p = plan(TextOps.textNgramNovelty(spark, sf001))
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
    // shape: distinct agg + one window by shingle + final doc agg —
    // no join operator at all
    assert(!p.contains("Join"), p)
  }

  test("join_asof_nearest reduces candidates with a partial min_by, not a window") {
    val p = plan(JoinOps.joinAsofNearest(spark, sf001))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert(!p.contains("Window"), p)
    assert(p.contains("partial_min_by"), p) // map-side argmin before the shuffle
  }

  test("events_ab_ttest is one moment aggregate — no window, no sample collect") {
    val p = plan(EtlOps.eventsAbTtest(spark, sf001))
    assert(!p.contains("Window") && !p.contains("CartesianProduct"), p)
    assert(p.contains("partial_"), p) // moments combine map-side
    // the events fact is scanned once; A/B split happens post-agg on
    // the |types|·2 moment rows, not via two scans of the raw events
    assert(p.sliding("events.parquet".length).count(_ == "events.parquet") == 1, p)
  }

  test("round-13 ops: single-pass moments, keyed joins, no loop joins") {
    // #229 ANOVA: ONE partial-aggregated corpus pass — no window, no
    // join; all nine conditional moments combine map-side
    val pA = plan(AggOps.aggAnovaF(spark, sf001))
    assert(!pA.contains("Window") && !pA.contains("Join"), pA)
    assert(pA.contains("partial_"), pA)
    // #235 position attribution: user-keyed equi-joins with time
    // residuals — never a nested loop over clicks×purchases
    val pP = plan(EtlOps.eventsAttributionPosition(spark, sf001))
    assert(!pP.contains("BroadcastNestedLoopJoin") &&
           !pP.contains("CartesianProduct"), pP)
    // #232 Jaccard links: #218's neighbor-keyed candidate machinery +
    // broadcast degree attaches — no cartesian anywhere, and the
    // degree attaches actually broadcast
    val pJ = plan(GraphOps.graphJaccardLinks(spark, sf001))
    assert(!pJ.contains("CartesianProduct") &&
           !pJ.contains("BroadcastNestedLoopJoin"), pJ)
    assert(pJ.contains("BroadcastHashJoin"), pJ)
    // #236 BH-FDR: one corpus scan into the (type, arm) moment
    // aggregate; every window below runs over the m-row test table
    val pF = plan(EtlOps.eventsFdrBh(spark, sf001))
    assert(pF.sliding("events.parquet".length)
      .count(_ == "events.parquet") == 1, pF)
    assert(!pF.contains("CartesianProduct"), pF)
    // #237 Bayes A/B: user-keyed aggregate + 1-row fold — no window,
    // no join, single scan
    val pB = plan(EtlOps.eventsBayesAb(spark, sf001))
    assert(!pB.contains("Window") && !pB.contains("Join"), pB)
    assert(pB.sliding("events.parquet".length)
      .count(_ == "events.parquet") == 1, pB)
  }

  test("sketch aggregates (theta, kll) combine partials map-side") {
    // both sketch pipelines must show partial aggregation below the
    // exchange — KB-sized sketch state per (group, partition) is the
    // entire point of the mergeable-sketch surface at 100 TB
    val pTheta = plan(AggOps.aggThetaAudienceOverlap(spark, sf001))
    assert(pTheta.contains("partial_theta_sketch_agg"), pTheta.take(3000))
    assert(pTheta.contains("partial_theta_union_agg"), pTheta.take(3000))
    val pKll = plan(AggOps.aggKllQuantileMerge(spark, sf001))
    assert(pKll.contains("partial_kll_sketch_agg_double"), pKll.take(3000))
  }

  test("maxsim broadcasts the query side and heaps top-k before the shuffle") {
    val p = plan(VecOps.simMaxsimMultivec(spark, sf001))
    // the only loop join is the intentional broadcast-of-queries
    // scored scan (SCALE.md #176); the document side must be the
    // streamed side and the per-query heap must reduce map-side so
    // the shuffle carries <= k rows per query per partition
    assert(p.contains("BroadcastExchange"), p)
    assert(p.contains("partial_topk_by_score"), p)
    assert(!p.contains("Window"), p) // bounded heap, never rank-over-scored-pairs
    assert(!p.contains("CartesianProduct"), p)
  }
}
