package graft

import org.apache.spark.sql.functions._
import graft.ops.{AggOps, ScanOps}

/** Analytical invariants for the round-12 operators beyond the DuckDB
  * hash sweep: the z-order layout must actually BUY data-skipping over
  * a 1-D sort, and the frequent-items sketch must be merge-consistent. */
class Round12OpsSpec extends SparkSpec {

  test("z-order layout: equal shards, and the query box touches strictly fewer shards than a 1-D sort") {
    val rows = ScanOps.layoutZorderPruning(spark, sf01).collect()
    assert(rows.length == 64)
    // equal-cut: ntile semantics — shard sizes within 1 of each other,
    // summing to the table
    val sizes = rows.map(_.getAs[Long]("n_rows"))
    assert(sizes.max - sizes.min <= 1, sizes.toSeq)
    assert(sizes.sum == Tables.lineitem(spark, sf01).count())
    // bucket-space bboxes live in [0, 256)
    rows.foreach { r =>
      assert(r.getAs[Long]("bx_min") >= 0 && r.getAs[Long]("bx_max") < 256)
      assert(r.getAs[Long]("by_min") >= 0 && r.getAs[Long]("by_max") < 256)
    }
    val zTouched = rows.count(_.getAs[Boolean]("box_hit"))
    // the same 32-shard layout sorted by partkey ALONE: every shard
    // spans the full suppkey range, so the box prunes only on one
    // dimension — the baseline z-order exists to beat
    val li = Tables.lineitem(spark, sf01)
      .select(col("l_orderkey"), col("l_linenumber"),
              col("l_partkey"), col("l_suppkey"))
    val bounds = li.agg(
      min(col("l_partkey")).as("pk_min"), max(col("l_partkey")).as("pk_max"),
      min(col("l_suppkey")).as("sk_min"), max(col("l_suppkey")).as("sk_max"))
    val b = ScanOps.zorderCols("div").foldLeft(li.crossJoin(broadcast(bounds))) {
      case (df, (name, sql)) => df.withColumn(name, expr(sql))
    }
    val oneD = graft.api.Transforms.ntileBySketch(b, col("zbx"),
        struct(col("zbx"), col("l_orderkey"), col("l_linenumber")),
        n = 64, coarseBuckets = 32)
      .groupBy(col("ntile"))
      .agg(min(col("zbx")).as("bx_min"), max(col("zbx")).as("bx_max"),
           min(col("zby")).as("by_min"), max(col("zby")).as("by_max"))
      .where(col("bx_max") >= 102 && col("bx_min") <= 153 &&
             col("by_max") >= 102 && col("by_min") <= 153)
      .count()
    info(s"box touches $zTouched/64 z-ordered shards vs $oneD/64 partkey-sorted shards")
    assert(zTouched > 0, "the center box must touch something")
    assert(zTouched < oneD,
      s"z-order layout must prune better than the 1-D sort: z=$zTouched 1d=$oneD")
  }

  test("hybrid RRF: 5 descending fused results per query, scores in the two-list envelope") {
    val rows = graft.ops.LlmOps.simHybridRrf(spark, sf01).collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.size == 8, s"expected 8 queries, got ${byQ.size}")
    byQ.foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rnk"))
      assert(sorted.map(_.getAs[Int]("rnk")).toSeq == (1 to 5), s"query $q ranks")
      val scores = sorted.map(_.getAs[Double]("rrf_score"))
      assert(scores.sameElements(scores.sorted.reverse), s"query $q order")
      // a score is 1/(60+r) summed over the ≤2 lists holding the doc,
      // r in 1..10: envelope (0, 2/61]
      scores.foreach(s => assert(s > 0.0 && s <= 2.0 / 61 + 1e-9, s"query $q score $s"))
      assert(!sorted.exists(_.getAs[Long]("doc_id") == q), s"query $q returned itself")
    }
  }

  test("frequent-items sketch: per-source merge equals one global accumulate; flags all true") {
    val out = AggOps.aggFreqSketchTopk(spark, sf01).collect()
    assert(out.length == 10)
    assert(out.forall(_.getAs[Boolean]("est_within_1pct")),
      out.filterNot(_.getAs[Boolean]("est_within_1pct")).mkString(","))
    // counts arrive sorted desc with token tie-break
    val counts = out.map(_.getAs[Long]("n_exact")).toSeq
    assert(counts == counts.sorted.reverse)
    // merge consistency: combining per-source partials must equal one
    // corpus-wide accumulate (both in exact mode at this vocab)
    val toks = Tables.documents(spark, sf01)
      .select(col("source"), explode(split(col("text"), " ")).as("token"))
      .where(length(col("token")) > 0)
    toks.createOrReplaceTempView("r12_toks")
    val merged = spark.sql(
      """SELECT approx_top_k_estimate(approx_top_k_combine(sk, 100), 50) FROM
        |  (SELECT approx_top_k_accumulate(token, 100) sk
        |   FROM r12_toks GROUP BY source)""".stripMargin)
      .head().getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val direct = spark.sql(
      "SELECT approx_top_k(token, 50, 100) FROM r12_toks")
      .head().getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(merged == direct,
      s"partial-merge drift: ${(merged diff direct) ++ (direct diff merged)}")
  }

  test("BM25: 10 descending positive scores per query, never the query itself") {
    val rows = graft.ops.CorpusOps.simBm25Rank(spark, sf01).collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.size == 8, s"expected 8 queries, got ${byQ.size}")
    byQ.foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rnk"))
      assert(sorted.map(_.getAs[Int]("rnk")).toSeq == (1 to 10), s"query $q ranks")
      val scores = sorted.map(_.getAs[Double]("bm25"))
      assert(scores.sameElements(scores.sorted.reverse), s"query $q order")
      assert(scores.forall(_ > 0.0), s"query $q: +1-form idf keeps scores positive")
      assert(!sorted.exists(_.getAs[Long]("doc_id") == q), s"query $q returned itself")
    }
  }

  test("LSH-RP ANN: recall@5 vs brute force beats chance by >=2x; ranks well-formed") {
    val ann = graft.ops.VecOps.simAnnLshRp(spark, sf01).collect()
    val byQ = ann.groupBy(_.getAs[Long]("q_id"))
    byQ.foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rnk"))
      assert(sorted.map(_.getAs[Int]("rnk")).toSeq == (1 to sorted.length), s"query $q ranks")
      val scores = sorted.map(_.getAs[Double]("cos_sim"))
      assert(scores.sameElements(scores.sorted.reverse), s"query $q order")
      assert(!sorted.exists(_.getAs[Long]("i_id") == q), s"query $q returned itself")
    }
    // ground truth: brute-force top-5 for the same hash-sampled queries
    val e = Tables.embeddings(spark, sf01).select(col("vec_id"), col("embedding"))
    val n = e.count()
    val q = e.withColumn("h", md5(concat(col("vec_id").cast("string"), lit("#lq"))))
      .orderBy(col("h"), col("vec_id")).limit(8)
      .select(col("vec_id").as("q_id"))
    val qe = e.join(broadcast(q), col("vec_id") === col("q_id"))
      .select(col("q_id"), col("embedding"))
    val truth = graft.api.Transforms.knnTopK(qe, e,
        col("q_id"), col("embedding"), col("vec_id"), col("embedding"), 5)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("i_id"))).toSet
    val hits = ann.count(r =>
      truth((r.getAs[Long]("q_id"), r.getAs[Long]("i_id"))))
    val recall = hits.toDouble / truth.size
    val chance = 5.0 / (n - 1)
    info(f"LSH-RP recall@5 = $recall%.3f (chance $chance%.5f)")
    assert(recall >= 2 * chance,
      f"recall $recall%.4f under 2x chance ${2 * chance}%.5f")
  }

  test("importance resample: every doc decided, copies bracket the 4x-weight target") {
    val rows = graft.ops.CorpusOps.textImportanceResample(spark, sf01).collect()
    assert(rows.length == Tables.documents(spark, sf01).count())
    rows.foreach { r =>
      val w = r.getAs[Double]("weight")
      val c = r.getAs[Int]("n_copies")
      assert(w > 0.0 && w <= 1.0, s"weight $w out of range")
      assert(c == math.floor(4 * w).toInt || c == math.floor(4 * w).toInt + 1,
        s"doc ${r.getAs[Long]("doc_id")}: n_copies $c vs weight $w")
    }
    // the realized epoch mass tracks the target: Bernoulli rounding
    // moves each doc by <1, so the corpus sum sits within n of 4*sum(w)
    val target = rows.map(r => 4 * r.getAs[Double]("weight")).sum
    val got = rows.map(_.getAs[Int]("n_copies").toLong).sum
    assert(math.abs(got - target) <= rows.length, s"sum copies $got vs target $target")
  }

  test("seasonal decompose: additive identity holds and components are well-formed") {
    val rows = graft.ops.EtlOps.tsSeasonalDecompose(spark, sf01).collect()
    assert(rows.length == 30, s"expected 30 days, got ${rows.length}")
    rows.foreach { r =>
      val (daily, trend, seasonal, residual) =
        (r.getAs[Double]("daily"), r.getAs[Double]("trend"),
         r.getAs[Double]("seasonal"), r.getAs[Double]("residual"))
      // residual is defined as the rounded remainder, so the identity
      // closes to the 4dp grid
      assert(math.abs(daily - (trend + seasonal + residual)) <= 1e-4 + 1e-9,
        s"identity broke: $daily vs ${trend + seasonal + residual}")
      val dow = r.getAs[Int]("dow")
      assert(dow >= 0 && dow <= 6, s"dow $dow")
    }
    // the 7 seasonal components must be shared across weeks (one value
    // per dow), and trend must smooth: its spread is below the daily spread
    assert(rows.groupBy(_.getAs[Int]("dow")).forall {
      case (_, rs) => rs.map(_.getAs[Double]("seasonal")).distinct.length == 1 })
    def spread(xs: Seq[Double]) = xs.max - xs.min
    assert(spread(rows.map(_.getAs[Double]("trend")).toSeq) <
           spread(rows.map(_.getAs[Double]("daily")).toSeq))
  }

  test("SRM check: rollup total equals the per-experiment sums; flag matches the statistic") {
    val rows = graft.ops.EtlOps.eventsSrmCheck(spark, sf01).collect()
    val (all, per) = rows.partition(_.getAs[String]("experiment") == "__all__")
    assert(all.length == 1 && per.length == 5, s"got ${rows.length} rows")
    assert(all.head.getAs[Long]("n_a") == per.map(_.getAs[Long]("n_a")).sum)
    assert(all.head.getAs[Long]("n_b") == per.map(_.getAs[Long]("n_b")).sum)
    rows.foreach { r =>
      val (na, nb) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
      val chi2 = (na - nb).toDouble * (na - nb) / (na + nb)
      assert(math.abs(chi2 - r.getAs[Double]("chi2")) <= 5e-5)
      assert(r.getAs[Boolean]("srm_detected") == chi2 > 3.841)
    }
  }

  test("patch grid: patches tile each image exactly; means are channel-bounded") {
    val rows = graft.ops.LlmOps.multimodalPatchGrid(spark, sf01).collect()
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.size == Tables.documents(spark, sf01).count())
    byDoc.foreach { case (id, ps) =>
      val (w, h) = graft.multimodal.BinaryDecode.syntheticDims(id)
      assert(ps.map(_.getAs[Long]("n_pix")).sum == w.toLong * h,
        s"doc $id: patches must tile the $w x $h raster")
      assert(ps.length == ((w + 3) / 4) * ((h + 3) / 4), s"doc $id patch count")
      ps.foreach { p =>
        val m = p.getAs[Double]("mean_val")
        assert(m >= 0 && m <= 255, s"doc $id mean $m")
        assert(p.getAs[Long]("n_pix") >= 1 && p.getAs[Long]("n_pix") <= 16)
      }
    }
  }

  test("grid-neighbor join equals the brute-force theta-join exactly") {
    val grid = graft.ops.JoinOps.joinGridNeighbors(spark, sf01).collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"))).toSet
    val p = Tables.part(spark, sf01)
      .select(col("p_partkey"), col("p_retailprice"), col("p_size")).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    val brute = (for {
      (i1, x1, y1) <- p; (i2, x2, y2) <- p
      if i1 < i2 && y1 == y2 && math.abs(x1 - x2) < 1.0
    } yield (i1, i2)).toSet
    assert(grid == brute,
      s"grid-join drift: missing=${brute diff grid} extra=${grid diff brute}")
    assert(grid.nonEmpty)
  }

  test("EWMA: first row equals the daily value; series matches a local recompute") {
    val out = graft.ops.WindowOps.winEwmaSmooth(spark, sf01).collect()
    assert(out.length == 30)
    val daily = out.map(_.getAs[Double]("daily"))
    val ewma = out.map(_.getAs[Double]("ewma8"))
    assert(math.abs(ewma.head - daily.head) < 5e-5, "day 1 has only lag0")
    out.indices.foreach { t =>
      var num = 0.0; var den = 0.0
      (0 to 7).foreach { k =>
        if (t - k >= 0) { num += math.pow(0.5, k) * daily(t - k)
                          den += math.pow(0.5, k) }
      }
      assert(math.abs(ewma(t) - num / den) <= 5e-5 + 1e-9,
        s"t=$t: ${ewma(t)} vs ${num / den}")
    }
    def spread(xs: Seq[Double]) = xs.max - xs.min
    assert(spread(ewma.toSeq) < spread(daily.toSeq), "EWMA must smooth")
  }

  test("Poisson bootstrap: ordered CI brackets the full-sample mean per arm") {
    val rows = graft.ops.EtlOps.eventsBootstrapCi(spark, sf01).collect()
    assert(rows.map(_.getAs[String]("arm")).sorted.toSeq == Seq("A", "B"))
    rows.foreach { r =>
      val (m, p05, p50, p95) = (r.getAs[Double]("mean_full"),
        r.getAs[Double]("boot_p05"), r.getAs[Double]("boot_p50"),
        r.getAs[Double]("boot_p95"))
      assert(p05 < p50 && p50 < p95, s"order: $p05 $p50 $p95")
      // resampling the mean of 10k values: the 90% CI must contain
      // the point estimate and be tight relative to the value scale
      assert(p05 <= m && m <= p95, s"CI [$p05,$p95] misses mean $m")
      assert((p95 - p05) < m * 0.2, s"CI implausibly wide: ${p95 - p05}")
    }
  }

  test("mutual information: entropies at the uniform ceiling, near-independent MI, NMI in [0,1]") {
    val r = graft.ops.AggOps.aggMutualInfo(spark, sf01).head()
    val (mi, hx, hy, nmi) = (r.getAs[Double]("mi"), r.getAs[Double]("h_x"),
      r.getAs[Double]("h_y"), r.getAs[Double]("nmi"))
    // 5 near-uniform event types, 7 near-uniform weekdays (30-day span)
    assert(hx <= math.log(5.0) + 1e-6 && hx > 0.97 * math.log(5.0), s"h_x $hx")
    assert(hy <= math.log(7.0) + 1e-6 && hy > 0.9 * math.log(7.0), s"h_y $hy")
    assert(mi >= 0 && mi < 0.05, s"synthetic type/dow should be near-independent: $mi")
    assert(nmi >= 0 && nmi <= 1, s"nmi $nmi")
  }

  test("CUSUM: exactly one changepoint, series starts/ends near zero, flag is the argmax") {
    val rows = graft.ops.EtlOps.tsChangepointCusum(spark, sf01).collect()
    assert(rows.length == 30)
    assert(rows.count(_.getAs[Boolean]("is_changepoint")) == 1)
    val cusum = rows.map(_.getAs[Double]("cusum"))
    // CUSUM telescopes to ~0 at the last day (rounding residue only)
    assert(math.abs(cusum.last) < 0.01, s"terminal cusum ${cusum.last}")
    val flagged = rows.filter(_.getAs[Boolean]("is_changepoint")).head
    assert(math.abs(flagged.getAs[Double]("cusum")) >= cusum.map(math.abs).max - 1e-9)
  }

  test("power table: n_required scales as 1/delta^2 and brackets a local recompute") {
    val rows = graft.ops.EtlOps.eventsPowerMde(spark, sf01).collect()
      .sortBy(_.getAs[Int]("effect_pct"))
    assert(rows.map(_.getAs[Int]("effect_pct")).toSeq == Seq(1, 2, 5))
    val nreq = rows.map(_.getAs[Long]("n_required"))
    // quadratic law: halving the effect quadruples n (ceil slack 1)
    assert(math.abs(nreq(0) - 4L * nreq(1)) <= 4, s"${nreq(0)} vs 4x${nreq(1)}")
    rows.foreach { r =>
      val (v, m, d) = (r.getAs[Double]("var_pooled"),
        r.getAs[Double]("mean_pooled"), r.getAs[Double]("delta_abs"))
      val z = 1.959963984540054 + 0.8416212335729143
      val expected = math.ceil(2.0 * v * z * z / (d * d))
      // delta_abs is the 4dp-rounded display value; the op uses the
      // unrounded delta, so allow the tiny induced slack
      assert(math.abs(r.getAs[Long]("n_required") - expected) <= expected * 0.001 + 2,
        s"${r.getAs[Long]("n_required")} vs $expected")
      assert(r.getAs[Boolean]("powered") ==
        (r.getAs[Long]("n_available") >= r.getAs[Long]("n_required")))
    }
  }

  test("ACF: lags 1-7 present, coefficients in [-1,1], pair counts = n_days - lag") {
    val rows = graft.ops.EtlOps.tsAutocorrelation(spark, sf01).collect()
      .sortBy(_.getAs[Int]("lag"))
    assert(rows.map(_.getAs[Int]("lag")).toSeq == (1 to 7))
    val nDays = rows.head.getAs[Long]("n_days")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_pairs") == nDays - r.getAs[Int]("lag"))
      val a = r.getAs[Double]("acf")
      assert(a >= -1.0 && a <= 1.0, s"acf out of range: $a")
    }
  }

  test("Gini equals a local brute-force recompute; top decile holds at least its share") {
    val row = graft.ops.AggOps.aggGiniConcentration(spark, sf01).collect().head
    val revs = Tables.orders(spark, sf01)
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
      .collect().map(_.getAs[java.math.BigDecimal]("rev").doubleValue()).sorted
    val n = revs.length.toLong
    val tot = revs.sum
    val ranksum = revs.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
    val gini = (2.0 * ranksum - (n + 1) * tot) / (n * tot)
    assert(row.getAs[Long]("n_customers") == n)
    assert(math.abs(row.getAs[Double]("gini") - gini) < 1e-4,
      s"${row.getAs[Double]("gini")} vs local $gini")
    assert(row.getAs[Double]("top_decile_share") >= 0.1,
      "top decile cannot hold less than its uniform share")
  }

  test("KS test: reject flag is consistent with D vs critical value; D in [0,1]") {
    val row = graft.ops.AggOps.aggKsTest(spark, sf01).collect().head
    val d = row.getAs[Double]("ks_d")
    assert(d >= 0.0 && d <= 1.0)
    // md5-arm split of the same distribution: D must sit well under
    // the rejection threshold (the null is TRUE by construction)
    assert(!row.getAs[Boolean]("reject_h0"),
      s"uniform md5 split flagged as drift: d=$d crit=${row.getAs[Double]("d_crit")}")
  }

  test("RFM: quartiles balanced within 1 and segment counts sum to the customer total") {
    val rows = graft.ops.AggOps.aggRfmSegments(spark, sf01).collect()
    val total = rows.map(_.getAs[Long]("n_customers")).sum
    val nCust = Tables.orders(spark, sf01).select(col("o_custkey")).distinct().count()
    assert(total == nCust, s"$total vs $nCust")
    Seq("r_q", "f_q", "m_q").foreach { dim =>
      val byQ = rows.groupBy(_.getAs[Long](dim)).view
        .mapValues(_.map(_.getAs[Long]("n_customers")).sum)
      assert(byQ.keys.toSet == Set(1L, 2L, 3L, 4L))
      assert(byQ.values.max - byQ.values.min <= 1,
        s"$dim unbalanced: ${byQ.toMap}")
    }
  }

  test("windowed funnel: stage counts are monotone and bounded by the unbounded stage sets") {
    val row = graft.ops.EtlOps.eventsFunnelWindowed(spark, sf01).collect().head
    val (s, v, p) = (row.getAs[Long]("n_signup"), row.getAs[Long]("n_view_7d"),
      row.getAs[Long]("n_purchase_7d"))
    assert(s >= v && v >= p, s"funnel not monotone: $s $v $p")
    assert(p > 0, "the 7-day funnel should convert someone at sf0.01")
  }

  test("entity resolution: every planted variant is found (recall 1.0 on true dupes)") {
    val rows = graft.ops.EtlOps.etlEntityResolution(spark, sf01).collect()
    val planted = Tables.customer(spark, sf01)
      .where(pmod(col("c_custkey"), lit(3)) === 0)
      .groupBy(col("c_nationkey")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val nation = r.getAs[Int]("nation")
      // a variant differs from its original by exactly one dropped
      // char (distance 1 <= 2), so the matcher must find ALL of them
      assert(r.getAs[Long]("n_true_dupes") == planted.getOrElse(nation, 0L),
        s"nation $nation: ${r.getAs[Long]("n_true_dupes")} vs planted ${planted.get(nation)}")
      assert(r.getAs[Long]("n_matches") >= r.getAs[Long]("n_true_dupes"))
      assert(r.getAs[Long]("n_candidates") ==
        r.getAs[Long]("n_records") * (r.getAs[Long]("n_records") - 1) / 2)
    }
  }

  test("label propagation: sizes sum to the node count, every community label is a member") {
    val rows = graft.ops.GraphOps.graphLabelPropagation(spark, sf01).collect()
    assert(rows.length == 25)
    val byLbl = rows.groupBy(_.getAs[Int]("community"))
    assert(byLbl.map(_._2.length.toLong).sum == 25)
    byLbl.foreach { case (lbl, members) =>
      // community_size column agrees with the actual member count
      members.foreach(m => assert(m.getAs[Long]("community_size") == members.length))
      // a propagated label is always some node's id — and with min-label
      // tie-breaking, the labeling must be a valid node id in range
      assert(lbl >= 0 && lbl < 25)
    }
    // propagation must actually merge something: fewer communities than nodes
    assert(byLbl.size < 25, s"no propagation happened: ${byLbl.size} communities")
  }

  test("BPE training: merge counts are non-increasing and merged token = pair minus space") {
    val rows = graft.ops.CorpusOps.textBpeTrainMerges(spark, sf01).collect()
      .sortBy(_.getAs[Int]("step"))
    assert(rows.map(_.getAs[Int]("step")).toSeq == Seq(1, 2, 3))
    rows.foreach { r =>
      val pair = r.getAs[String]("merge_pair")
      assert(pair.count(_ == ' ') == 1, s"pair '$pair' is not binary")
      assert(r.getAs[String]("merged") == pair.replace(" ", ""))
      assert(r.getAs[Long]("n_occurrences") > 0)
    }
    val counts = rows.map(_.getAs[Long]("n_occurrences"))
    assert(counts(0) >= counts(1) && counts(1) >= counts(2),
      s"BPE merge counts must be non-increasing: ${counts.toSeq}")
  }

  test("shot boundaries: scores are the no-wrap constant 15 or a >100 wrap; flag matches") {
    val rows = graft.ops.LlmOps.multimodalShotBoundaries(spark, sf001).collect()
    val expectedPairs = Tables.documents(spark, sf001).select(col("doc_id")).collect()
      .map(r => (r.getLong(0) % 6 + 2 - 1)).sum
    assert(rows.length == expectedPairs, s"${rows.length} vs $expectedPairs")
    rows.foreach { r =>
      val s = r.getAs[Double]("score")
      // channel steps are +7/+5/+3 per frame: without a 256-wrap the
      // score is exactly 15; any wrap jumps it far above the threshold
      assert(s == 15.0 || s > 100.0, s"unexpected score $s")
      assert(r.getAs[Boolean]("is_cut") == (s > 100.0))
    }
    assert(rows.exists(_.getAs[Boolean]("is_cut")), "corpus should contain some wrap cuts")
  }

  test("residual anomalies: med/mad equal a local recompute; flags match the 3-MAD rule") {
    val rows = graft.ops.EtlOps.tsAnomalyResidual(spark, sf01).collect()
    val res = graft.ops.EtlOps.tsSeasonalDecompose(spark, sf01)
      .select(col("day"), col("residual")).collect()
      .sortBy(r => (r.getAs[Double]("residual"), r.getAs[java.sql.Timestamp]("day").getTime))
      .map(_.getAs[Double]("residual"))
    val med = res((res.length + 1) / 2 - 1)
    val devs = res.map(x => math.abs(x - med)).sorted
    val mad = devs((devs.length + 1) / 2 - 1)
    rows.foreach { r =>
      assert(r.getAs[Double]("med") == med)
      assert(r.getAs[Double]("mad") == mad)
      assert(r.getAs[Boolean]("is_anomaly") ==
        (math.abs(r.getAs[Double]("residual") - med) > 3.0 * mad))
    }
  }

  test("Mann-Whitney U equals a driver-side brute-force tie-averaged rank computation") {
    val row = AggOps.aggMannwhitneyU(spark, sf001).collect().head
    val ev = Tables.events(spark, sf001)
      .select(col("value").cast("decimal(18,2)").cast("double").as("v"),
        (ascii(substring(md5(col("user_id").cast("string")), 1, 1)) % 2 === 0)
          .as("isA"))
      .collect().map(r => (r.getDouble(0), r.getBoolean(1)))
    var cum = 0L; var r2a = BigInt(0); var tie3 = BigInt(0)
    var na = 0L; var nb = 0L
    ev.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (_, rs) =>
      val t = rs.length.toLong
      val a = rs.count(_._2).toLong
      r2a += BigInt(a) * (2 * cum + t + 1)
      tie3 += BigInt(t) * t * t - t
      cum += t; na += a; nb += t - a
    }
    val uA = (BigDecimal(r2a) - BigDecimal(na) * BigDecimal(na) - BigDecimal(na))
      .toDouble / 2
    val n = na + nb
    val z = (uA - na.toDouble * nb / 2) /
      math.sqrt(na.toDouble * nb / 12 *
        ((n + 1) - tie3.toDouble / (n * (n - 1).toDouble)))
    assert(row.getAs[Long]("n_a") == na && row.getAs[Long]("n_b") == nb)
    assert(row.getAs[Double]("u_a") == uA)
    assert(math.abs(row.getAs[Double]("z") - z) < 1e-6)
    assert(row.getAs[Boolean]("reject_h0") == (math.abs(z) > 1.959964))
  }

  test("substring-window dedup equals a driver-side brute force over every doc") {
    val out = graft.ops.CorpusOps.dedupSubstringWindow(spark, sf001).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val docs = Tables.documents(spark, sf001)
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def wins(text: String): Set[String] =
      (1 to math.max(text.length - 29, 1) by 10)
        .map(i => text.substring(i - 1, math.min(i + 29, text.length))).toSet
    val perDoc = docs.map { case (id, src, t) => (id, src, wins(t)) }
    val dupSet = perDoc.flatMap { case (id, _, ws) => ws.map(w => (w, id)) }
      .groupBy(_._1).collect { case (w, hits)
        if hits.map(_._2).distinct.length >= 2 => w }.toSet
    perDoc.groupBy(_._2).foreach { case (src, ds) =>
      val dups = ds.map { case (_, _, ws) => ws.count(dupSet).toLong }
      val r = out(src)
      assert(r.getAs[Long]("docs") == ds.length.toLong, s"$src docs")
      assert(r.getAs[Long]("windows") == ds.map(_._3.size.toLong).sum, s"$src windows")
      assert(r.getAs[Long]("dup_windows") == dups.sum, s"$src dup")
      assert(r.getAs[Long]("docs_with_dup") == dups.count(_ > 0).toLong, s"$src dwd")
      assert(r.getAs[Long]("max_dup") == dups.max, s"$src max")
    }
  }

  test("Adamic-Adar equals a driver-side brute force over the co-purchase graph") {
    val rows = graft.ops.GraphOps.graphAdamicAdar(spark, sf001).collect()
    val op = Tables.lineitem(spark, sf001)
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pairCount = scala.collection.mutable.Map.empty[(Long, Long), Int]
    op.groupBy(_._1).values.foreach { ps =>
      val s = ps.map(_._2).distinct.sorted
      for (i <- s.indices; j <- i + 1 until s.length)
        pairCount((s(i), s(j))) = pairCount.getOrElse((s(i), s(j)), 0) + 1
    }
    val edges = pairCount.filter(_._2 >= 2).keySet
    val nbrs = scala.collection.mutable.Map.empty[Long, Set[Long]]
      .withDefaultValue(Set.empty)
    edges.foreach { case (u, v) =>
      nbrs(u) = nbrs(u) + v; nbrs(v) = nbrs(v) + u
    }
    def grid8(x: Double): BigDecimal =
      BigDecimal(x).setScale(8, BigDecimal.RoundingMode.HALF_UP)
    val scores = scala.collection.mutable.Map.empty[(Long, Long), (BigDecimal, Long)]
    nbrs.foreach { case (w, ns) =>
      val s = ns.toSeq.sorted
      val term = grid8(1.0 / math.log(nbrs(w).size.toDouble))
      for (i <- s.indices; j <- i + 1 until s.length) {
        val k = (s(i), s(j))
        val (acc, c) = scores.getOrElse(k, (BigDecimal(0), 0L))
        scores(k) = (acc + term, c + 1)
      }
    }
    val expected = scores.toSeq.collect {
      case ((u, v), (s, c)) if !edges((u, v)) => (u, v, c, s)
    }.sortBy { case (u, v, _, s) => (-s, u, v) }.take(20)
    assert(rows.length == expected.length)
    rows.zip(expected).foreach { case (r, (u, v, c, s)) =>
      assert(r.getAs[Long]("u") == u && r.getAs[Long]("v") == v)
      assert(r.getAs[Long]("common") == c)
      assert(r.getAs[Double]("aa_score") == s.toDouble)
    }
  }

  test("Kneser-Ney: the smoothed conditional sums to exactly 1 over the vocabulary; graded scores are consistent") {
    // Build the bigram model driver-side at sf0.001 and prove the
    // estimator is a proper distribution: for any context w1,
    // sum_{w2 in V} P(w2|w1) = 1 (the continuation unigram sums to 1
    // over the vocab by construction; absolute discounting returns
    // exactly the reserved mass). This is the property add-k also has
    // but MLE-with-backoff hacks lose.
    val bgs = Tables.documents(spark, sf001)
      .select(col("text")).collect().map(_.getString(0))
      .flatMap { t => val w = t.split(" ", -1); w.zip(w.drop(1)) }
    val c = bgs.groupBy(identity).map { case (k, v) => (k, v.length.toLong) }
    val c1 = c.groupBy(_._1._1).map { case (w1, m) => (w1, m.values.sum) }
    val fanout = c.groupBy(_._1._1).map { case (w1, m) => (w1, m.size.toLong) }
    val nc = c.groupBy(_._1._2).map { case (w2, m) => (w2, m.size.toLong) }
    val bt = c.size.toLong
    val vocab = nc.keySet
    val topCtx = c1.toSeq.sortBy(-_._2).take(5).map(_._1)
    topCtx.foreach { w1 =>
      val total = vocab.toSeq.map { w2 =>
        val n = c.getOrElse((w1, w2), 0L)
        math.max(n - 0.75, 0.0) / c1(w1) +
          0.75 * fanout(w1) / c1(w1) * (nc(w2).toDouble / bt)
      }.sum
      assert(math.abs(total - 1.0) < 1e-9, s"context '$w1' sums to $total")
    }
    // graded output consistency: n_bigrams partitions the corpus
    // bigram stream; ppl = exp(avg_nll) up to display rounding
    val rows = graft.ops.CorpusOps.textKneserNeyLm(spark, sf001).collect()
    assert(rows.map(_.getAs[Long]("n_bigrams")).sum == bgs.length.toLong)
    rows.foreach { r =>
      val ppl = math.exp(r.getAs[Double]("avg_nll"))
      assert(math.abs(r.getAs[Double]("ppl") - ppl) < ppl * 1e-4)
    }
  }

  test("Holt forecast equals a driver-side sequential replay of the recursion") {
    val r = graft.ops.EtlOps.tsHoltForecast(spark, sf001).collect().head
    val xs = Tables.events(spark, sf001)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("x"))
      .orderBy(col("day")).collect().map(_.getAs[Double]("x"))
    var l = xs(1); var b = xs(1) - xs(0); var sse = 0.0
    xs.drop(2).foreach { x =>
      val err = x - (l + b)
      val lNew = 0.5 * x + 0.5 * (l + b)
      b = 0.25 * (lNew - l) + 0.75 * b
      l = lNew
      sse += err * err
    }
    assert(r.getAs[Long]("n_days") == xs.length.toLong)
    assert(math.abs(r.getAs[Double]("level") - l) < 1e-6)
    assert(math.abs(r.getAs[Double]("trend") - b) < 1e-6)
    assert(math.abs(r.getAs[Double]("rmse") -
      math.sqrt(sse / (xs.length - 2))) < 1e-6)
    // forecasts extrapolate the final trend linearly
    val (f1, f2, f3) = (r.getAs[Double]("forecast_1"),
      r.getAs[Double]("forecast_2"), r.getAs[Double]("forecast_3"))
    assert(math.abs((f2 - f1) - (f3 - f2)) < 2e-4)
    assert(math.abs((f2 - f1) - r.getAs[Double]("trend")) < 2e-4)
  }

  test("DiD equals a driver-side brute force over the four cells") {
    val r = graft.ops.EtlOps.eventsDiffInDiff(spark, sf001).collect().head
    val ev = Tables.events(spark, sf001)
      .select(to_date(col("ts")).as("day"),
        col("value").cast("decimal(18,2)").cast("double").as("v"),
        (ascii(substring(md5(col("user_id").cast("string")), 1, 1)) % 2 === 0)
          .as("isA"))
      .collect().map(x => (x.getAs[java.sql.Date]("day").toLocalDate,
        x.getAs[Double]("v"), x.getAs[Boolean]("isA")))
    val d0 = ev.map(_._1).min
    val d1 = ev.map(_._1).max
    val span = java.time.temporal.ChronoUnit.DAYS.between(d0, d1)
    def cellOf(e: (java.time.LocalDate, Double, Boolean)) =
      (e._3, java.time.temporal.ChronoUnit.DAYS.between(d0, e._1) * 2 < span + 1)
    val cells = ev.groupBy(cellOf).map { case (k, es) =>
      val n = es.length; val sv = es.map(_._2).sum
      k -> (n.toLong, sv / n,
        (es.map(x => x._2 * x._2).sum - sv * sv / n) / (n - 1) / n)
    }
    val (nAPre, mAPre, vAPre) = cells((true, true))
    val (nAPost, mAPost, vAPost) = cells((true, false))
    val (nBPre, mBPre, vBPre) = cells((false, true))
    val (nBPost, mBPost, vBPost) = cells((false, false))
    val did = (mBPost - mBPre) - (mAPost - mAPre)
    val t = did / math.sqrt(vAPre + vAPost + vBPre + vBPost)
    assert(r.getAs[Long]("n_a_pre") == nAPre && r.getAs[Long]("n_a_post") == nAPost)
    assert(r.getAs[Long]("n_b_pre") == nBPre && r.getAs[Long]("n_b_post") == nBPost)
    assert(math.abs(r.getAs[Double]("m_a_pre") - mAPre) < 1e-4)
    assert(math.abs(r.getAs[Double]("m_b_post") - mBPost) < 1e-4)
    assert(math.abs(r.getAs[Double]("did") - did) < 1e-4)
    assert(math.abs(r.getAs[Double]("t_stat") - t) < 1e-4)
    if (math.abs(math.abs(t) - 1.96) > 1e-3)
      assert(r.getAs[Boolean]("significant") == (math.abs(t) > 1.96))
  }

  test("k-core peel equals a driver-side replay; shrinkage is monotone") {
    val rows = graft.ops.GraphOps.graphKcore(spark, sf001).collect()
      .sortBy(_.getAs[Int]("iter"))
    assert(rows.length == 5)
    // driver-side graph + synchronous peel replay
    val op = Tables.lineitem(spark, sf001)
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pairCount = scala.collection.mutable.Map.empty[(Long, Long), Int]
    op.groupBy(_._1).values.foreach { ps =>
      val s = ps.map(_._2).distinct.sorted
      for (i <- s.indices; j <- i + 1 until s.length)
        pairCount((s(i), s(j))) = pairCount.getOrElse((s(i), s(j)), 0) + 1
    }
    var edges = pairCount.filter(_._2 >= 2).keySet.toSet
    (0 to 4).foreach { iter =>
      if (iter > 0) {
        val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
          .groupBy(identity).map { case (k, v) => (k, v.length) }
        val keep = deg.filter(_._2 >= 3).keySet
        edges = edges.filter(e => keep(e._1) && keep(e._2))
      }
      val nodes = edges.flatMap(e => Set(e._1, e._2)).size
      val r = rows(iter)
      assert(r.getAs[Long]("nodes") == nodes.toLong, s"iter $iter nodes")
      assert(r.getAs[Long]("n_edges") == edges.size.toLong, s"iter $iter edges")
    }
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("nodes") <= a.getAs[Long]("nodes"))
      assert(b.getAs[Long]("n_edges") <= a.getAs[Long]("n_edges"))
    }
  }

  test("Theil-Sen equals a driver-side median-of-slopes replay") {
    val r = graft.ops.EtlOps.tsTheilSen(spark, sf001).collect().head
    val pts = Tables.events(spark, sf001)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("y"))
      .orderBy(col("day")).collect()
      .map(x => (x.getAs[java.sql.Date]("day").toLocalDate, x.getAs[Double]("y")))
    val d0 = pts.map(_._1).min
    val txy = pts.map { case (d, y) =>
      (java.time.temporal.ChronoUnit.DAYS.between(d0, d), y) }
    val slopes = (for {
      i <- txy.indices; j <- txy.indices
      if txy(i)._1 < txy(j)._1
    } yield ((txy(j)._2 - txy(i)._2) / (txy(j)._1 - txy(i)._1),
             txy(i)._1, txy(j)._1)).sortBy(x => (x._1, x._2, x._3))
    val slope = slopes((slopes.length + 1) / 2 - 1)._1
    val ics = txy.map { case (t, y) => (y - slope * t, t) }.sortBy(identity)
    val b = ics((ics.length + 1) / 2 - 1)._1
    assert(r.getAs[Long]("n_days") == txy.length.toLong)
    assert(r.getAs[Long]("n_pairs") == slopes.length.toLong)
    assert(math.abs(r.getAs[Double]("slope") - slope) < 1e-6)
    assert(math.abs(r.getAs[Double]("intercept") - b) < 1e-6)
    val tmax = txy.map(_._1).max
    assert(math.abs(r.getAs[Double]("fit_last") - (slope * tmax + b)) < 1e-4)
  }

  test("correlation matrix: diagonal pins exactly 1, off-diagonals match a driver-side exact-moment replay") {
    val rows = AggOps.aggCorrMatrix(spark, sf001).collect()
    assert(rows.length == 10)
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    rows.filter(r => r.getAs[String]("col_x") == r.getAs[String]("col_y"))
      .foreach(r => assert(r.getAs[Double]("corr") == 1.0, r.toString))
    // exact-moment replay over the collected table
    val data = Tables.lineitem(spark, sf001)
      .select(cols.map(c => col(c).cast("decimal(18,2)").as(c)): _*)
      .collect()
      .map(r => cols.map(c =>
        BigDecimal(r.getAs[java.math.BigDecimal](c))).toArray)
    val n = data.length.toDouble
    def s(i: Int) = data.map(_(i)).sum.toDouble
    def q(i: Int, j: Int) = data.map(r => r(i) * r(j)).sum.toDouble
    rows.foreach { r =>
      val i = cols.indexOf(r.getAs[String]("col_x"))
      val j = cols.indexOf(r.getAs[String]("col_y"))
      val num = n * q(i, j) - s(i) * s(j)
      assert(math.abs(r.getAs[Double]("cov_pop") - num / (n * n)) < 1e-6)
      assert(math.abs(r.getAs[Double]("corr") -
        num / math.sqrt((n * q(i, i) - s(i) * s(i)) *
                        (n * q(j, j) - s(j) * s(j)))) < 1e-6)
      assert(math.abs(r.getAs[Double]("corr")) <= 1.0 + 1e-9)
    }
  }

  test("winsorized/trimmed means equal a driver-side sorted brute force") {
    val r = AggOps.aggWinsorizedMean(spark, sf001).collect().head
    val vs = Tables.lineitem(spark, sf001)
      .select(col("l_extendedprice").cast("decimal(18,2)").as("v"),
        col("l_orderkey"), col("l_linenumber"))
      .collect()
      .map(x => (BigDecimal(x.getAs[java.math.BigDecimal]("v")),
        x.getAs[Long]("l_orderkey"), x.getAs[Int]("l_linenumber")))
      .sortBy(x => (x._1, x._2, x._3)).map(_._1)
    val n = vs.length
    val k05 = n * 5 / 100; val k95 = n * 95 / 100
    val lo = vs(k05); val hi = vs(k95 - 1)
    val win = vs.zipWithIndex.map { case (v, idx) =>
      if (idx < k05) lo else if (idx >= k95) hi else v }
    val trim = vs.slice(k05, k95)
    assert(r.getAs[Long]("n_rows") == n.toLong)
    assert(r.getAs[Double]("p05") == lo.toDouble)
    assert(r.getAs[Double]("p95") == hi.toDouble)
    assert(math.abs(r.getAs[Double]("mean_raw") -
      vs.sum.toDouble / n) < 1e-5)
    assert(math.abs(r.getAs[Double]("mean_winsorized") -
      win.sum.toDouble / n) < 1e-5)
    assert(math.abs(r.getAs[Double]("mean_trimmed") -
      trim.sum.toDouble / trim.length) < 1e-5)
    // winsorizing pulls the mean toward the trimmed center
    assert(lo.toDouble < hi.toDouble)
  }

  test("tail risk equals a driver-side sorted brute force; ES dominates VaR") {
    val r = AggOps.aggTailRisk(spark, sf001).collect().head
    val vs = Tables.orders(spark, sf001)
      .select(col("o_totalprice").cast("decimal(18,2)").as("v"),
              col("o_orderkey"))
      .collect()
      .map(x => (BigDecimal(x.getAs[java.math.BigDecimal]("v")),
                 x.getAs[Long]("o_orderkey")))
      .sortBy(identity).map(_._1)
    val n = vs.length
    def pick(p: Int) = vs(n * p / 100 - 1)
    def es(p: Int) = {
      val tail = vs.drop(n * p / 100)
      tail.sum.toDouble / tail.length
    }
    assert(r.getAs[Long]("n_orders") == n.toLong)
    assert(r.getAs[Double]("var_95") == pick(95).toDouble)
    assert(r.getAs[Double]("var_99") == pick(99).toDouble)
    assert(math.abs(r.getAs[Double]("es_95") - es(95)) < 1e-5)
    assert(math.abs(r.getAs[Double]("es_99") - es(99)) < 1e-5)
    // coherence sanity: the tail mean exceeds its quantile, and the
    // deeper tail is the more extreme one
    assert(r.getAs[Double]("es_95") > r.getAs[Double]("var_95"))
    assert(r.getAs[Double]("es_99") > r.getAs[Double]("var_99"))
    assert(r.getAs[Double]("es_99") >= r.getAs[Double]("es_95"))
  }

  test("Benford check: shares and expected each sum to 1; counts match a driver recompute") {
    val rows = graft.ops.EtlOps.etlBenfordCheck(spark, sf001).collect()
    assert(rows.length == 9)
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-4)
    assert(math.abs(rows.map(_.getAs[Double]("expected")).sum - 1.0) < 1e-4)
    val counts = Tables.lineitem(spark, sf001)
      .select(col("l_extendedprice").cast("decimal(18,2)").as("v")).collect()
      .map(r => BigDecimal(r.getAs[java.math.BigDecimal]("v")))
      .filter(_ > 0)
      .map(v => (v * 100).toBigInt.toString.charAt(0).toString)
      .groupBy(identity).map { case (k, v) => (k, v.length.toLong) }
    rows.foreach { r =>
      assert(r.getAs[Long]("n_obs") == counts(r.getAs[String]("digit")))
      assert(r.getAs[Double]("chi2") >= 0.0)
    }
  }

  test("filter funnel: stages partition every source; verdicts match a driver replay") {
    val rows = graft.ops.CorpusOps.textFilterFunnel(spark, sf001).collect()
    rows.foreach { r =>
      val parts = Seq("drop_short", "drop_lang", "drop_repeat",
        "drop_diversity", "kept").map(r.getAs[Long](_))
      assert(parts.sum == r.getAs[Long]("docs_in"), r.toString)
    }
    assert(rows.map(_.getAs[Long]("docs_in")).sum ==
      Tables.documents(spark, sf001).count())
    // driver replay of the verdict ladder
    val expected = Tables.documents(spark, sf001)
      .select(col("source"), col("lang"), col("text")).collect()
      .map { r =>
        val text = r.getAs[String]("text")
        val ws = text.split(" ", -1)
        val wc = ws.length; val byW = ws.groupBy(identity)
        val maxf = byW.values.map(_.length).max; val ty = byW.size
        val v =
          if (text.length < 100) "drop_short"
          else if (r.getAs[String]("lang") != "en") "drop_lang"
          else if (maxf * 5 > wc) "drop_repeat"
          else if (ty * 3 < wc) "drop_diversity"
          else "kept"
        (r.getAs[String]("source"), v)
      }.groupBy(identity).map { case (k, v) => (k, v.length.toLong) }
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      Seq("drop_short", "drop_lang", "drop_repeat", "drop_diversity",
        "kept").foreach { stage =>
        assert(r.getAs[Long](stage) ==
          expected.getOrElse((src, stage), 0L), s"$src/$stage")
      }
    }
  }
}
