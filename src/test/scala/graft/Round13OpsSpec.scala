package graft

import org.apache.spark.sql.functions._
import graft.ops.{AggOps, EtlOps, GraphOps}

/** Driver-side replays for the round-13 operators (#229–#235) beyond
  * the DuckDB hash sweep — each statistic/credit/score recomputed with
  * exact BigInt/BigDecimal arithmetic from the raw tables. */
class Round13OpsSpec extends SparkSpec {

  /** The 3-way md5 arm split shared by #229/#230 (mirrors AggOps.arm3). */
  private def armedValues(): Array[(Int, BigDecimal)] =
    Tables.events(spark, sf001)
      .select((ascii(substring(md5(col("user_id").cast("string")), 1, 1)) % 3)
        .as("g"), col("value").cast("decimal(18,2)").as("v"))
      .collect()
      .map(r => (r.getAs[Int]("g"), BigDecimal(r.getAs[java.math.BigDecimal]("v"))))

  test("ANOVA F equals a driver-side three-arm exact-moment replay") {
    val row = AggOps.aggAnovaF(spark, sf001).collect().head
    val arms = armedValues().groupBy(_._1)
    val n = (0 to 2).map(g => arms(g).length.toLong)
    val s = (0 to 2).map(g => arms(g).map(_._2).sum)
    val q = (0 to 2).map(g => arms(g).map(x => x._2 * x._2).sum)
    val bigN = n.sum.toDouble
    val sTot = s.map(_.toDouble).sum
    val sjsq = (0 to 2).map(g => s(g).toDouble * s(g).toDouble / n(g)).sum
    val ssb = sjsq - sTot * sTot / bigN
    val ssw = q.map(_.toDouble).sum - sjsq
    val f = (ssb / 2.0) / (ssw / (bigN - 3.0))
    assert(Seq("n_a", "n_b", "n_c").map(row.getAs[Long]) == n)
    assert(math.abs(row.getAs[Double]("ss_between") - ssb) < 1e-4)
    assert(math.abs(row.getAs[Double]("ss_within") - ssw) < 1e-3)
    assert(math.abs(row.getAs[Double]("f_stat") - f) < 1e-4)
    assert(row.getAs[Boolean]("reject_h0") == (f > 2.995732))
  }

  test("Kruskal-Wallis H equals a driver-side tie-averaged rank replay") {
    val row = AggOps.aggKruskalWallis(spark, sf001).collect().head
    var cum = 0L
    val r2 = Array.fill(3)(BigInt(0))
    val cnt = Array.fill(3)(0L)
    var tie3 = BigInt(0)
    armedValues().groupBy(_._2).toSeq.sortBy(_._1).foreach { case (_, rs) =>
      val t = rs.length.toLong
      (0 to 2).foreach { g =>
        val ng = rs.count(_._1 == g).toLong
        r2(g) += BigInt(ng) * (2 * cum + t + 1)
        cnt(g) += ng
      }
      tie3 += BigInt(t) * t * t - t
      cum += t
    }
    val bigN = cnt.sum.toDouble
    val rsq = (0 to 2).map(g => r2(g).toDouble * r2(g).toDouble / cnt(g)).sum
    val h = 12.0 / (bigN * (bigN + 1)) * (rsq / 4.0) - 3.0 * (bigN + 1)
    val hc = h / (1.0 - tie3.toDouble / (bigN * bigN * bigN - bigN))
    assert(Seq("n_a", "n_b", "n_c").map(row.getAs[Long]) == cnt.toSeq)
    assert(math.abs(row.getAs[Double]("h_stat") - h) < 1e-4)
    assert(math.abs(row.getAs[Double]("h_tie_corrected") - hc) < 1e-4)
    assert(row.getAs[Boolean]("reject_h0") == (hc > 5.991465))
  }

  test("Spearman rho equals a driver-side average-rank Pearson; rank-sum self-checks hold") {
    val row = AggOps.aggSpearmanCorr(spark, sf001).collect().head
    val rows = Tables.lineitem(spark, sf001)
      .select(col("l_quantity").cast("decimal(18,2)").cast("double"),
              col("l_extendedprice").cast("decimal(18,2)").cast("double"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    def rank2(vs: Seq[Double]): Map[Double, Long] = {
      var cum = 0L
      vs.groupBy(identity).toSeq.sortBy(_._1).map { case (v, g) =>
        val t = g.length.toLong
        val r = 2 * cum + t + 1
        cum += t
        v -> r
      }.toMap
    }
    val rx = rank2(rows.map(_._1).toSeq)
    val ry = rank2(rows.map(_._2).toSeq)
    val n = rows.length.toLong
    val pr = rows.map { case (x, y) => (BigInt(rx(x)), BigInt(ry(y))) }
    val (sx, sy) = (pr.map(_._1).sum, pr.map(_._2).sum)
    val sxx = pr.map(p => p._1 * p._1).sum
    val syy = pr.map(p => p._2 * p._2).sum
    val sxy = pr.map(p => p._1 * p._2).sum
    val num = n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble
    val den = math.sqrt(
      (n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble) *
      (n.toDouble * syy.toDouble - sy.toDouble * sy.toDouble))
    // the half-unit identity makes Σ2r = n(n+1) exactly for both columns
    assert(sx == BigInt(n) * (n + 1) && sy == BigInt(n) * (n + 1))
    assert(row.getAs[Boolean]("rank_sum_ok_x") && row.getAs[Boolean]("rank_sum_ok_y"))
    assert(row.getAs[Long]("n_rows") == n)
    assert(math.abs(row.getAs[Double]("spearman_rho") - num / den) < 1e-5)
  }

  test("Jaccard link prediction equals a driver-side replay from the edge list") {
    val out = GraphOps.graphJaccardLinks(spark, sf001).collect()
    val edges = GraphOps.copurchaseEdges(spark, sf001)
      .select(col("u"), col("v")).collect()
      .map(r => (r.getAs[Number]("u").longValue, r.getAs[Number]("v").longValue))
    val adj = scala.collection.mutable.Map[Long, Set[Long]]().withDefaultValue(Set.empty)
    edges.foreach { case (u, v) => adj(u) += v; adj(v) += u }
    val edgeSet = edges.toSet
    val expected = (for {
      u <- adj.keys; v <- adj.keys
      if u < v && !edgeSet.contains((u, v))
      common = (adj(u) & adj(v)).size if common > 0
    } yield {
      val uni = adj(u).size.toLong + adj(v).size - common
      (u, v, common.toLong, adj(u).size.toLong, adj(v).size.toLong,
        common.toLong * 100000000L / uni)
    }).toSeq.sortBy { case (u, v, _, _, _, j8) => (-j8, u, v) }.take(20)
    assert(out.length == expected.length)
    out.zip(expected).foreach { case (r, (u, v, common, du, dv, j8)) =>
      assert(r.getAs[Long]("u") == u && r.getAs[Long]("v") == v, s"$r vs ($u,$v)")
      assert(r.getAs[Long]("common") == common)
      assert(r.getAs[Long]("deg_u") == du && r.getAs[Long]("deg_v") == dv)
      assert(r.getAs[Double]("jaccard") == j8.toDouble / 1e8)
    }
  }

  test("exact histogram partitions the orders; bin edges and the ogive are consistent") {
    val rows = AggOps.aggHistogramNumeric(spark, sf001).collect()
    val totals = Tables.orders(spark, sf001)
      .select(col("o_totalprice").cast("decimal(18,2)")).collect()
      .map(r => BigDecimal(r.getAs[java.math.BigDecimal](0)))
    val bins = totals.groupBy(t => ((t * 100).toBigInt / 2500000).toLong)
      .view.mapValues(_.length.toLong).toMap
    assert(rows.map(_.getAs[Long]("n_orders")).sum == totals.length.toLong)
    assert(rows.map(_.getAs[Long]("bin")).toSet == bins.keySet)
    rows.foreach { r =>
      val b = r.getAs[Long]("bin")
      assert(r.getAs[Long]("n_orders") == bins(b))
      assert(r.getAs[Double]("lo") == b * 25000.0)
      assert(r.getAs[Double]("hi") == (b + 1) * 25000.0)
    }
    val cums = rows.map(_.getAs[Double]("cum_share"))
    assert(cums.last == 1.0, "the ogive must end at exactly 1.0 (round(n/n, 6))")
    assert(cums.sameElements(cums.sorted), "the ogive must be nondecreasing")
  }

  test("cross-correlation matches a driver-side centered-series replay at every lag") {
    val rows = EtlOps.tsCrossCorrelation(spark, sf001).collect()
      .sortBy(_.getAs[Int]("lag"))
    val daily = Tables.events(spark, sf001)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("dsum"),
           count(lit(1)).as("cnt"))
      .orderBy(col("day")).collect()
      .map(r => (BigDecimal(r.getAs[java.math.BigDecimal]("dsum")),
                 r.getAs[Long]("cnt")))
    val nDays = daily.length
    val meanX = daily.map(_._1.toDouble).sum / nDays
    val meanY = daily.map(_._2.toDouble).sum / nDays
    def grid6(x: Double): BigDecimal =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val cx = daily.map(d => grid6(d._1.toDouble - meanX))
    val cy = daily.map(d => grid6(d._2.toDouble - meanY))
    val denx = cx.map(c => c * c).sum.toDouble
    val deny = cy.map(c => c * c).sum.toDouble
    rows.foreach { r =>
      val k = r.getAs[Int]("lag")
      assert(r.getAs[Long]("n_days") == nDays.toLong)
      val pairs = (0 until nDays).flatMap { i =>
        val j = i + k
        if (j >= 0 && j < nDays) Some(cx(i) * cy(j)) else None
      }
      assert(r.getAs[Long]("n_pairs") == pairs.length.toLong, s"lag $k")
      val ccf = pairs.sum.toDouble / math.sqrt(denx * deny)
      assert(math.abs(r.getAs[Double]("ccf") - ccf) < 1e-3, s"lag $k")
      assert(math.abs(r.getAs[Double]("ccf")) <= 1.0, s"lag $k out of [-1,1]")
    }
    assert(rows.map(_.getAs[Int]("lag")).toSeq == (-3 to 3).toSeq)
  }

  test("position attribution equals a driver-side U-shaped credit replay; credits sum to ~1 per conversion") {
    val rows = EtlOps.eventsAttributionPosition(spark, sf001).collect()
    val ev = Tables.events(spark, sf001)
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")),
              col("value").cast("decimal(18,2)")).collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue,
                 r.getLong(2), BigDecimal(r.getAs[java.math.BigDecimal](3))))
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")),
              get_json_object(col("props"), "$.k").cast("int")).collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue,
                 r.getLong(2),
                 if (r.isNullAt(3)) None else Some(r.getInt(3))))
    val byUser = clicks.groupBy(_._2)
    // per-campaign accumulators: (conversions, touches, Σcredit8, ΣcredRev8-cents)
    val acc = scala.collection.mutable.Map[Option[Int],
      (Set[Long], Long, BigInt, BigInt)]()
    var nConvWithTouches = 0L
    purchases.foreach { case (pid, uid, pUs, pv) =>
      val touches = byUser.getOrElse(uid, Array.empty)
        .filter(c => c._3 < pUs && c._3 >= pUs - 7L * 86400L * 1000000L)
      if (touches.nonEmpty) {
        nConvWithTouches += 1
        val k = touches.length.toLong
        val firstId = touches.minBy(c => (c._3, c._1))._1
        val lastId = touches.maxBy(c => (c._3, c._1))._1
        touches.foreach { c =>
          val credit8: Long =
            if (k == 1) 100000000L
            else if (k == 2) 50000000L
            else if (c._1 == firstId || c._1 == lastId) 40000000L
            else 20000000L / (k - 2)
          // cred_rev8 in the engine is DECIMAL(38,2): pv(2dp) × credit8(int)
          val credRev8 = (pv * BigDecimal(credit8))
            .setScale(2, BigDecimal.RoundingMode.UNNECESSARY)
          val (convs, t, c8, cr8) = acc.getOrElse(c._4, (Set.empty[Long], 0L, BigInt(0), BigInt(0)))
          acc(c._4) = (convs + pid, t + 1, c8 + credit8,
            cr8 + (credRev8 * 100).toBigInt)
        }
      }
    }
    assert(rows.length == acc.size)
    rows.foreach { r =>
      val camp = if (r.isNullAt(r.fieldIndex("campaign"))) None
                 else Some(r.getAs[Int]("campaign"))
      val (convs, t, c8, cr8) = acc(camp)
      assert(r.getAs[Long]("n_conversions") == convs.size.toLong, s"campaign $camp")
      assert(r.getAs[Long]("n_touches") == t, s"campaign $camp")
      assert(math.abs(r.getAs[Double]("total_credit") - c8.toDouble / 1e8) < 1e-9)
      assert(math.abs(r.getAs[Double]("credited_revenue")
        - cr8.toDouble / 100 / 1e8) < 1e-6)
    }
    // Σcredit over all campaigns ≈ conversions-with-touches (k·10⁻⁸ floor loss)
    val totalCredit = rows.map(_.getAs[Double]("total_credit")).sum
    assert(math.abs(totalCredit - nConvWithTouches.toDouble) < 1e-2,
      s"credit conservation: $totalCredit vs $nConvWithTouches")
  }

  /** The A&S 7.1.26 two-sided normal tail, exactly as both engines
    * compute it (EtlOps.normTwoSided). */
  private def pTwoSided(z: Double): Double = {
    val x = math.abs(z) / 1.4142135623730951
    val t = 1.0 / (1.0 + 0.3275911 * x)
    ((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
      - 0.284496736) * t + 0.254829592) * t * math.exp(-(x * x))
  }

  /** (isA, event_type, 2dp value) rows — the shared input of the
    * #236/#237 replays (arm from the same md5 expression the ops use). */
  private def armedEvents(): Array[(Boolean, String, BigDecimal)] =
    Tables.events(spark, sf001)
      .select(
        (ascii(substring(md5(col("user_id").cast("string")), 1, 1)) % 2 === 0)
          .as("isA"),
        col("event_type"), col("value").cast("decimal(18,2)").as("v"))
      .collect()
      .map(r => (r.getBoolean(0), r.getString(1),
        BigDecimal(r.getAs[java.math.BigDecimal]("v"))))

  test("BH-FDR equals a driver-side per-type Welch + step-up replay") {
    val out = EtlOps.eventsFdrBh(spark, sf001).collect()
    val types = armedEvents().groupBy(_._2)
      .filter { case (_, rs) => rs.exists(_._1) && rs.exists(!_._1) }
    val scored = types.toSeq.map { case (ty, rs) =>
      val a = rs.filter(_._1).map(_._3)
      val b = rs.filterNot(_._1).map(_._3)
      val (na, nb) = (a.length.toDouble, b.length.toDouble)
      val (sa, sb) = (a.sum.toDouble, b.sum.toDouble)
      val (qa, qb) = (a.map(x => x * x).sum.toDouble, b.map(x => x * x).sum.toDouble)
      val va = (qa - sa * sa / na) / (na - 1)
      val vb = (qb - sb * sb / nb) / (nb - 1)
      val z = (sa / na - sb / nb) / math.sqrt(va / na + vb / nb)
      (ty, a.length.toLong, b.length.toLong, z,
        math.floor(pTwoSided(z) * 1e10).toLong)
    }
    val m = scored.length.toLong
    val ranked = scored.sortBy { case (ty, _, _, _, p10) => (p10, ty) }.zipWithIndex
      .map { case (row, i) => (row, i + 1L) }
    val kstar = ranked.collect {
      case ((_, _, _, _, p10), i) if p10 * m <= i * 500000000L => i
    }.maxOption.getOrElse(0L)
    assert(out.length.toLong == m)
    out.zip(ranked).foreach { case (r, ((ty, na, nb, z, p10), i)) =>
      assert(r.getAs[String]("event_type") == ty, s"rank $i")
      assert(r.getAs[Long]("n_a") == na && r.getAs[Long]("n_b") == nb, ty)
      assert(math.abs(r.getAs[Double]("z_welch")
        - math.floor(z * 1000000 + 0.5) / 1000000.0) < 1e-9, ty)
      assert(math.abs(r.getAs[Double]("p_value") - p10.toDouble / 1e10) < 1e-12, ty)
      assert(r.getAs[Int]("p_rank").toLong == i, ty)
      assert(r.getAs[Long]("m_tests") == m, ty)
      assert(r.getAs[Boolean]("rejected") == (i <= kstar), ty)
    }
  }

  test("Bayesian A/B equals a driver-side conjugate-posterior replay") {
    val r = EtlOps.eventsBayesAb(spark, sf001).collect().head
    val users = Tables.events(spark, sf001)
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("conv"))
      .select(
        (ascii(substring(md5(col("user_id").cast("string")), 1, 1)) % 2 === 0)
          .as("isA"), col("conv"))
      .collect().map(x => (x.getBoolean(0), x.getLong(1)))
    val (na, ca) = (users.count(_._1).toLong, users.filter(_._1).map(_._2).sum)
    val (nb, cb) = (users.count(!_._1).toLong, users.filterNot(_._1).map(_._2).sum)
    assert(r.getAs[Long]("n_a") == na && r.getAs[Long]("c_a") == ca)
    assert(r.getAs[Long]("n_b") == nb && r.getAs[Long]("c_b") == cb)
    def mean(c: Long, n: Long) = (c + 1.0) / (n + 2.0)
    def varr(c: Long, n: Long) = {
      val a = c + 1.0; val b = n - c + 1.0
      a * b / ((a + b) * (a + b) * (a + b + 1.0))
    }
    val dd = (mean(cb, nb) - mean(ca, na)) / math.sqrt(varr(ca, na) + varr(cb, nb))
    val half = pTwoSided(dd) / 2.0
    val phi = if (dd >= 0) 1.0 - half else half
    def fp6(x: Double) = math.floor(x * 1000000 + 0.5) / 1000000.0
    assert(r.getAs[Double]("post_mean_a") == fp6(mean(ca, na)))
    assert(r.getAs[Double]("post_mean_b") == fp6(mean(cb, nb)))
    assert(r.getAs[Double]("lift") == fp6(mean(cb, nb) - mean(ca, na)))
    assert(math.abs(r.getAs[Double]("prob_b_gt_a") - fp6(phi)) < 1e-9)
    assert(r.getAs[Double]("prob_b_gt_a") >= 0 && r.getAs[Double]("prob_b_gt_a") <= 1)
  }

  test("rolling correlation equals a driver-side exact-window replay") {
    val out = EtlOps.tsRollingCorr(spark, sf001).collect()
    val daily = Tables.events(spark, sf001)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("x"),
           count(lit(1)).as("y"))
      .orderBy(col("day")).collect()
      .map(r => (BigDecimal(r.getAs[java.math.BigDecimal]("x")),
                 BigInt(r.getAs[Long]("y"))))
    assert(out.length == daily.length - 13)
    out.zipWithIndex.foreach { case (r, k) =>
      val win = daily.slice(k, k + 14)
      val n = 14.0
      val sx = win.map(_._1).sum.toDouble
      val sy = win.map(_._2).sum.toDouble
      val sxx = win.map(w => w._1 * w._1).sum.toDouble
      val syy = win.map(w => w._2 * w._2).sum.toDouble
      val sxy = win.map(w => w._1 * BigDecimal(w._2)).sum.toDouble
      val corr = (n * sxy - sx * sy) /
        math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
      assert(r.getAs[Long]("n_win") == 14L, s"row $k")
      assert(math.abs(r.getAs[Double]("corr14")
        - math.floor(corr * 10000 + 0.5) / 10000.0) < 1e-9, s"row $k")
      assert(math.abs(r.getAs[Double]("corr14")) <= 1.0, s"row $k")
    }
  }

  test("uplift deciles equal a driver-side exact-ntile replay") {
    val out = EtlOps.eventsUpliftDeciles(spark, sf001).collect()
    val rows = Tables.events(spark, sf001)
      .select(col("user_id"), to_date(col("ts")).as("day"), col("event_type"))
      .collect()
      .map(r => (r.getAs[Number](0).longValue,
        r.getAs[java.sql.Date](1).toLocalDate.toEpochDay, r.getString(2)))
    val d0 = rows.map(_._2).min
    val d1 = rows.map(_._2).max
    def pre(day: Long) = (day - d0) * 2 < (d1 - d0) + 1
    val byUser = rows.groupBy(_._1).map { case (u, rs) =>
      (u, rs.count(r => pre(r._2)).toLong,
        if (rs.exists(r => !pre(r._2) && r._3 == "purchase")) 1L else 0L)
    }.toSeq
    val arms = Tables.events(spark, sf001).select(col("user_id")).distinct()
      .select(col("user_id"),
        (ascii(substring(md5(col("user_id").cast("string")), 1, 1)) % 2 === 0)
          .as("isA"))
      .collect().map(r => r.getAs[Number](0).longValue -> r.getBoolean(1)).toMap
    // exact NTILE(10) under the (score, user_id) total order
    val sorted = byUser.sortBy { case (u, s, _) => (s, u) }
    val n = sorted.length
    val base = n / 10
    val extra = n % 10
    val cut = extra * (base + 1)
    val perDecile = sorted.zipWithIndex.groupBy { case (_, i) =>
      if (i < cut) i / (base + 1) + 1 else (i - cut) / base + extra + 1
    }
    assert(out.length == perDecile.size)
    def fp6(x: Double) = math.floor(x * 1000000 + 0.5) / 1000000.0
    out.foreach { r =>
      val d = r.getAs[Long]("decile").toInt
      val us = perDecile(d).map(_._1)
      val na = us.count(u => arms(u._1)).toLong
      val nb = us.length - na
      val ca = us.filter(u => arms(u._1)).map(_._3).sum
      val cb = us.filterNot(u => arms(u._1)).map(_._3).sum
      assert(r.getAs[Long]("n_a") == na && r.getAs[Long]("n_b") == nb, s"decile $d")
      assert(r.getAs[Long]("conv_a") == ca && r.getAs[Long]("conv_b") == cb, s"decile $d")
      if (na == 0) assert(r.isNullAt(r.fieldIndex("rate_a")), s"decile $d")
      else assert(r.getAs[Double]("rate_a") == fp6(ca.toDouble / na), s"decile $d")
      if (nb == 0) assert(r.isNullAt(r.fieldIndex("rate_b")), s"decile $d")
      else assert(r.getAs[Double]("rate_b") == fp6(cb.toDouble / nb), s"decile $d")
      if (na == 0 || nb == 0)
        assert(r.isNullAt(r.fieldIndex("uplift")), s"decile $d")
      else assert(r.getAs[Double]("uplift")
        == fp6(cb.toDouble / nb - ca.toDouble / na), s"decile $d")
    }
  }

  test("IVF-PQ: candidates come from probed buckets; pruning only loses vs full PQ") {
    val out = graft.ops.VecOps.simAnnIvfPq(spark, sf001).collect()
    assert(out.nonEmpty)
    // structural: per-query ranks 1..k with nondecreasing ADC distance
    out.groupBy(_.getAs[Long]("q_id")).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rnk"))
      assert(sorted.map(_.getAs[Int]("rnk")).toSeq == (1 to rs.length), s"query $q")
      val dists = sorted.map(_.getAs[Double]("adc_dist"))
      assert(dists.sameElements(dists.sorted), s"query $q not distance-ordered")
    }
    // containment: every returned index vector sits in a bucket the
    // query probed (the IVF pruning contract)
    val (assigned, probes) = graft.ops.LlmOps.ivfBuckets(spark, sf001)
    val iBucket = assigned.select(col("vec_id"), col("bucket")).collect()
      .map(r => r.getAs[Long](0) -> r.getAs[Long](1)).toMap
    val qProbes = probes.select(col("vec_id"), col("bucket")).collect()
      .groupBy(_.getAs[Long](0)).view
      .mapValues(_.map(_.getAs[Long](1)).toSet).toMap
    out.foreach { r =>
      val (q, i) = (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))
      assert(qProbes(q).contains(iBucket(i)),
        s"result $i of query $q is outside the probed buckets")
    }
    // pruning only LOSES candidates vs the exhaustive PQ scan: at each
    // shared rank the composed index's distance is >= full PQ's
    val pq = graft.ops.VecOps.simAnnPq(spark, sf001).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Int]("rnk")) -> r.getAs[Double]("adc_dist"))
      .toMap
    out.foreach { r =>
      val k = (r.getAs[Long]("q_id"), r.getAs[Int]("rnk"))
      pq.get(k).foreach { full =>
        assert(r.getAs[Double]("adc_dist") >= full - 1e-9,
          s"$k: composed ${r.getAs[Double]("adc_dist")} beats exhaustive $full")
      }
    }
  }

  test("PSI drift equals a driver-side exact replay") {
    val out = EtlOps.etlPsiDrift(spark, sf001).collect()
    val orders = Tables.orders(spark, sf001)
      .select(to_date(col("o_orderdate")).as("day"),
        col("o_totalprice").cast("decimal(18,2)"))
      .collect()
      .map(r => (r.getAs[java.sql.Date](0).toLocalDate.toEpochDay,
        ((BigDecimal(r.getAs[java.math.BigDecimal](1)) * 100).toBigInt / 2500000).toLong))
    val d0 = orders.map(_._1).min
    val d1 = orders.map(_._1).max
    def pre(day: Long) = (day - d0) * 2 < (d1 - d0) + 1
    val byBin = orders.groupBy(_._2).view.mapValues { rs =>
      (rs.count(r => pre(r._1)).toLong, rs.count(r => !pre(r._1)).toLong)
    }.toMap
    val (tPre, tPost) = (byBin.values.map(_._1).sum, byBin.values.map(_._2).sum)
    val nBins = byBin.size
    def share(n: Long, t: Long) = (n + 1.0) / (t.toDouble + nBins)
    def grid8(x: Double) =
      BigDecimal(x).setScale(8, BigDecimal.RoundingMode.HALF_UP)
    val terms = byBin.map { case (b, (np, nq)) =>
      b -> grid8((share(np, tPre) - share(nq, tPost)) *
        math.log(share(np, tPre) / share(nq, tPost)))
    }
    val psi = terms.values.sum.toDouble
    def fp6(x: Double) = math.floor(x * 1000000 + 0.5) / 1000000.0
    assert(out.length == nBins)
    out.foreach { r =>
      val b = r.getAs[Long]("bin")
      val (np, nq) = byBin(b)
      assert(r.getAs[Long]("n_pre") == np && r.getAs[Long]("n_post") == nq, s"bin $b")
      assert(r.getAs[Double]("share_pre") == fp6(share(np, tPre)), s"bin $b")
      assert(r.getAs[Double]("share_post") == fp6(share(nq, tPost)), s"bin $b")
      assert(math.abs(r.getAs[Double]("psi_term") - terms(b).toDouble) < 1e-9, s"bin $b")
      assert(math.abs(r.getAs[Double]("psi") - psi) < 1e-9)
      assert(r.getAs[Boolean]("drifted") == (r.getAs[Double]("psi") > 0.2))
    }
  }

  test("channel histogram: per-channel pixel totals equal the decoded raster sizes") {
    val rows = graft.ops.LlmOps.multimodalChannelHistogram(spark, sf001).collect()
    val totalPx = Tables.documents(spark, sf001).select(col("doc_id")).collect()
      .map { r =>
        val (w, h) = graft.multimodal.BinaryDecode.syntheticDims(r.getAs[Long](0))
        w.toLong * h
      }.sum
    (0 to 2).foreach { c =>
      val chan = rows.filter(_.getAs[Int]("channel") == c)
      assert(chan.map(_.getAs[Long]("n_px")).sum == totalPx, s"channel $c")
      val shares = chan.map(_.getAs[Double]("share")).sum
      assert(math.abs(shares - 1.0) < 1e-5, s"channel $c shares sum $shares")
    }
    // and one doc's buckets replayed from the pixel formula
    val id = Tables.documents(spark, sf001).select(min(col("doc_id")))
      .head.getLong(0)
    val (w, h) = graft.multimodal.BinaryDecode.syntheticDims(id)
    val expected = Array.ofDim[Long](3, 4)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = graft.multimodal.BinaryDecode.syntheticPixel(id, x, y)
      expected(0)(r >> 6) += 1; expected(1)(g >> 6) += 1; expected(2)(b >> 6) += 1
    }
    val got = graft.multimodal.BinaryDecode.channelHistogramOne(
      id, graft.multimodal.BinaryDecode.syntheticPng(id))
    got.foreach { case (c, b, n) => assert(expected(c)(b) == n, s"($c,$b)") }
    assert(got.map(_._3).sum == 3L * w * h)
  }

  test("log2 histogram equals a driver-side binary-length replay") {
    val rows = AggOps.aggLog2Histogram(spark, sf001).collect()
    val cents = Tables.orders(spark, sf001)
      .select(col("o_totalprice").cast("decimal(18,2)")).collect()
      .map(r => (BigDecimal(r.getAs[java.math.BigDecimal](0)) * 100).toLongExact)
    val bins = cents.groupBy(c => java.lang.Long.toBinaryString(c).length.toLong)
      .view.mapValues(_.length.toLong).toMap
    assert(rows.map(_.getAs[Long]("n_orders")).sum == cents.length.toLong)
    assert(rows.map(_.getAs[Long]("bin2")).toSet == bins.keySet)
    rows.foreach { r =>
      val b = r.getAs[Long]("bin2")
      assert(r.getAs[Long]("n_orders") == bins(b), s"bin $b")
      assert(r.getAs[Double]("lo_cents") == math.pow(2.0, (b - 1).toDouble), s"bin $b")
      assert(r.getAs[Double]("hi_cents") == math.pow(2.0, b.toDouble), s"bin $b")
      // every member really falls inside [lo, hi)
      assert(cents.filter(c =>
        java.lang.Long.toBinaryString(c).length.toLong == b)
        .forall(c => c >= math.pow(2, (b - 1).toDouble) && c < math.pow(2, b.toDouble)))
    }
    val cums = rows.map(_.getAs[Double]("cum_share"))
    assert(cums.last == 1.0 && cums.sameElements(cums.sorted))
  }

  test("CEM ATT equals a driver-side stratified replay") {
    val rows = EtlOps.eventsCemAtt(spark, sf001).collect()
    val ev = Tables.events(spark, sf001)
      .select(col("user_id"), to_date(col("ts")).as("day"), col("event_type"),
        col("value").cast("decimal(18,2)"),
        (ascii(substring(md5(col("user_id").cast("string")), 1, 1)) % 2 =!= 0)
          .as("isB"))
      .collect()
      .map(r => (r.getAs[Number](0).longValue,
        r.getAs[java.sql.Date](1).toLocalDate.toEpochDay, r.getString(2),
        BigDecimal(r.getAs[java.math.BigDecimal](3)), r.getBoolean(4)))
    val d0 = ev.map(_._2).min
    val d1 = ev.map(_._2).max
    def pre(day: Long) = (day - d0) * 2 < (d1 - d0) + 1
    val users = ev.groupBy(_._1).map { case (u, rs) =>
      val preN = rs.count(r => pre(r._2)).toLong
      val y = rs.filter(r => !pre(r._2) && r._3 == "purchase").map(_._4).sum
      (math.min(preN / 5, 10L), rs.head._5, y)
    }.toSeq
    val strata = users.groupBy(_._1).view.mapValues { us =>
      val (t, c) = us.partition(_._2)
      (t.length.toLong, c.length.toLong, t.map(_._3).sum, c.map(_._3).sum)
    }.filter { case (_, (nt, nc, _, _)) => nt > 0 && nc > 0 }.toMap
    def grid8(x: Double) = BigDecimal(x).setScale(8, BigDecimal.RoundingMode.HALF_UP)
    val terms = strata.map { case (s, (nt, nc, st, sc)) =>
      s -> grid8(nt * (st.toDouble / nt - sc.toDouble / nc))
    }
    val nT = strata.values.map(_._1).sum
    val att = terms.values.sum.toDouble / nT
    def fp6(x: Double) = math.floor(x * 1000000 + 0.5) / 1000000.0
    assert(rows.length == strata.size)
    rows.foreach { r =>
      val s = r.getAs[Long]("stratum")
      val (nt, nc, st, sc) = strata(s)
      assert(r.getAs[Long]("n_t") == nt && r.getAs[Long]("n_c") == nc, s"stratum $s")
      assert(r.getAs[Double]("mean_t") == fp6(st.toDouble / nt), s"stratum $s")
      assert(r.getAs[Double]("mean_c") == fp6(sc.toDouble / nc), s"stratum $s")
      assert(r.getAs[Long]("n_treated_matched") == nT)
      assert(math.abs(r.getAs[Double]("att") - fp6(att)) < 1e-9)
    }
  }

  test("Pareto shares equal a driver-side ranked replay and nest monotonically") {
    val rows = AggOps.aggParetoShare(spark, sf001).collect()
      .sortBy(_.getAs[Int]("pct"))
    val rev = Tables.orders(spark, sf001)
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
      .collect()
      .map(r => BigDecimal(r.getAs[java.math.BigDecimal]("rev")))
      .sorted.reverse
    val n = rev.length.toLong
    val tot = rev.sum
    assert(rows.map(_.getAs[Int]("pct")).toSeq == Seq(1, 5, 10, 20))
    rows.foreach { r =>
      val p = r.getAs[Int]("pct")
      val k = (n * p + 99) / 100
      val topSum = rev.take(k.toInt).sum
      assert(r.getAs[Long]("k_customers") == k, s"pct $p")
      assert(r.getAs[Long]("n_customers") == n)
      assert(math.abs(r.getAs[Double]("top_rev") - topSum.toDouble) < 1e-6, s"pct $p")
      assert(r.getAs[Double]("share") ==
        math.floor(topSum.toDouble / tot.toDouble * 1000000 + 0.5) / 1000000.0
        || math.abs(r.getAs[Double]("share") - topSum.toDouble / tot.toDouble) < 1e-5,
        s"pct $p")
    }
    val shares = rows.map(_.getAs[Double]("share"))
    assert(shares.sameElements(shares.sorted), "shares must nest monotonically")
    assert(shares.last <= 1.0 && shares.head > 0.0)
  }

  test("Cramér's V rides #215's exact chi2 and matches its formula") {
    val chi = AggOps.aggChi2Independence(spark, sf001).collect().head
    val v = AggOps.aggCramersV(spark, sf001).collect().head
    // shared contingencyCells/chi2Term: the two statistics CANNOT drift
    assert(v.getAs[Double]("chi2") == chi.getAs[Double]("chi2"))
    assert(v.getAs[Long]("n_orders") == chi.getAs[Long]("n_orders"))
    val expect = math.floor(math.sqrt(v.getAs[Double]("chi2") /
      (v.getAs[Long]("n_orders").toDouble *
        (math.min(v.getAs[Long]("n_rows"), v.getAs[Long]("n_cols")) - 1)
          .toDouble)) * 1000000 + 0.5) / 1000000.0
    assert(v.getAs[Double]("cramers_v") == expect)
    assert(v.getAs[Double]("cramers_v") >= 0 && v.getAs[Double]("cramers_v") <= 1)
  }
}
