package graft

import org.apache.spark.sql.functions._
import graft.ops._

/** Round-15 additions (#262–#263): invariants the DuckDB hash-compare
  * cannot articulate — the VARIANT op's typed-path access agrees with
  * the string-JSON machinery it supersedes and its envelope schema is
  * uniform; the snapshot compaction round-trip preserves content while
  * actually shrinking the layout (file counts live in
  * SnapshotTableSpec, content identity here). */
class Round15OpsSpec extends SparkSpec {

  test("variant extract (#262): partitions the corpus, typed paths agree with get_json_object") {
    val out = ScalarOps.variantExtractAgg(spark, sf001).collect()
    val nEvents = Tables.events(spark, sf001).count()
    assert(out.map(_.getAs[Long]("n")).sum == nEvents,
      "the (k_bucket, etype) cells partition the corpus")
    assert(out.forall { r =>
      val b = r.getAs[Int]("k_bucket"); b >= 0 && b <= 9 })
    val types = Tables.events(spark, sf001)
      .select(col("event_type")).distinct().collect().map(_.getString(0)).toSet
    assert(out.map(_.getAs[String]("etype")).toSet == types,
      "every event type appears")
    // exact-value closure: Σ total_value over cells = the exact
    // decimal corpus total (cents ride longs end-to-end)
    val total = Tables.events(spark, sf001)
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double"))
      .collect()(0).getDouble(0)
    val got = BigDecimal(out.map(r =>
      BigDecimal(r.getAs[Double]("total_value"))).sum.toDouble)
    assert((got - BigDecimal(total)).abs <= BigDecimal("0.01"),
      s"value closure: $got vs $total")
    // the variant path access itself must agree with the string-JSON
    // machinery it supersedes, row by row
    val disagree = Tables.events(spark, sf001)
      .select(
        variant_get(parse_json(col("props")), "$.k", "int").as("vk"),
        get_json_object(col("props"), "$.k").cast("int").as("jk"))
      .where(!(col("vk") <=> col("jk"))).count()
    assert(disagree == 0, "variant_get and get_json_object must agree")
    // envelope schema is uniform across the corpus — the shredding
    // precondition (one physical layout for every row)
    val schemas = Tables.events(spark, sf001)
      .select(schema_of_variant(parse_json(
        concat(lit("{\"meta\":"), col("props"), lit(",\"etype\":\""),
          col("event_type"), lit("\",\"cents\":"),
          (col("value").cast("decimal(18,2)") * 100).cast("long")
            .cast("string"), lit("}")))).as("s"))
      .distinct().collect().map(_.getString(0))
    assert(schemas.length == 1, s"non-uniform variant schema: ${schemas.toSeq}")
    assert(schemas.head.contains("cents") && schemas.head.contains("meta"),
      s"unexpected schema: ${schemas.head}")
  }

  test("yoy growth (#264): matches brute force exactly; first year all-null partners") {
    val got = EtlOps.tsYoyGrowth(spark, sf001).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2),
       Option(r.get(3)).map(_.asInstanceOf[Double]),
       Option(r.get(4)).map(_.asInstanceOf[Double]))).toSeq
    val monthly = Tables.lineitem(spark, sf001)
      .select(col("l_shipdate").cast("string"), col("l_extendedprice")).collect()
      .groupBy { r =>
        // "yyyy-MM-dd ..." prefix — zone-free, engine-free parsing
        val s = r.getString(0)
        (s.substring(0, 4).toLong, s.substring(5, 7).toLong) }
      .map { case (k, rs) => k -> rs.map(r =>
        (BigDecimal(r.getDouble(1))
          .setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact).sum }
    val exp = monthly.toSeq.sortBy(identity).map { case ((y, m), c) =>
      val prev = monthly.get((y - 1, m))
      (y, m, c.toDouble / 100, prev.map(_.toDouble / 100),
       prev.map(p => math.floor((c - p).toDouble / p * 1000000 + 0.5) / 1000000.0))
    }
    assert(got == exp, s"yoy mismatch:\n got=${got.take(5)}\n exp=${exp.take(5)}")
    val firstYear = got.map(_._1).min
    assert(got.filter(_._1 == firstYear).forall(_._4.isEmpty),
      "first shipping year has no prior-year partner")
    assert(got.exists(_._5.isDefined), "later years carry growth")
  }

  test("mutual information (#265): matches brute force; grand total within KL bounds") {
    val got = AggOps.aggMutualInformation(spark, sf001).collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val ev = Tables.events(spark, sf001)
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), (math.floor(r.getDouble(1)).toLong % 10 + 10) % 10))
    val nTb = ev.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val nT = ev.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val nB = ev.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
    val n = ev.length.toLong
    val exp = nTb.groupBy(_._1._1).map { case (t, cells) =>
      val part = cells.map { case ((_, b), c) =>
        val term = (c.toDouble / n) *
          math.log((c.toDouble * n) / (nT(t).toDouble * nB(b)))
        BigDecimal(math.floor(term * 1000000 + 0.5) / 1000000.0)
          .setScale(6)
      }.sum
      t -> ((nT(t), cells.size.toLong, part.toDouble))
    }
    assert(got == exp, s"MI mismatch:\n got=$got\n exp=$exp")
    // the grand total is a KL divergence: >= 0 up to grid loss,
    // <= ln(min(|T|, 10))
    val total = got.values.map(_._3).sum
    assert(total >= -1e-4 && total <= math.log(math.min(got.size, 10)) + 1e-6,
      s"total MI $total out of KL bounds")
  }

  test("zipf fit (#266): matches integer-exact brute-force OLS; slope negative") {
    val row = CorpusOps.textZipfFit(spark, sf001).head
    val counts = Tables.documents(spark, sf001).select(col("text")).collect()
      .flatMap(_.getString(0).split(" ", -1))
      .groupBy(identity).map { case (w, v) => (w, v.length.toLong) }
    val top = counts.toSeq.sortBy { case (w, c) => (-c, w) }.take(100)
    val g = top.zipWithIndex.map { case ((_, c), i) =>
      (math.floor(math.log((i + 1).toDouble) * 1000000000L).toLong,
       math.floor(math.log(c.toDouble) * 1000000000L).toLong) }
    val nn = g.length.toLong
    val (sx, sy) = (g.map(_._1).sum, g.map(_._2).sum)
    val sxy = g.map { case (x, y) => BigInt(x) * y }.sum
    val sxx = g.map { case (x, _) => BigInt(x) * x }.sum
    val slope = math.floor(
      (BigDecimal(nn * sxy - BigInt(sx) * sy) /
       BigDecimal(nn * sxx - BigInt(sx) * sx)).toDouble * 1000000 + 0.5) / 1000000.0
    val intercept = math.floor(
      ((sy.toDouble - slope * sx) / nn / 1e9) * 1000000 + 0.5) / 1000000.0
    assert(row.getAs[Long]("n_terms") == nn)
    assert(row.getAs[Long]("max_count") == top.head._2)
    assert(math.abs(row.getAs[Double]("slope") - slope) <= 1e-6,
      s"slope ${row.getAs[Double]("slope")} vs brute $slope")
    assert(math.abs(row.getAs[Double]("intercept_ln") - intercept) <= 1e-6)
    assert(row.getAs[Double]("slope") < 0, "zipf head must decay")
  }

  test("late-arriving dim (#267): unknown member is first-class, revenue closure holds") {
    val got = EtlOps.etlLateArrivingDim(spark, sf001).collect().map(r =>
      (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.exists(_._1 == -1), "unknown member bucket present")
    // revenue closure: nothing dropped — the whole point of the pattern
    val totalRevenue = Tables.orders(spark, sf001)
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"))
      .head.getDouble(0)
    assert(math.abs(got.map(_._3).sum - totalRevenue) <= 0.01, "revenue closure")
    assert(got.map(_._2).sum == Tables.orders(spark, sf001).count(),
      "every fact lands exactly once")
    // the unknown bucket is exactly the withheld keys' orders
    val lateOrders = Tables.orders(spark, sf001)
      .where(col("o_custkey") % 13 === 0).count()
    assert(got.find(_._1 == -1).get._2 == lateOrders)
  }

  test("herfindahl (#268): matches brute force; bounded by [top_share^2 + grid, top_share]") {
    val got = AggOps.aggHerfindahlShare(spark, sf001).collect().map(r =>
      (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
       r.getDouble(4))).toSeq
    val custCents = Tables.orders(spark, sf001)
      .select(col("o_custkey"), col("o_totalprice")).collect()
      .groupBy(_.getLong(0)).map { case (k, rs) => k -> rs.map(r =>
        (BigDecimal(r.getDouble(1))
          .setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact).sum }
    val nationOf = Tables.customer(spark, sf001)
      .select(col("c_custkey"), col("c_nationkey")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val exp = custCents.toSeq.groupBy { case (k, _) => nationOf(k) }
      .map { case (nk, cs) =>
        val tot = cs.map(_._2).sum
        val s8 = cs.map { case (_, c) => c * 100000000L / tot }
        (nk, cs.size.toLong, tot.toDouble / 100,
         s8.map(s => BigInt(s) * s).sum.toDouble / 1e16,
         s8.max.toDouble / 1e8)
      }.toSeq.sortBy(_._1)
    assert(got == exp, s"HHI mismatch:\n got=${got.take(3)}\n exp=${exp.take(3)}")
    got.foreach { case (nk, n, _, hhi, top) =>
      assert(hhi <= top + 1e-12, s"nation $nk: hhi $hhi > top_share $top")
      assert(hhi >= top * top - 1e-12, s"nation $nk: hhi below top^2")
      assert(hhi >= 1.0 / n - 2e-8 && hhi <= 1.0 + 1e-12,
        s"nation $nk: hhi $hhi out of [1/n, 1]")
    }
  }

  test("js divergence (#269): matches brute force; bounded by [0, ln 2]") {
    val row = TextOps.textJsDivergence(spark, sf001).head
    val docs = Tables.documents(spark, sf001)
      .select(col("lang"), col("text")).collect()
    val pairs = docs.flatMap(r =>
      r.getString(1).split(" ", -1).map(w => (r.getString(0) == "en", w)))
    val ca = pairs.filter(_._1).groupBy(_._2).map { case (w, v) => w -> v.length.toLong }
    val cb = pairs.filterNot(_._1).groupBy(_._2).map { case (w, v) => w -> v.length.toLong }
    val vocab = (ca.keySet ++ cb.keySet).toSeq
    val (na, nb) = (ca.values.sum, cb.values.sum)
    def grid8(x: Double) = BigDecimal(math.floor(x * 100000000 + 0.5) / 100000000.0)
      .setScale(8)
    val (ta, tb) = vocab.map { w =>
      val (a, b) = (ca.getOrElse(w, 0L), cb.getOrElse(w, 0L))
      val m = (a.toDouble / na + b.toDouble / nb) / 2.0
      (grid8(if (a > 0) (a.toDouble / na) * math.log(a.toDouble / na / m) else 0.0),
       grid8(if (b > 0) (b.toDouble / nb) * math.log(b.toDouble / nb / m) else 0.0))
    }.unzip
    val jsd = (ta.sum + tb.sum).toDouble / 2
    assert(row.getAs[Long]("n_terms") == vocab.size)
    assert(row.getAs[Long]("tokens_en") == na &&
      row.getAs[Long]("tokens_rest") == nb)
    assert(row.getAs[Double]("jsd") == jsd,
      s"jsd ${row.getAs[Double]("jsd")} vs brute $jsd")
    assert(jsd >= 0 && jsd <= math.log(2.0) + 1e-9, s"jsd $jsd out of [0, ln2]")
  }

  test("interarrival (#270): matches brute force; pair-count closure holds") {
    val got = EtlOps.eventsInterarrivalHist(spark, sf001).collect().map(r =>
      ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap
    val ev = Tables.events(spark, sf001)
      .select(col("event_type"), col("user_id"), col("event_id"),
        unix_micros(col("ts"))).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val exp = ev.groupBy(e => (e._1, e._2)).toSeq.flatMap { case ((t, _), es) =>
      val sorted = es.sortBy(e => (e._4, e._3))
      sorted.sliding(2).collect { case Array(a, b) =>
        (t, math.min((b._4 - a._4) / 60000000L, 10L), b._4 - a._4) }
    }.groupBy { case (t, bkt, _) => (t, bkt) }
      .map { case (k, gs) => k -> ((gs.size.toLong, gs.map(_._3).sum)) }
    assert(got == exp, s"interarrival mismatch: ${got.size} vs ${exp.size} cells")
    // closure: every (type, user) stream of n events yields n-1 pairs
    val expectedPairs = ev.groupBy(e => (e._1, e._2)).values
      .map(v => (v.size - 1).toLong).sum
    assert(got.values.map(_._1).sum == expectedPairs, "pair-count closure")
    assert(got.keys.forall { case (_, b) => b >= 0 && b <= 10 })
  }

  test("vocab coverage (#271): matches brute force; monotone to 1.0") {
    val got = CorpusOps.textVocabCoverage(spark, sf001).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val counts = Tables.documents(spark, sf001).select(col("text")).collect()
      .flatMap(_.getString(0).split(" ", -1))
      .groupBy(identity).map { case (w, v) => (w, v.length.toLong) }
    val ranked = counts.toSeq.sortBy { case (w, c) => (-c, w) }
    val nTokens = ranked.map(_._2).sum
    val exp = Seq(1, 5, 10, 20).filter(_ <= ranked.size).map { k =>
      val cum = ranked.take(k).map(_._2).sum
      (k.toLong, cum, nTokens,
       math.floor(cum.toDouble / nTokens * 1000000 + 0.5) / 1000000.0)
    }
    assert(got == exp, s"coverage mismatch:\n got=$got\n exp=$exp")
    assert(got.map(_._4) == got.map(_._4).sorted, "coverage monotone in k")
    assert(got.last._4 <= 1.0 + 1e-12)
  }

  test("baseline/reporting (#272): matches brute force; cutover event sits in neither side") {
    val got = EtlOps.etlBaselineReportingUsage(spark, sf001).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
       r.getDouble(4), r.getDouble(5))).toSeq
    val ev = Tables.events(spark, sf001)
      .select(col("user_id"), unix_micros(col("ts")), col("event_type"),
        col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        (BigDecimal(r.getDouble(3))
          .setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact))
    val cut = ev.filter(_._3 == "purchase").groupBy(_._1)
      .map { case (u, es) => u -> es.map(_._2).min }
    val exp = ev.filter(e => cut.contains(e._1)).groupBy(_._1).toSeq
      .map { case (u, es) =>
        val c = cut(u)
        val b = es.filter(_._2 < c); val r = es.filter(_._2 > c)
        (u, b.size.toLong, r.size.toLong, b.map(_._4).sum, r.map(_._4).sum)
      }
      .filter(x => x._2 > 0 && x._3 > 0)
      .sortBy { case (u, _, _, bc, rc) => (-(bc - rc), u) }.take(20)
      .map { case (u, nb, nr, bc, rc) =>
        (u, nb, nr, bc.toDouble / 100, rc.toDouble / 100,
         (bc - rc).toDouble / 100) }
    assert(got == exp, s"baseline/reporting mismatch:\n got=${got.take(3)}\n exp=${exp.take(3)}")
    // the cutover purchase itself lands in NEITHER side (strict
    // inequalities), so per user: n_baseline + n_reporting counts all
    // their events except ties at the cutover microsecond
    got.foreach { case (u, nb, nr, _, _, _) =>
      val all = ev.count(_._1 == u)
      val atCut = ev.count(e => e._1 == u && e._2 == cut(u))
      assert(nb + nr == all - atCut, s"user $u side closure")
    }
  }

  test("hapax ratio (#273): matches brute force; shares bounded and consistent") {
    val got = CorpusOps.textHapaxRatio(spark, sf001).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
       r.getDouble(4), r.getDouble(5))).toSeq
    val slices = Tables.documents(spark, sf001)
      .select(col("lang"), col("text")).collect()
      .flatMap(r => r.getString(1).split(" ", -1).map(w => (r.getString(0), w)))
    val exp = slices.groupBy(_._1).toSeq.map { case (lang, ws) =>
      val counts = ws.groupBy(_._2).map { case (_, v) => v.length.toLong }
      val (terms, hapax, tokens) =
        (counts.size.toLong, counts.count(_ == 1L).toLong, counts.sum)
      (lang, terms, hapax, tokens,
       math.floor(hapax.toDouble / terms * 1000000 + 0.5) / 1000000.0,
       math.floor(hapax.toDouble / tokens * 1000000 + 0.5) / 1000000.0)
    }.sortBy(_._1)
    assert(got == exp, s"hapax mismatch:\n got=$got\n exp=$exp")
    got.foreach { case (_, terms, hapax, tokens, ts, ks) =>
      assert(hapax <= terms && terms <= tokens)
      assert(ks <= ts + 1e-12, "token share cannot exceed term share")
    }
  }

  test("snapshot compact (#263): v1 and v2 rows are identical (content-preserving)") {
    val rows = EtlOps.etlSnapshotCompact(spark, sf001).collect()
    assert(rows.length == 2)
    val Array(a, b) = rows
    assert(a.getInt(0) == 1 && b.getInt(0) == 2)
    assert(a.getLong(1) == b.getLong(1), "n_rows preserved")
    assert(a.getDouble(2) == b.getDouble(2), "total preserved exactly")
    assert(a.getLong(3) == b.getLong(3), "updated-row count preserved")
  }
}
