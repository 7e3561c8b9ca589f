package graft

import org.apache.spark.sql.functions._
import graft.ops._

/** Unit + invariant tests for the round-7 warehouse / SQL-surface
  * additions (#144–#162): closed-form identities the DuckDB
  * hash-compare cannot articulate — attribution picks the true argmax
  * click, the SCD2 point-in-time join lands every fact in exactly one
  * interval, the snapshot diff partitions the key universe, CDC
  * delete semantics drop exactly the keys whose LAST op is a delete,
  * OHLC/interval-join/forward-fill match brute force, the recursive
  * CTE walks its closed-form chains, and bitmap distinct reproduces
  * countDistinct bit-exactly. */
class WarehouseOpsSpec extends SparkSpec {

  test("last-touch attribution: one row per purchase, strict precedence, true argmax") {
    val rows = EtlOps.eventsAttributionLasttouch(spark, sf001).collect()
    val nPurchases = Tables.events(spark, sf001)
      .where(col("event_type") === "purchase").count()
    assert(rows.length == nPurchases, "attribution must keep every purchase")
    assert(rows.map(_.getAs[Long]("purchase_id")).distinct.length == rows.length)
    // attributed rows have a strictly-positive gap; unattributed rows
    // are all-null on the click side
    rows.foreach { r =>
      if (r.isNullAt(r.fieldIndex("click_id"))) {
        assert(r.isNullAt(r.fieldIndex("gap_us")), s"null click with a gap: $r")
      } else {
        assert(r.getAs[Long]("gap_us") > 0L, s"non-strict attribution: $r")
      }
    }
    // brute-force the argmax for the user with the most purchases
    val ev = Tables.events(spark, sf001)
      .select(col("event_id"), col("user_id"), col("event_type"),
              unix_micros(col("ts")).as("us"))
      .collect()
    val byUser = ev.groupBy(_.getAs[Long]("user_id"))
    val purchases = ev.filter(_.getAs[String]("event_type") == "purchase")
    val rowsById = rows.map(r => r.getAs[Long]("purchase_id") -> r).toMap
    purchases.foreach { p =>
      val clicks = byUser(p.getAs[Long]("user_id"))
        .filter(e => e.getAs[String]("event_type") == "click" &&
                     e.getAs[Long]("us") < p.getAs[Long]("us"))
      val got = rowsById(p.getAs[Long]("event_id"))
      if (clicks.isEmpty) {
        assert(got.isNullAt(got.fieldIndex("click_id")), s"phantom attribution: $got")
      } else {
        val best = clicks.maxBy(e => (e.getAs[Long]("us"), e.getAs[Long]("event_id")))
        assert(got.getAs[Long]("click_id") == best.getAs[Long]("event_id"),
               s"wrong click for purchase ${p.getAs[Long]("event_id")}")
      }
    }
  }

  test("retention cohort: day-0 is complete, counts bounded, matches brute force") {
    val rows = EtlOps.eventsRetentionCohort(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_active") <= r.getAs[Long]("n_cohort"), s"$r")
      assert(r.getAs[Long]("day_offset") >= 0L, s"$r")
      val ret = r.getAs[Double]("retention")
      assert(ret > 0.0 && ret <= 1.0, s"$r")
    }
    // every user is active on their own first day → offset 0 is the
    // full cohort at retention 1.0
    rows.filter(_.getAs[Long]("day_offset") == 0L).foreach { r =>
      assert(r.getAs[Long]("n_active") == r.getAs[Long]("n_cohort"), s"$r")
      assert(r.getAs[Double]("retention") == 1.0, s"$r")
    }
    // brute force off the raw events
    val act = Tables.events(spark, sf001)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[java.sql.Date]("day")))
      .distinct
    val firstDay = act.groupBy(_._1).map { case (u, ds) => u -> ds.map(_._2).minBy(_.getTime) }
    val expected = act
      .map { case (u, d) =>
        val c = firstDay(u)
        // calendar-day diff via LocalDate: epoch-millis division on
        // java.sql.Date depends on the JVM default TZ and understates
        // by a day across a DST transition on non-UTC hosts
        (c, java.time.temporal.ChronoUnit.DAYS.between(c.toLocalDate, d.toLocalDate)) }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val got = rows.map(r => (
        new java.sql.Date(r.getAs[java.sql.Timestamp]("cohort_day").getTime),
        r.getAs[Long]("day_offset")) -> r.getAs[Long]("n_active")).toMap
    assert(got.map { case ((c, o), n) => (c.toString, o) -> n } ==
           expected.map { case ((c, o), n) => (c.toString, o) -> n })
  }

  test("rolling active: dau <= wau, first day degenerate, wau matches brute force") {
    val rows = EtlOps.eventsRollingActive(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("dau") <= r.getAs[Long]("wau"), s"$r")
      val s = r.getAs[Double]("stickiness")
      assert(s > 0.0 && s <= 1.0, s"$r")
    }
    val act = Tables.events(spark, sf001)
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .collect().map(r => (r.getAs[java.sql.Date]("day").toString, r.getAs[Long]("user_id")))
      .distinct
    val days = act.map(_._1).distinct.sorted
    // the earliest day has no history → its window is exactly its day
    val first = rows.minBy(_.getAs[java.sql.Timestamp]("day").getTime)
    assert(first.getAs[Long]("dau") == first.getAs[Long]("wau"))
    // brute-force WAU for every day present in the output
    val byDay = rows.map(r =>
      r.getAs[java.sql.Timestamp]("day").toLocalDateTime.toLocalDate.toString -> r).toMap
    assert(byDay.keySet == days.toSet, "output days must be the active days")
    days.foreach { d =>
      val dDate = java.time.LocalDate.parse(d)
      val window = (0 to 6).map(i => dDate.minusDays(i.toLong).toString).toSet
      val brute = act.filter { case (ad, _) => window(ad) }.map(_._2).distinct.length.toLong
      assert(byDay(d).getAs[Long]("wau") == brute, s"day $d: ${byDay(d)} vs $brute")
    }
  }

  test("markov transitions: rows normalize, volume closed-form, matches brute force") {
    val rows = EtlOps.eventsMarkovTransitions(spark, sf001).collect()
    assert(rows.nonEmpty)
    // each user with n events contributes exactly n-1 transitions
    val ev = Tables.events(spark, sf001)
    val expectedTotal = ev.count() - ev.select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n_transitions")).sum == expectedTotal)
    // every from-row's probabilities sum to 1 within 4-dp rounding
    rows.groupBy(_.getAs[String]("from_type")).foreach { case (f, rs) =>
      val s = rs.map(_.getAs[Double]("p")).sum
      assert(math.abs(s - 1.0) <= 0.0005 * rs.length, s"$f sums to $s")
    }
    // brute-force the matrix from the collected stream
    val seq = ev.select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("event_id")).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
                 r.getAs[Long]("us"), r.getAs[Long]("event_id")))
    val brute = seq.groupBy(_._1).values.flatMap { es =>
      es.sortBy(e => (e._3, e._4)).sliding(2).collect {
        case Array(a, b) => (a._2, b._2) }
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val got = rows.map(r => (r.getAs[String]("from_type"),
      r.getAs[String]("to_type")) -> r.getAs[Long]("n_transitions")).toMap
    assert(got == brute)
  }

  test("SCD2 point-in-time: every purchase exactly once, interval actually contains it") {
    val rows = EtlOps.joinScd2Pointintime(spark, sf001).collect()
    val nPurchases = Tables.events(spark, sf001)
      .where(col("event_type") === "purchase").count()
    assert(rows.length == nPurchases, "left join must keep every purchase")
    assert(rows.map(_.getAs[Long]("purchase_id")).distinct.length == rows.length,
           "disjoint intervals ⇒ at most one tier match per purchase")
    // tier null ⇔ purchase precedes the user's first signup
    val firstSignup = Tables.events(spark, sf001)
      .where(col("event_type") === "signup")
      .groupBy(col("user_id"))
      .agg(min(unix_micros(col("ts"))).as("first_us"))
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("first_us")).toMap
    val pUs = Tables.events(spark, sf001)
      .where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Long]("user_id"), r.getAs[Long]("us"))).toMap
    rows.foreach { r =>
      val (uid, us) = pUs(r.getAs[Long]("purchase_id"))
      val expectNull = firstSignup.get(uid).forall(us < _)
      assert(r.isNullAt(r.fieldIndex("tier")) == expectNull,
             s"tier-null mismatch for purchase ${r.getAs[Long]("purchase_id")}")
    }
  }

  test("snapshot diff: classes partition the key universe with exact counts") {
    val rows = EtlOps.etlSnapshotDiff(spark, sf001).collect()
    val keys = Tables.orders(spark, sf001)
      .select(col("o_orderkey")).collect().map(_.getLong(0))
    val v1 = keys.filter(_ % 97 != 3).toSet
    val v2 = keys.filter(_ % 97 != 0).toSet
    val byClass = rows.map(r => r.getAs[String]("class") ->
      (r.getAs[Long]("n_rows"), r.getAs[Long]("key_sum"))).toMap
    val added = v2 -- v1
    val removed = v1 -- v2
    val changed = (v1 & v2).filter(_ % 89 == 0)
    val unchanged = (v1 & v2).filterNot(_ % 89 == 0)
    def check(cls: String, expect: Set[Long]): Unit = {
      if (expect.isEmpty) assert(!byClass.contains(cls), s"$cls should be absent")
      else {
        val (n, sum) = byClass(cls)
        assert(n == expect.size, s"$cls count $n != ${expect.size}")
        assert(sum == expect.sum, s"$cls key_sum $sum != ${expect.sum}")
      }
    }
    check("added", added); check("removed", removed)
    check("changed", changed); check("unchanged", unchanged)
  }

  test("OHLC: bars bracket open/close, partition the stream, match brute force") {
    val bars = EtlOps.tsDownsampleOhlc(spark, sf001).collect()
    assert(bars.nonEmpty)
    bars.foreach { r =>
      val (o, h, l, c) = (r.getAs[Double]("open_value"), r.getAs[Double]("high_value"),
                          r.getAs[Double]("low_value"), r.getAs[Double]("close_value"))
      // rounding happens per-aggregate, so bracket holds up to the 2dp grid
      assert(l <= h + 1e-9, s"low > high: $r")
      assert(o >= l - 0.005 && o <= h + 0.005, s"open outside [low, high]: $r")
      assert(c >= l - 0.005 && c <= h + 0.005, s"close outside [low, high]: $r")
      assert(r.getAs[Long]("n_events") > 0L)
    }
    assert(bars.map(_.getAs[Long]("n_events")).sum ==
           Tables.events(spark, sf001).count(), "bars must partition the stream")
    // brute-force one bucket: the largest bar's open/close by (ts, event_id)
    val biggest = bars.maxBy(_.getAs[Long]("n_events"))
    val rows = Tables.events(spark, sf001)
      .where(col("event_type") === biggest.getAs[String]("event_type") &&
             date_trunc("day", col("ts")) === biggest.getAs[java.sql.Timestamp]("day"))
      .select(unix_micros(col("ts")).as("us"), col("event_id"), col("value"))
      .collect()
    def key(r: org.apache.spark.sql.Row) = (r.getAs[Long]("us"), r.getAs[Long]("event_id"))
    assert(math.abs(rows.minBy(key(_)).getAs[Double]("value") -
                    biggest.getAs[Double]("open_value")) < 0.005)
    assert(math.abs(rows.maxBy(key(_)).getAs[Double]("value") -
                    biggest.getAs[Double]("close_value")) < 0.005)
  }

  test("MAD: nonnegative, bounded by max deviation, outliers a strict minority") {
    val rows = AggOps.aggMadRobust(spark, sf001).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val mad = r.getAs[Double]("mad")
      assert(mad >= 0.0, s"negative MAD: $r")
      // MAD has a 50% breakdown point: at most half the rows can sit
      // beyond 3.5 modified z-scores by construction of the median
      assert(r.getAs[Long]("n_outliers") <= r.getAs[Long]("n_rows") / 2, r.toString)
    }
  }

  test("stream interval join: counts match brute force, zero-click purchases kept") {
    val rows = StreamOps.streamJoinInterval(spark, sf001).collect()
    val ev = Tables.events(spark, sf001)
      .select(col("event_id"), col("user_id"), col("event_type"),
              unix_micros(col("ts")).as("us"))
      .collect()
    val purchases = ev.filter(_.getAs[String]("event_type") == "purchase")
    assert(rows.length == purchases.length, "left join must keep every purchase")
    val byUser = ev.groupBy(_.getAs[Long]("user_id"))
    val got = rows.map(r => r.getAs[Long]("purchase_id") -> r).toMap
    purchases.foreach { p =>
      val pUs = p.getAs[Long]("us")
      val expect = byUser(p.getAs[Long]("user_id")).count { e =>
        e.getAs[String]("event_type") == "click" &&
        e.getAs[Long]("us") >= pUs - 3600000000L && e.getAs[Long]("us") < pUs
      }
      val r = got(p.getAs[Long]("event_id"))
      assert(r.getAs[Long]("n_clicks_1h") == expect, s"count wrong: $r")
      if (expect == 0)
        assert(r.getAs[Double]("click_value_1h") == 0.0, s"zero-click value: $r")
    }
  }

  test("recursive CTE: five 5-node chains, closed-form key checksums") {
    val rows = GraphOps.sqlRecursiveCte(spark, sf001).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val root = r.getAs[Number]("root").longValue
      assert(r.getAs[Number]("n_nodes").longValue == 5L, r.toString)
      assert(r.getAs[Number]("max_depth").longValue == 4L, r.toString)
      // nodes are root, root+5, ..., root+20 ⇒ sum = 5·root + 50
      assert(r.getAs[Number]("node_sum").longValue == 5 * root + 50, r.toString)
    }
  }

  test("listagg: name count matches the separator count + 1, order ascending by key") {
    // sf0.01: the -900 acctbal slice is empty at sf0.001's 150 customers
    val rows = AggOps.aggListagg(spark, sf01).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val names = r.getAs[String]("names").split('|')
      assert(names.length == r.getAs[Number]("n_customers").longValue, r.toString)
    }
  }

  test("moving slope: row count closed-form, one user matches brute-force least squares") {
    val rows = WindowOps.winMovingSlope(spark, sf001).collect()
    val perUser = Tables.events(spark, sf001)
      .groupBy(col("user_id")).count().collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("count")).toMap
    assert(rows.length == perUser.values.map(n => math.max(0L, n - 4)).sum,
           "one slope per full 5-row frame")
    // brute-force the busiest user
    val (uid, _) = perUser.maxBy(_._2)
    val ys = Tables.events(spark, sf001).where(col("user_id") === uid)
      .select(unix_micros(col("ts")).as("us"), col("event_id"),
              Tables.money(col("value")).cast("double").as("y"))
      .collect()
      .sortBy(r => (r.getAs[Long]("us"), r.getAs[Long]("event_id")))
    val got = rows.filter(_.getAs[Long]("user_id") == uid)
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Double]("slope_5")).toMap
    ys.indices.drop(4).foreach { i =>
      val win = (i - 4 to i).map { j =>
        (j + 1.0, ys(j).getAs[Double]("y"))
      }
      val (sx, sy) = (win.map(_._1).sum, win.map(_._2).sum)
      val sxy = win.map { case (x, y) => x * y }.sum
      val sxx = win.map { case (x, _) => x * x }.sum
      val slope = (5.0 * sxy - sx * sy) / (5.0 * sxx - sx * sx)
      val eid = ys(i).getAs[Long]("event_id")
      assert(math.abs(got(eid) - slope) < 5e-4,
             s"user $uid event $eid: ${got(eid)} vs brute $slope")
    }
  }

  test("try_cast salvage: clean types fully parse, error rows never do") {
    val rows = ScalarOps.scalarTryCast(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (r.getAs[String]("event_type") == "error") {
        assert(r.getAs[Long]("n_parsed") == 0L, r.toString)
        assert(r.isNullAt(r.fieldIndex("parsed_sum")), r.toString)
      } else {
        assert(r.getAs[Long]("n_parsed") == r.getAs[Long]("n_rows"), r.toString)
      }
    }
  }

  test("fuzzy match: histogram covers exactly n-1 adjacent pairs, distances bounded") {
    val rows = ScalarOps.strFuzzyMatch(spark, sf001).collect()
    val n = Tables.customer(spark, sf001).count()
    assert(rows.map(_.getAs[Long]("n_pairs")).sum == n - 1)
    // zero-padded names share the prefix; only digit positions differ
    rows.foreach { r =>
      val d = r.getAs[Long]("edit_dist")
      assert(d >= 1 && d <= 9, r.toString)
    }
  }

  test("bitmap distinct equals the engine's own count(DISTINCT) on both scales") {
    Seq(sf001, sf01).foreach { sf =>
      val got = AggOps.aggBitmapDistinct(spark, sf).collect()
        .map(r => r.getAs[String]("l_returnflag") ->
                  r.getAs[Long]("n_distinct_parts")).toMap
      val expect = Tables.lineitem(spark, sf)
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n"))
        .collect().map(r => r.getAs[String]("l_returnflag") -> r.getAs[Long]("n")).toMap
      assert(got == expect, s"$sf: bitmap $got != countDistinct $expect")
    }
  }

  test("forward fill: LOCF equals brute force per user, leading nulls preserved") {
    val rows = EtlOps.etlForwardFill(spark, sf001).collect()
    val ev = Tables.events(spark, sf001)
      .select(col("event_id"), col("user_id"), col("event_type"),
              unix_micros(col("ts")).as("us"),
              Tables.money(col("value")).cast("double").as("v"))
      .collect()
    val filled = rows.map(r => r.getAs[Long]("event_id") -> r).toMap
    // brute-force walk in (ts, event_id) order per user
    ev.groupBy(_.getAs[Long]("user_id")).foreach { case (_, es) =>
      var lastValid: Option[Double] = None
      es.sortBy(e => (e.getAs[Long]("us"), e.getAs[Long]("event_id"))).foreach { e =>
        if (e.getAs[String]("event_type") != "error")
          lastValid = Some(e.getAs[Double]("v"))
        val r = filled(e.getAs[Long]("event_id"))
        lastValid match {
          case Some(v) => assert(r.getAs[Double]("filled_value") == v, r.toString)
          case None => assert(r.isNullAt(r.fieldIndex("filled_value")), r.toString)
        }
      }
    }
  }

  test("share-of-group (#260): matches brute force exactly, shares on the integer grid") {
    val got = WindowOps.winShareOfGroup(spark, sf001).collect().map(r =>
      (r.getAs[Long]("o_orderkey"), r.getAs[Long]("o_custkey"),
       r.getAs[Double]("order_value"), r.getAs[Double]("customer_total"),
       r.getAs[Double]("share"))).toSeq
    // brute force: exact cents (double → DECIMAL(18,2) is HALF_UP),
    // per-customer totals, share8 = cents·10⁸ DIV total — then the
    // same (share desc, orderkey asc) global top-20
    val raw = Tables.orders(spark, sf001)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        (BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP)
          * 100).toLongExact))
    val tot = raw.groupBy(_._2).map { case (c, rs) => c -> rs.map(_._3).sum }
    val exp = raw.map { case (ok, ck, c) =>
      val t = tot(ck)
      (ok, ck, c, t, c * 100000000L / t)
    }.sortBy { case (ok, _, _, _, s8) => (-s8, ok) }.take(20)
      .map { case (ok, ck, c, t, s8) =>
        (ok, ck, c / 100.0, t / 100.0, s8.toDouble / 100000000L) }.toSeq
    assert(got == exp, s"top-20 mismatch:\n got=$got\n exp=$exp")
    // invariants: shares in (0, 1], total ≥ value, and a share of
    // exactly 1 iff the order IS the customer's whole history
    got.foreach { case (_, _, v, t, s) =>
      assert(s > 0 && s <= 1.0 && t >= v)
      assert((s == 1.0) == (v == t))
    }
  }

  test("stickiness (#261): matches brute force exactly; ratio bounded by [1/n_days, 1]") {
    import java.time.{Instant, LocalDate, ZoneOffset, DayOfWeek}
    import java.time.temporal.TemporalAdjusters
    val got = EtlOps.eventsStickinessRatio(spark, sf001)
      .select(unix_micros(col("week")).as("wk_us"), col("n_days"),
        col("sum_dau"), col("wau"), col("stickiness"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    // brute force in java.time (UTC session): week = ISO Monday of the
    // event's UTC date; ΣDAU / n_days / WAU from distinct sets
    val ev = Tables.events(spark, sf001)
      .select(unix_micros(col("ts")), col("user_id")).collect()
      .map { r =>
        val d = Instant.ofEpochSecond(
          Math.floorDiv(r.getLong(0), 1000000L)).atZone(ZoneOffset.UTC).toLocalDate
        val wk = d.`with`(TemporalAdjusters.previousOrSame(DayOfWeek.MONDAY))
        (wk, d, r.getLong(1))
      }
    val exp = ev.groupBy(_._1).toSeq.map { case (wk, rs) =>
      val days = rs.map(_._2).distinct
      val sumDau = days.map(d => rs.filter(_._2 == d).map(_._3).distinct.length.toLong).sum
      val wau = rs.map(_._3).distinct.length.toLong
      val st8 = sumDau * 100000000L / (days.length * wau)
      (wk.atStartOfDay(ZoneOffset.UTC).toInstant.getEpochSecond * 1000000L,
       days.length.toLong, sumDau, wau, st8.toDouble / 100000000L)
    }.sortBy(_._1)
    assert(got == exp, s"stickiness mismatch:\n got=$got\n exp=$exp")
    got.foreach { case (_, nDays, sumDau, wau, st) =>
      assert(sumDau >= wau && sumDau <= nDays * wau,
        "every weekly-active user is active 1..n_days days")
      assert(st <= 1.0 && st >= 1.0 / nDays - 1e-8, s"st=$st out of bounds")
    }
  }

  test("CDC apply: surviving keys ⇔ last op not a delete; n_ops is total log depth") {
    val rows = EtlOps.etlCdcApply(spark, sf001).collect()
    val log = Tables.events(spark, sf001)
      .select(col("user_id"), col("event_id"), col("event_type"),
              unix_micros(col("ts")).as("us"))
      .collect()
    val byUser = log.groupBy(_.getAs[Long]("user_id"))
    val lastOp = byUser.map { case (u, es) =>
      u -> es.maxBy(e => (e.getAs[Long]("us"), e.getAs[Long]("event_id")))
    }
    val survivors = lastOp.filter(_._2.getAs[String]("event_type") != "error").keySet
    assert(rows.map(_.getAs[Long]("user_id")).toSet == survivors,
           "CDC survivors must be exactly the keys whose last op is not a delete")
    rows.foreach { r =>
      val u = r.getAs[Long]("user_id")
      assert(r.getAs[Long]("n_ops") == byUser(u).length, s"n_ops wrong for user $u")
      assert(r.getAs[Long]("last_event_id") ==
             lastOp(u).getAs[Long]("event_id"), s"last op wrong for user $u")
    }
  }
}
