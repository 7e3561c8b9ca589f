package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** BandJoinBucketingRule: the naive `abs(l-r) < eps` theta join is
  * rewritten to a bucketized equi-join with identical results. */
class BandJoinRuleSpec extends SparkSpec {

  private def withExtSession[A](f: SparkSession => A): A = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val ext = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new org.apache.spark.sql.graft.GraftExtensions)
      .getOrCreate()
    try f(ext)
    finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(SparkSpec.session)
      SparkSession.setActiveSession(SparkSpec.session)
    }
  }

  private def naiveBand(s: SparkSession) = {
    val p1 = Tables.part(s, sf001)
      .select(col("p_partkey").as("k1"), col("p_retailprice").as("v1"))
    val p2 = Tables.part(s, sf001)
      .select(col("p_partkey").as("k2"), col("p_retailprice").as("v2"))
    p1.join(p2, col("k1") < col("k2") && abs(col("v1") - col("v2")) < 2.5)
      .select(col("k1"), col("k2"))
  }

  test("naive band join is planned as an equi-join under the rule") {
    withExtSession { s =>
      val plan = naiveBand(s).queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
             !plan.contains("CartesianProduct"), plan)
      assert(plan.contains("__graft_band_probe"), plan)
    }
  }

  test("rewritten band join returns exactly the nested-loop results") {
    val expected = {
      // vanilla session: Spark's own NLJ plan is the semantics oracle
      val rows = naiveBand(spark).collect()
      rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val got = withExtSession { s =>
      naiveBand(s).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(got == expected, s"got=${got.size} expected=${expected.size}")
    assert(got.nonEmpty)
  }

  test("non-band theta joins are left untouched") {
    withExtSession { s =>
      val p1 = Tables.part(s, sf001).select(col("p_partkey").as("k1"))
      val p2 = Tables.part(s, sf001).select(col("p_partkey").as("k2"))
      val plan = p1.join(p2, col("k1") * 2 < col("k2"))
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastNestedLoopJoin"), plan)
      assert(!plan.contains("__graft_band_probe"), plan)
    }
  }

  test("rule handles negative values and <= predicates exactly (floor semantics)") {
    val expected = withVanilla { s =>
      import s.implicits._
      val (l, r) = negData(s)
      l.join(r, abs(col("lv") - col("rv")) <= 1.5).count()
    }
    val got = withExtSession { s =>
      val (l, r) = negData(s)
      val j = l.join(r, abs(col("lv") - col("rv")) <= 1.5)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("__graft_band_probe"), plan)
      j.count()
    }
    assert(got == expected && got > 0, s"got=$got expected=$expected")
  }

  private def negData(s: SparkSession) = {
    import s.implicits._
    val l = (-40 until 40).map(i => (i.toLong, i * 0.7 - 3.33)).toDF("lk", "lv")
    val r = (-40 until 40).map(i => (i.toLong, i * 0.9 + 1.11)).toDF("rk", "rv")
    (l, r)
  }

  private def withVanilla[A](f: SparkSession => A): A = f(spark)

  test("fuzz: rule matches NLJ results across random data and epsilons") {
    val rnd = new scala.util.Random(42)
    val cases = (1 to 8).map { _ =>
      val eps = Seq(0.01, 0.37, 1.0, 2.5, 1e6)(rnd.nextInt(5))
      val scale = Seq(1.0, 1e3, 1e7)(rnd.nextInt(3))
      val l = (0 until 50).map(i => (i.toLong, (rnd.nextDouble() - 0.5) * scale))
      val r = (0 until 50).map(i => (i.toLong, (rnd.nextDouble() - 0.5) * scale))
      (eps, l, r)
    }
    cases.foreach { case (eps, lData, rData) =>
      def q(s: SparkSession) = {
        import s.implicits._
        lData.toDF("lk", "lv").join(rData.toDF("rk", "rv"),
          abs(col("lv") - col("rv")) < eps)
      }
      val expected = q(spark).count()
      val got = withExtSession(s => q(s).count())
      assert(got == expected, s"eps=$eps: got=$got expected=$expected")
    }
  }

  test("integral band columns beyond 2^52 keep exact buckets (no dropped pairs)") {
    // doubles space by 8 at 2^55: the old double-divide bucket could
    // err past the ±2 probe margin; the decimal path is exact
    val base = 1L << 55
    def q(s: SparkSession) = {
      import s.implicits._
      val l = (0 until 30).map(i => (i.toLong, base + i * 2L)).toDF("lk", "lv")
      val r = (0 until 30).map(i => (i.toLong, base + i * 3L)).toDF("rk", "rv")
      l.join(r, abs(col("lv") - col("rv")) < 3L)
    }
    val expected = q(spark).count()
    val got = withExtSession { s =>
      val j = q(s)
      assert(j.queryExecution.executedPlan.toString.contains("__graft_band_probe"))
      j.count()
    }
    assert(got == expected && got > 0, s"got=$got expected=$expected")
  }

  test("DECIMAL band columns beyond 2^52 keep exact buckets too") {
    def q(s: SparkSession) = {
      import s.implicits._
      val l = (0 until 30).map(i => (i.toLong, BigDecimal((1L << 55) + i * 2L)))
        .toDF("lk", "lv")
      val r = (0 until 30).map(i => (i.toLong, BigDecimal((1L << 55) + i * 3L)))
        .toDF("rk", "rv")
      l.join(r, abs(col("lv") - col("rv")) < 3L)
    }
    val expected = q(spark).count()
    val got = withExtSession { s =>
      val j = q(s)
      assert(j.queryExecution.executedPlan.toString.contains("__graft_band_probe"))
      j.count()
    }
    assert(got == expected && got > 0, s"got=$got expected=$expected")
  }

  test("joins that already have an equi key are left untouched") {
    withExtSession { s =>
      val li = Tables.lineitem(s, sf001)
      val or = Tables.orders(s, sf001)
      val plan = li.join(or,
          col("l_orderkey") === col("o_orderkey") &&
          abs(col("l_extendedprice") - col("o_totalprice")) < 1000.0)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("__graft_band_probe"), plan)
    }
  }
}
