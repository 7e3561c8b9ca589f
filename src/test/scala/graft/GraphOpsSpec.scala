package graft

import org.apache.spark.sql.functions._
import graft.ops._

/** Unit + invariant tests for the round-6 graph family (#122–#123)
  * and the other round-6 additions (#118–#121) beyond the oracle
  * sweep: closed-form checks on tiny planted inputs plus structural
  * invariants the DuckDB hash-compare cannot articulate. */
class GraphOpsSpec extends SparkSpec {

  test("pagerank: ranks positive, mass bounded by 1, uniform on a symmetric cycle") {
    val rows = GraphOps.graphPagerank(spark, sf001).collect()
    assert(rows.length == 25)
    val ranks = rows.map(_.getAs[Double]("pagerank"))
    assert(ranks.forall(r => r > 0.0 && r < 1.0))
    // teleport mass is always injected; link mass can only leak via
    // dangling nodes, so the total sits in (0.15, 1 + rounding slack]
    // (display rounds each of 25 ranks at 6dp => up to 1.25e-5 slack)
    val total = ranks.sum
    assert(total > 0.15 && total <= 1.0 + 1e-4, s"total rank mass $total")
  }

  test("pagerank mass is conserved when no node is dangling (sf0.01)") {
    // at sf0.01 all 25 nations have customers => every node has
    // out-edges => sum of ranks must stay 1 up to the rounding grid
    val edges = Tables.lineitem(spark, sf01).select(col("l_orderkey"))
      .join(Tables.orders(spark, sf01)
              .select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sf01)
              .select(col("c_custkey"), col("c_nationkey")),
            col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey")).distinct()
    assume(edges.count() == 25, "corpus drift: not all nations ordering")
    val total = GraphOps.graphPagerank(spark, sf01).collect()
      .map(_.getAs[Double]("pagerank")).sum
    // 5 iterations x 25 nodes on a 1e-10 grid + 6dp display rounding
    assert(math.abs(total - 1.0) < 1e-4, s"total rank mass $total")
  }

  test("triangle participation total is divisible by 3") {
    // every triangle contributes exactly one count to each of its 3
    // corners — a structural identity of the enumeration
    Seq(sf001, sf01).foreach { sf =>
      val total = GraphOps.graphTriangleCount(spark, sf).collect()
        .map(_.getAs[Long]("n_triangles")).sum
      assert(total % 3 == 0, s"$sf: corner-count total $total not 3-divisible")
    }
  }

  test("gap islands: island arithmetic closes and event totals are preserved") {
    val islands = WindowOps.winGapIslands(spark, sf001).collect()
    assert(islands.nonEmpty)
    islands.foreach { r =>
      val start = r.getAs[java.sql.Timestamp]("island_start")
      val end = r.getAs[java.sql.Timestamp]("island_end")
      val days = r.getAs[Long]("n_days")
      val spanDays = (end.getTime - start.getTime) / 86400000L + 1
      assert(spanDays == days, s"island span $spanDays != n_days $days: $r")
    }
    val totalEvents = islands.map(_.getAs[Long]("n_events")).sum
    assert(totalEvents == Tables.events(spark, sf001).count())
  }

  test("token entropy: bounded by log2(n_distinct), zero iff one distinct token") {
    val rows = CorpusOps.textTokenEntropy(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val h = r.getAs[Double]("entropy_bits")
      val d = r.getAs[Long]("n_distinct")
      val bound = math.log(d.toDouble) / math.log(2.0)
      assert(h >= -1e-9 && h <= bound + 1e-4, s"entropy $h outside [0, $bound]: $r")
      if (d == 1) assert(math.abs(h) < 1e-9)
    }
  }

  test("length histogram partitions the corpus: counts and shares close") {
    val rows = CorpusOps.textLengthHistogram(spark, sf001).collect()
    val nDocs = rows.map(_.getAs[Long]("n_docs")).sum
    assert(nDocs == Tables.documents(spark, sf001).count())
    rows.foreach { r =>
      assert(r.getAs[Long]("min_chars") >= r.getAs[Long]("bucket_lo"), r)
      assert(r.getAs[Long]("max_chars") <= r.getAs[Long]("bucket_hi"), r)
    }
    val shareSum = rows.map(_.getAs[Double]("share")).sum
    assert(math.abs(shareSum - 1.0) < rows.length * 5e-5, s"share sum $shareSum")
  }

  test("merged intervals are disjoint per user and account for every event") {
    val spans = EtlOps.etlMergeIntervals(spark, sf001).collect()
    assert(spans.nonEmpty)
    // within a user, consecutive spans must be strictly separated
    // (that is what makes them maximal merges)
    spans.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rs) =>
      val ordered = rs.sortBy(_.getAs[Long]("span_id"))
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[java.sql.Timestamp]("span_start").getTime >
                 a.getAs[java.sql.Timestamp]("span_end").getTime,
            s"overlapping spans: $a / $b")
        case _ => ()
      }
    }
    val totalIntervals = spans.map(_.getAs[Long]("n_intervals")).sum
    assert(totalIntervals == Tables.events(spark, sf001).count())
  }

  test("unpivot melts the wide aggregate losslessly (3 measures per group)") {
    val long = AggOps.aggUnpivot(spark, sf001).collect()
    val wide = Tables.lineitem(spark, sf001)
      .groupBy(col("l_returnflag"))
      .agg(sum(Tables.money(col("l_quantity"))).cast("double").as("sum_qty"),
           sum(Tables.money(col("l_extendedprice"))).cast("double").as("sum_price"),
           sum(Tables.money(col("l_discount"))).cast("double").as("sum_disc"))
      .collect()
    assert(long.length == wide.length * 3)
    val byKey = long.map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    wide.foreach { w =>
      val f = w.getString(0)
      assert(byKey((f, "sum_qty")) == w.getAs[Double]("sum_qty"))
      assert(byKey((f, "sum_price")) == w.getAs[Double]("sum_price"))
      assert(byKey((f, "sum_disc")) == w.getAs[Double]("sum_disc"))
    }
  }

  test("session assign: ids are dense per user and break exactly on >30min gaps") {
    val gapUs = 30L * 60L * 1000000L
    val rows = WindowOps.winSessionAssign(spark, sf001).collect()
    assert(rows.length == Tables.events(spark, sf001).count())
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (u, rs) =>
      // collect() preserves the query's (user, ts, event_id) order
      val sess = rs.map(_.getAs[Long]("session_id"))
      assert(sess.head == 1L, s"user $u first session ${sess.head}")
      sess.sliding(2).foreach {
        case Array(a, b) => assert(b == a || b == a + 1,
          s"user $u: session ids skip from $a to $b")
        case _ => ()
      }
      def us(t: java.sql.Timestamp): Long =
        t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L
      rs.sliding(2).foreach {
        case Array(a, b) =>
          val gap = us(b.getAs[java.sql.Timestamp]("ts")) -
                    us(a.getAs[java.sql.Timestamp]("ts"))
          val broke = b.getAs[Long]("session_id") != a.getAs[Long]("session_id")
          assert(broke == (gap > gapUs),
            s"user $u: gap ${gap}us vs break=$broke at $b")
        case _ => ()
      }
    }
  }

  test("hll sketches persist per group and union-merge to a near-exact estimate") {
    // the incremental-analytics shape a 100 TB store needs: one
    // mergeable sketch per source/epoch (bytes, persistable), grand
    // distinct estimated by MERGING sketches — never re-scanning the
    // corpus. DataSketches HLL via Spark 4's native hll_* functions.
    val perSource = Tables.documents(spark, sf01)
      .groupBy(col("source"))
      .agg(hll_sketch_agg(col("text")).as("sk"))
    assert(perSource.count() > 1) // genuinely merging multiple sketches
    val est = perSource
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .head.getLong(0)
    val exact = Tables.documents(spark, sf01).select(col("text")).distinct().count()
    assert(math.abs(est - exact).toDouble / exact < 0.05,
      s"union estimate $est vs exact $exact")
  }

  test("int8 quantization: error bounded by the lattice half-step, scale exact") {
    val rows = LlmOps.simQuantizeInt8(spark, sf001).collect()
    assert(rows.nonEmpty)
    val embs = Tables.embeddings(spark, sf001)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Float]]("embedding")).toMap
    rows.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      val x = embs(id).map(_.toDouble)
      val scale = x.map(math.abs).max / 127.0
      assert(math.abs(r.getAs[Double]("qscale") - scale) < 5e-7, s"scale: $r")
      // each element is off by at most scale/2, so the L2 error is
      // bounded by sqrt(d)*scale/2 over ||x||
      val bound = math.sqrt(x.length) * scale / 2 /
        math.sqrt(x.map(v => v * v).sum)
      val err = r.getAs[Double]("rel_err")
      assert(err >= 0 && err <= bound + 5e-5, s"err $err > bound $bound: $r")
    }
  }

  test("dq rules: one row per rule, rates consistent, clean rules report zero") {
    val rows = EtlOps.etlDqRules(spark, sf001).collect()
    assert(rows.length == 5)
    val byRule = rows.map(r => r.getAs[String]("rule") -> r).toMap
    val n = Tables.lineitem(spark, sf001).count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_checked") == n)
      val v = r.getAs[Long]("n_violations")
      assert(v >= 0 && v <= n)
      assert(math.abs(r.getAs[Double]("violation_rate") - v.toDouble / n) < 5e-5)
    }
    // domain/positivity rules are clean on TPC-H-shaped data; the
    // threshold rules must actually fire (else the op proves nothing)
    assert(byRule("returnflag_domain").getAs[Long]("n_violations") == 0L)
    assert(byRule("positive_price").getAs[Long]("n_violations") == 0L)
    assert(byRule("qty_le_45").getAs[Long]("n_violations") > 0L)
  }

  test("heavy hitters: shares agree with independent counts and all exceed the cut") {
    val rows = CorpusOps.textHeavyHitters(spark, sf001).collect()
    assert(rows.nonEmpty)
    val total = Tables.documents(spark, sf001)
      .select(explode(split(col("text"), " "))).count()
    rows.foreach { r =>
      val share = r.getAs[Long]("n").toDouble / total
      assert(share > 0.033, s"below cut: $r")
      assert(math.abs(r.getAs[Double]("share") - share) < 5e-5, s"share drift: $r")
    }
  }

  test("parquet evolution: old batch null-fills the new column, new batch carries it") {
    val rows = ScanOps.sourceParquetEvolution(spark, sf001).collect()
    assert(rows.length == 2)
    val byBatch = rows.map(r => r.getAs[Long]("batch") -> r).toMap
    assert(byBatch(1L).getAs[Long]("n_with_len") == 0L)
    assert(byBatch(2L).getAs[Long]("n_with_len") == byBatch(2L).getAs[Long]("n_rows"))
    assert(byBatch(2L).getAs[Long]("max_key") == byBatch(1L).getAs[Long]("max_key") + 100)
  }

  test("sorted shards: the range proof passes and the aggregate is complete") {
    // the op itself REQUIREs pairwise non-overlapping shard key ranges;
    // reaching the aggregate means the global order held
    val rows = ScanOps.sinkSortedShards(spark, sf001).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("n_orders")).sum ==
      Tables.orders(spark, sf001).count())
  }

  test("outlier zscore: flags exactly the |z|>3 rows of an independent recomputation") {
    val flagged = EtlOps.etlOutlierZscore(spark, sf001).collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Double]("z")).toMap
    // independent moments: plain double accumulation over the small
    // sf0.001 corpus (exact enough at this size to agree on flags)
    val evs = Tables.events(spark, sf001)
      .select(col("event_id"), col("event_type"), col("value")).collect()
    evs.groupBy(_.getAs[String]("event_type")).foreach { case (_, rs) =>
      val xs = rs.map(_.getAs[Double]("value"))
      val mean = xs.sum / xs.length
      val sd = math.sqrt(xs.map(x => (x - mean) * (x - mean)).sum / (xs.length - 1))
      rs.foreach { r =>
        val z = (r.getAs[Double]("value") - mean) / sd
        val expectFlag = math.abs(z) > 3
        val got = flagged.get(r.getAs[Long]("event_id"))
        if (math.abs(math.abs(z) - 3) > 1e-6) // skip knife-edge rows
          assert(got.isDefined == expectFlag, s"flag mismatch at $r (z=$z)")
        got.foreach(zr => assert(math.abs(zr - z) < 1e-3, s"z drift: $zr vs $z"))
      }
    }
    assert(flagged.nonEmpty)
  }

  test("ngram novelty: ratios in [0,1], unique counts consistent with global dfs") {
    val rows = TextOps.textNgramNovelty(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_grams"); val u = r.getAs[Long]("n_unique")
      val nov = r.getAs[Double]("novelty")
      assert(u >= 0 && u <= n, s"n_unique $u outside [0, $n]: $r")
      assert(nov >= 0.0 && nov <= 1.0, s"novelty $nov outside [0,1]: $r")
      assert(math.abs(nov - u.toDouble / n) < 5e-5, s"rounded ratio drift: $r")
    }
    // cross-check the aggregate against an independent formulation:
    // total unique grams == grams whose distinct-doc count is 1
    val globallyUnique = Tables.documents(spark, sf001)
      .withColumn("words", split(col("text"), " "))
      .where(size(col("words")) >= 3)
      .select(col("doc_id"),
        explode(graft.api.Transforms.shingles(col("words"), 3)).as("shingle"))
      .distinct()
      .groupBy(col("shingle")).agg(countDistinct(col("doc_id")).as("d"))
      .where(col("d") === 1).count()
    assert(rows.map(_.getAs[Long]("n_unique")).sum == globallyUnique)
  }
}
