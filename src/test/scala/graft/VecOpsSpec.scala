package graft

import org.apache.spark.sql.functions._
import graft.ops._

/** Structural + analytical invariants for the round-7 vector-index
  * family (#136–#138) beyond the DuckDB hash sweep: rank-shape
  * checks, the int8 quantization error bound, and cluster-dedup
  * keeper semantics. */
class VecOpsSpec extends SparkSpec {

  test("trained codebook is deterministic, bounded, and code-stable") {
    val emb = Tables.embeddings(spark, sf001)
    // the two independent trainings run CONCURRENTLY (round-19
    // gate-budget pass): determinism is about equal RESULTS, not
    // serial execution, and each training's small iterative jobs left
    // the session mostly idle — 12.7 s serial -> ~7 s, same assertion.
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    def train() = Future {
      org.apache.spark.sql.SparkSession.setActiveSession(spark)
      VecOps.trainedCodebook(emb).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toList))
    }
    val (fa, fb) = (train(), train())
    val (a, b) =
      try (Await.result(fa, Duration.Inf), Await.result(fb, Duration.Inf))
      finally pool.shutdown()
    assert(a.sortBy(t => (t._1, t._2)).toSeq == b.sortBy(t => (t._1, t._2)).toSeq,
      "two trainings diverged")
    assert(a.length <= 8 * 16, "codebook exceeds M*K rows")
    // every surviving code id came from the 16-seed range, every
    // codeword is a full SUBDIM vector on the 1e-10 grid
    a.foreach { case (code, sub, cv) =>
      assert(code >= 0 && code < 16 && sub >= 0 && sub < 8, (code, sub))
      assert(cv.length == 8)
      cv.foreach(x => assert((BigDecimal(x).setScale(10,
        BigDecimal.RoundingMode.HALF_UP).toDouble == x), s"off-grid mean $x"))
    }
  }

  test("sim_ann_pq: 5 ranked neighbours per query, ADC distances non-negative and sorted") {
    val rows = VecOps.simAnnPq(spark, sf001).collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.size == 8, s"expected 8 queries, got ${byQ.size}")
    byQ.foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rnk"))
      assert(sorted.map(_.getAs[Int]("rnk")).toSeq == (1 to 5), s"query $q ranks")
      val dists = sorted.map(_.getAs[Double]("adc_dist"))
      assert(dists.forall(_ >= 0.0), s"query $q negative ADC distance")
      assert(dists.sameElements(dists.sorted), s"query $q ADC order")
      assert(!sorted.exists(_.getAs[Long]("vec_id") == q), s"query $q returned itself")
    }
  }

  test("Lloyd-trained PQ codebook reduces reconstruction error vs the sampled seed") {
    val emb = Tables.embeddings(spark, sf001)
    val seedErr = VecOps.reconstructionError(emb, VecOps.seedCodebook(emb))
    val trainedErr = VecOps.reconstructionError(emb, VecOps.trainedCodebook(emb))
    info(f"PQ reconstruction error: seed=$seedErr%.4f trained=$trainedErr%.4f")
    // Lloyd's objective is monotone non-increasing per step (each
    // reassignment and each mean strictly minimizes the same squared
    // error; the 1e-10 grid rounding perturbs below any meaningful
    // scale), so trained must never be worse than the seed it
    // started from.
    assert(trainedErr <= seedErr + 1e-9,
      f"trained codebook worse than sampled seed: $trainedErr%.6f > $seedErr%.6f")
    // and it should be a real improvement, not a no-op — Lloyd on a
    // 16-seed random sample of this corpus measures ~25% lower error;
    // 5% is the regression floor
    assert(trainedErr <= 0.95 * seedErr,
      f"Lloyd refinement is a no-op: $trainedErr%.6f vs seed $seedErr%.6f")
  }

  test("sim_rerank_quantized: exact scores sorted, approx within the int8 error bound") {
    // |approx - exact| <= (scale_v / 2) * sum_i |q_i|: each component's
    // quantization error is at most scale/2, and the dot against q
    // weights it by |q_i|. Plus 4dp display rounding on both scores.
    val out = VecOps.simRerankQuantized(spark, sf001)
    val emb = Tables.embeddings(spark, sf001)
    val absSum = aggregate(transform(col("embedding"),
      v => abs(v.cast("double"))), lit(0.0), _ + _)
    val scales = emb.select(col("vec_id"),
      (array_max(transform(col("embedding"), v => abs(v.cast("double")))) / 127.0)
        .as("scale"))
    val qabs = emb.select(col("vec_id").as("q_id"), absSum.as("q_abs_sum"))
    val checked = out
      .join(scales, "vec_id")
      .join(qabs, "q_id")
      .select(col("q_id"), col("vec_id"),
        (abs(col("approx_dot") - col("exact_dot")) -
         (col("scale") / 2.0) * col("q_abs_sum") - lit(2e-4)).as("excess"))
      .collect()
    assert(checked.nonEmpty)
    val worst = checked.maxBy(_.getAs[Double]("excess"))
    assert(worst.getAs[Double]("excess") <= 0.0,
      s"quantization error bound violated: $worst")
    // within each query the exact_dot column is non-increasing by rnk
    val rows = out.collect().groupBy(_.getAs[Long]("q_id"))
    rows.foreach { case (q, rs) =>
      val ex = rs.sortBy(_.getAs[Int]("rnk")).map(_.getAs[Double]("exact_dot"))
      assert(ex.zip(ex.tail).forall { case (a, b) => a >= b }, s"query $q rerank order")
    }
  }

  test("dedup_semantic_cluster: one row per vector, bucket minima are keepers") {
    val n = Tables.embeddings(spark, sf001).count()
    val rows = VecOps.dedupSemanticCluster(spark, sf001).collect()
    assert(rows.length == n)
    val k = math.ceil(math.sqrt(n.toDouble)).toLong
    assert(rows.forall { r =>
      val b = r.getAs[Long]("bucket"); b >= 0 && b < k
    })
    // the lowest id in each bucket has no lower-id mate: max_sim null,
    // never flagged
    rows.groupBy(_.getAs[Long]("bucket")).foreach { case (b, rs) =>
      val minRow = rs.minBy(_.getAs[Long]("vec_id"))
      assert(minRow.isNullAt(minRow.fieldIndex("max_sim")), s"bucket $b min has max_sim")
      assert(!minRow.getAs[Boolean]("is_dup"), s"bucket $b min flagged")
    }
    // flag is exactly the thresholded score
    rows.filterNot(_.isNullAt(2)).foreach { r =>
      assert(r.getAs[Boolean]("is_dup") == (r.getAs[Double]("max_sim") >= 0.99))
    }
  }

  test("mmrRerank matches a local greedy MMR reference at picks = 2/3/4") {
    import spark.implicits._
    // deterministic synthetic inputs on the 4dp grid (the helper's
    // contract: rel/sim arrive pre-rounded), sized to force real
    // diversity trade-offs: 3 queries × 6 candidates
    def fp4(x: Double) = math.floor(x * 10000 + 0.5) / 10000.0
    val qids = Seq(1L, 2L, 3L)
    val cands = Seq(10L, 11L, 12L, 13L, 14L, 15L)
    def rel(q: Long, i: Long) = fp4(((q * 37 + i * 101) % 97) / 97.0)
    def sim(q: Long, a: Long, b: Long) = {
      val (x, y) = if (a < b) (a, b) else (b, a)
      fp4(((q * 13 + x * 7 + y * 29) % 89) / 89.0)
    }
    val short = qids.flatMap(q => cands.map(i => (q, i, rel(q, i))))
      .toDF("q_id", "i_id", "rel")
    val psim = qids.flatMap(q =>
        for { a <- cands; b <- cands if a != b } yield (q, a, b, sim(q, a, b)))
      .toDF("q_id", "a", "b", "sim")
    // the straightforward imperative greedy the staged plan must equal
    def localGreedy(q: Long, picks: Int): Seq[(Long, Double)] = {
      var selected = Vector.empty[(Long, Double)]
      var remaining = cands.toSet
      for (_ <- 1 to picks) {
        val scored = remaining.toSeq.map { id =>
          val sc =
            if (selected.isEmpty) fp4(0.7 * rel(q, id))
            else fp4(0.7 * rel(q, id) -
              0.3 * selected.map(s => sim(q, id, s._1)).max)
          (id, sc)
        }
        val best = scored.maxBy { case (id, sc) => (sc, -id) }
        selected :+= best
        remaining -= best._1
      }
      selected
    }
    for (picks <- Seq(2, 3, 4)) {
      val got = VecOps.mmrRerank(short, psim, lambda = 0.7, mu = 0.3, picks)
        .collect()
        .groupBy(_.getAs[Long]("q_id"))
        .map { case (q, rs) =>
          q -> rs.sortBy(_.getAs[Int]("rnk"))
            .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("mmr_score")))
            .toSeq
        }
      qids.foreach { q =>
        assert(got(q) == localGreedy(q, picks),
          s"picks=$picks query $q: staged=${got(q)} local=${localGreedy(q, picks)}")
      }
    }
  }
}
