package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.api.Transforms
import graft.ops.{AggOps, CorpusOps, EtlOps, GraphOps, LlmOps, StreamOps, WindowOps}

/** Empirical scale evidence (SCALE.md's companion): the heaviest
  * operators run on a 1× and a 10× corpus and wall-time must grow
  * near-linearly — ≤ 1.5× the linear expectation — with no plan-shape
  * degradation (no new nested-loop/cartesian, no extra exchanges).
  *
  * The 10× corpus is NOT ten near-copies: replica k shifts every id,
  * ROTATES embedding vectors by k positions (norm-preserving, so
  * hyperplane-LSH buckets decorrelate instead of collapsing onto the
  * originals' buckets) and rotates document word order (so shingle /
  * simhash signatures decorrelate). Near-dup structure per replica
  * therefore matches the 1× corpus — the scaled run measures operator
  * scaling, not a planted 10×-duplicate pathology.
  *
  * Both corpora are written through the same writer (replica 0 only
  * vs replicas 0–9), so file layout is identical and the comparison
  * is apples-to-apples. Env-gated like GRAFT_FULL_TESTS: this is the
  * once-a-round evidence run, not a pre-commit gate. Methodology per
  * SCALE.md: one unmeasured 1× warm-up (JIT/codegen), then best-of-2
  * at 1×, one measured run at 10×; a 0.2 s floor on the 1× time keeps
  * the ratio meaningful where the fixed planning floor dominates. */
class ScaleStressSpec extends SparkSpec {

  private val src = "/root/testdata/sf0.1"
  private val root = s"${System.getProperty("java.io.tmpdir")}/graft_scale_stress"
  private val dir1x = s"$root/x1"
  private val dir10x = s"$root/x10"

  private def gated(): Unit =
    assume(sys.env.get("GRAFT_FULL_TESTS").contains("1"),
      "scale-stress evidence run; enable with GRAFT_FULL_TESTS=1")

  /** Bump whenever [[writeScaled]]'s transform changes: the
    * fingerprint below embeds it, so stale corpora from an older
    * writer are rewritten instead of silently reused. */
  private val WriterVersion = 5 // v5: + customer/supplier replicas (round-16 cohort)

  private val scaledTables =
    Seq("events", "documents", "embeddings", "lineitem", "orders",
        "nation", "region", "customer", "supplier")

  /** Writer-parameters + source fingerprint (ADVICE r10): a reuse
    * decision based only on _SUCCESS markers would let a standalone
    * run of the candidate-count test assert against a corpus written
    * by an older writer or from a regenerated source corpus. */
  private def fingerprint: String = {
    val srcM = scaledTables
      .map(t => new java.io.File(s"$src/$t.parquet").lastModified())
    s"writer=v$WriterVersion;srcMtimes=${srcM.mkString(",")}"
  }

  /** Write the scaled corpora only if a previous run's output isn't
    * already present AND carries the current fingerprint — the
    * candidate-count test can run standalone without paying the
    * corpus write, while the timed test (declared first, so it runs
    * first in a full-suite pass) always rewrites. */
  private def ensureScaled(): Unit = {
    def ok(dir: String) = {
      val fp = new java.io.File(s"$dir/FINGERPRINT")
      scaledTables
        .forall(t => new java.io.File(s"$dir/$t.parquet/_SUCCESS").exists()) &&
      fp.exists() &&
      new String(java.nio.file.Files.readAllBytes(fp.toPath), "UTF-8") == fingerprint
    }
    if (!ok(dir1x)) writeScaledStamped(dir1x, 1)
    if (!ok(dir10x)) writeScaledStamped(dir10x, 10)
  }

  private def writeScaledStamped(dir: String, replicas: Int): Unit = {
    writeScaled(dir, replicas)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/FINGERPRINT"),
      fingerprint.getBytes("UTF-8"))
  }

  /** Replicate a table `replicas`× with deterministic decorrelation. */
  private def writeScaled(dir: String, replicas: Int): Unit = {
    val ks = typedLit((0 until replicas).toArray)
    // events: load through the shared schema-adaptive loader (the
    // corpus has stored ts as ns-long and as µs — Tables.events
    // normalizes both to TimestampType), then shift +k µs per replica;
    // ids and users shift per replica. The replica writes TimestampType
    // parquet, which the loader passes through unchanged.
    Tables.events(spark, src)
      .withColumn("k", explode(ks))
      .select(
        (col("event_id") + col("k") * 100000000L).as("event_id"),
        timestamp_micros(unix_micros(col("ts")) + col("k")).as("ts"),
        (col("user_id") + col("k") * 10000000L).as("user_id"),
        col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // documents: rotate word order by 7k — length-preserving but
    // shingles/simhash/minhash signatures decorrelate across replicas
    writeScaledDocuments(src, dir, replicas)
    // embeddings: rotate the vector by k — norm-preserving, so cosine
    // statistics hold but LSH sign-projections decorrelate
    spark.read.parquet(s"$src/embeddings.parquet")
      .withColumn("k", explode(ks))
      .select(
        (col("vec_id") + col("k") * 10000000L).as("vec_id"),
        when(col("k") === 0, col("embedding"))
          .otherwise(concat(
            slice(col("embedding"), col("k") + 1, size(col("embedding")) - col("k")),
            slice(col("embedding"), lit(1), col("k")))).as("embedding"),
        col("label"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    // lineitem / orders (writer v3, for the round-12 heavy cohort):
    // every key space shifts DISJOINTLY per replica — orderkeys,
    // partkeys, suppkeys, custkeys — so replica k's co-purchase graph,
    // per-customer order history, and price distribution are an exact
    // shifted copy of replica 0's. That makes graph/RFM growth
    // expectations exact (10 disjoint copies ⇒ edges, candidates and
    // per-iteration k-core sizes are exactly 10×), while value
    // distributions (prices, quantities) repeat ×10 — the realistic
    // bigger-warehouse shape for rank/moment operators.
    writeScaledLineitem(src, dir, replicas)
    // fixed-cardinality catalog dims, copied VERBATIM: they are
    // constant-size at every scale factor by the data model, so the
    // scaled corpus carries them unchanged (round 14 — lets dim-join
    // ops like stream_static_enrich run on the scaled dirs)
    Seq("nation", "region").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    Tables.orders(spark, src)
      .withColumn("k", explode(ks))
      .select(
        (col("o_orderkey") + col("k") * 100000000L).as("o_orderkey"),
        (col("o_custkey") + col("k") * 10000000L).as("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // customer / supplier (writer v5, round-16 cohort): key shifts
    // MATCH orders' custkey / lineitem's suppkey shifts so every
    // fact⋈dim join resolves within its replica; nation keys stay
    // verbatim, so the nation-level trade graph is IDENTICAL across
    // replicas (only edge weights grow ×10) — the exact-invariance
    // lever for the BFS / jackknife / pseudonymization pins.
    spark.read.parquet(s"$src/customer.parquet")
      .withColumn("k", explode(ks))
      .select(
        (col("c_custkey") + col("k") * 10000000L).as("c_custkey"),
        col("c_name"), col("c_nationkey"), col("c_acctbal"),
        col("c_mktsegment"))
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    spark.read.parquet(s"$src/supplier.parquet")
      .withColumn("k", explode(ks))
      .select(
        (col("s_suppkey") + col("k") * 1000000L).as("s_suppkey"),
        col("s_name"), col("s_nationkey"), col("s_acctbal"))
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
  }

  /** The lineitem replicator, parameterized by SOURCE dir so the
    * ungated sf0.01 join-family smoke shares the exact writer
    * transform of the gated sf0.1 evidence corpus: every key space
    * shifts DISJOINTLY per replica, so replica k's co-purchase graph
    * is an exact shifted copy of replica 0's. */
  private def writeScaledLineitem(srcDir: String, dir: String,
                                  replicas: Int): Unit = {
    val ks = typedLit((0 until replicas).toArray)
    Tables.lineitem(spark, srcDir)
      .withColumn("k", explode(ks))
      .select(
        (col("l_orderkey") + col("k") * 100000000L).as("l_orderkey"),
        (col("l_partkey") + col("k") * 10000000L).as("l_partkey"),
        (col("l_suppkey") + col("k") * 1000000L).as("l_suppkey"),
        col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"), col("l_returnflag"),
        col("l_linestatus"), col("l_shipdate"))
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
  }

  /** The documents replicator, parameterized by SOURCE dir so the
    * ungated sf0.01 smoke shares the exact writer transform of the
    * gated sf0.1 evidence corpus. */
  private def writeScaledDocuments(srcDir: String, dir: String,
                                   replicas: Int): Unit = {
    val ks = typedLit((0 until replicas).toArray)
    spark.read.parquet(s"$srcDir/documents.parquet")
      .withColumn("k", explode(ks))
      .withColumn("w", split(col("text"), " "))
      .withColumn("pos", pmod(col("k") * 7, greatest(size(col("w")), lit(1))))
      .select(
        (col("doc_id") + col("k") * 10000000L).as("doc_id"),
        when(col("pos") === 0, col("text"))
          .otherwise(concat_ws(" ",
            concat(slice(col("w"), col("pos") + 1, size(col("w")) - col("pos")),
                   slice(col("w"), lit(1), col("pos"))))).as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  private def runOnce(df: => DataFrame): Double = {
    val t0 = System.nanoTime()
    df.write.mode("overwrite").format("noop").save()
    (System.nanoTime() - t0) / 1e9
  }

  /** Operator-name sequence of the physical plan — the shape that
    * must not degrade with scale. */
  private def shape(df: DataFrame): Seq[String] =
    df.queryExecution.executedPlan.toString.linesIterator.map { l =>
      l.dropWhile(c => !c.isLetter).takeWhile(_.isLetterOrDigit)
    }.filter(_.nonEmpty).toSeq

  test("heavy operators scale near-linearly from 1x to 10x with stable plans") {
    gated()
    writeScaledStamped(dir1x, 1)
    writeScaledStamped(dir10x, 10)
    // key-cardinality evidence: the scaled corpus grows the session /
    // dedup KEY space 10×, not just the row count (replica shifts are
    // disjoint) — so per-key work in the default rows stays flat
    val users1 = Tables.events(spark, dir1x).select("user_id").distinct().count()
    val users10 = Tables.events(spark, dir10x).select("user_id").distinct().count()
    assert(users10 == 10 * users1,
      s"scaled corpus must grow user cardinality 10×: $users1 -> $users10")
    // knn measured with a FIXED query set against the scaled index —
    // scaling both sides is O(q·n) by definition (the scale path for
    // that is the IVF, measured below)
    def knnFixedQ(dir: String): DataFrame = Transforms.knnTopK(
      Tables.embeddings(spark, dir1x), Tables.embeddings(spark, dir),
      col("vec_id"), col("embedding"), col("vec_id"), col("embedding"), 5)
    // the IVF scale path: centroid count grows with √n so assignment
    // (n·√n) and probing (n·√n) balance — flat IVF's optimum. Expected
    // growth for a 10× corpus on BOTH sides is therefore 10^1.5 ≈
    // 31.6×, not linear. Measured twice: the Lloyd-refined library
    // operator (annIvfTopK) and the graded #79 query itself (√n
    // hash-sampled centroids since round 7 — before that it bucketed
    // by the fixed label cardinality and measured 22× superlinear).
    def annSqrtN(dir: String): DataFrame = {
      val e = Tables.embeddings(spark, dir)
      val k = math.max(8, math.sqrt(e.count().toDouble).toInt)
      Transforms.annIvfTopK(e, col("vec_id"), col("embedding"),
        numCentroids = k, iters = 1, nprobe = 2, k = 3)
    }
    // sessionization worst case: the DEFAULT scaled corpus already
    // grows user cardinality 10× (writeScaled shifts user_id by k·10⁷
    // — the realistic 100 TB shape: more events ⇒ more users, per-user
    // history ~flat). This variant collapses users back onto the 1×
    // id set, so per-user event history grows 10× instead — the
    // adversarial shape for a per-key session sort.
    def sessionFixedUsers(dir: String): DataFrame =
      Tables.events(spark, dir)
        .withColumn("user_id", pmod(col("user_id"), lit(10000000L)))
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("session_window.start").as("session_start"),
                col("n_events"))
    // range join with the INTERVAL set fixed at 1× and the point side
    // scaled — scaling both sides multiplies time densities and grows
    // true matches ~100× by definition (the same reason knn fixes its
    // query set); this measures the bucketized join itself
    def rangeFixedIntervals(dir: String): DataFrame = {
      val signup = Tables.events(spark, dir1x)
        .where(col("event_type") === "signup")
        .select(col("event_id").as("signup_id"), col("ts").as("s_ts"),
                (col("ts") + expr("INTERVAL 2 HOUR")).as("s_end"))
      val click = Tables.events(spark, dir)
        .where(col("event_type") === "click")
        .select(col("ts").as("c_ts"), col("value"))
      Transforms.rangeJoinBucketed(click, signup,
          col("c_ts"), col("s_ts"), col("s_end"), bucketSeconds = 3600L)
        .groupBy(col("signup_id")).agg(count(lit(1)).as("n_clicks"))
    }
    // (name, op, expected growth factor at 10× data)
    val LIN = 10.0
    val ops: Seq[(String, String => DataFrame, Double)] = Seq(
      ("sim_knn_topk_fixedq", knnFixedQ _, LIN),
      ("sim_ann_ivf_sqrtn", annSqrtN _, 31.6),
      ("sim_ann_ivf_graded", d => LlmOps.simAnnIvf(spark, d), 31.6),
      ("stream_session_window_fixedusers", sessionFixedUsers _, LIN),
      ("dedup_embedding_cosine", d => LlmOps.dedupEmbeddingCosine(spark, d), LIN),
      // round 15: the graded #72/#91 surfaces memoize the shared pair
      // /component prefix per (session, dir) — measure the UNmemoized
      // builders here so the 1×/10× ratio stays real work, not a
      // checkpoint re-read
      ("dedup_simhash_band",
        d => LlmOps.buildVerifiedSimhashPairs(spark, d)
          .orderBy(col("d1"), col("d2")), LIN),
      // round 16: #75's trigram fan-out memoizes per session×corpus —
      // measure the UNmemoized gram builder (linear in corpus chars)
      ("text_language_id_grams",
        d => LlmOps.buildPerDocGram(spark, d)
          .groupBy(col("lang")).agg(count(lit(1)).as("n_grams")), LIN),
      // round 6 (post-repartition-fix): the shingle/md5-heaviest dedup
      ("dedup_minhash_near", d => graft.ops.TextOps.dedupMinhashNear(spark, d), LIN),
      // round 6: gram-volume-linear corpus novelty (distinct + window by gram)
      ("text_ngram_novelty", d => graft.ops.TextOps.textNgramNovelty(spark, d), LIN),
      ("dedup_cluster_components",
        d => Transforms.connectedComponents(
          LlmOps.buildVerifiedSimhashPairs(spark, d)
            .select(col("d1"), col("d2")), maxIters = 64), LIN),
      ("text_pack_sequences", d => LlmOps.textPackSequences(spark, d), LIN),
      ("etl_chunk_batches", d => EtlOps.etlChunkBatches(spark, d), LIN),
      ("stream_session_window", d => StreamOps.streamSessionWindow(spark, d), LIN),
      // round-6 ops: gram-heaviest corpus op, bloom-prefiltered
      // contamination (bench side stays 1×-fixed — the realistic
      // shape: corpus grows, eval suite doesn't), keyless range join
      ("text_repetition_filter",
        d => graft.ops.CorpusOps.textRepetitionFilter(spark, d), LIN),
      ("dedup_bloom_prefilter",
        d => graft.ops.CorpusOps.dedupBloomPrefilter(spark, d), LIN),
      ("join_range_bucketed_fixedi", rangeFixedIntervals _, LIN),
      // round 7: SemDeDup's per-cluster self-join — ⌈√n⌉ clusters of
      // ~√n vectors ⇒ Σ pairs ~ n^1.5, the same flat-IVF optimum as
      // the ANN rows (31.6× at 10×); a regression to corpus-wide
      // pairs would measure ~100×
      ("dedup_semantic_cluster", d => graft.ops.VecOps.dedupSemanticCluster(spark, d), 31.6),
      // round 7: PQ/ADC scan — codebook (128 rows) and query set (8)
      // are fixed, the encoded store scales ⇒ linear
      ("sim_ann_pq", d => graft.ops.VecOps.simAnnPq(spark, d), LIN),
      // round 7: span volume is linear in corpus chars; keyed min_by
      // + join back — the heaviest explode in the corpus family
      ("dedup_sentence_global", d => graft.ops.CorpusOps.dedupSentenceGlobal(spark, d), LIN),
      // round 7: bigram/prefix count tables grow with vocabulary
      // (sublinear), doc scoring is linear in gram volume
      ("text_perplexity_lm", d => graft.ops.CorpusOps.textPerplexityLm(spark, d), LIN),
      // round 7: as-of candidate pairs are per-user clicks×purchases;
      // the default scaled corpus grows USERS 10× with flat per-user
      // history, so the working set is linear (the realistic shape)
      ("events_attribution_lasttouch", d => EtlOps.eventsAttributionLasttouch(spark, d), LIN),
      // round 7: one keyed max_by — the CDC apply must stay a single
      // partial-able aggregate at any log depth
      ("etl_cdc_apply", d => EtlOps.etlCdcApply(spark, d), LIN),
      // round 7: LOCF is one per-user window (O(1) state per row);
      // users grow 10× in the scaled corpus so partitions stay flat
      ("etl_forward_fill", d => EtlOps.etlForwardFill(spark, d), LIN),
      // round 7: the symmetric-state interval join — per-user
      // clicks×purchases candidates bounded by the 1-hour window
      ("stream_join_interval", d => StreamOps.streamJoinInterval(spark, d), LIN),
      // round 9: the events-analytics family — retention is one scan
      // + two high-cardinality shuffles; rolling actives is a
      // bounded 7× fan-out + two-phase distinct (users grow 10× in
      // the scaled corpus, so per-day distinct sets scale linearly);
      // the markov matrix is one per-user window + metadata agg
      ("events_retention_cohort", d => EtlOps.eventsRetentionCohort(spark, d), LIN),
      ("events_rolling_active", d => EtlOps.eventsRollingActive(spark, d), LIN),
      ("events_markov_transitions", d => EtlOps.eventsMarkovTransitions(spark, d), LIN),
      // round 10: perceptual image dedup — decode+hash is linear in
      // docs; the band join's random-collision candidates grow
      // ~n²/2^16 (the documented LSH floor, trivial absolute work at
      // this scale: measured 380k candidate pairs / 75k verified at
      // 10×, vs 10.4k/7.5k at 1× — see the candidate-count test)
      ("multimodal_phash_dedup", d => LlmOps.multimodalPhashDedup(spark, d), LIN))
    val report = new StringBuilder(
      "| op | t_1x (s) | t_10x (s) | ratio | bound |\n|---|---|---|---|---|\n")
    val failures = ops.flatMap { case (name, op, expected) =>
      runOnce(op(dir1x)) // unmeasured warm-up (JIT, codegen, file index)
      val t1 = math.min(runOnce(op(dir1x)), runOnce(op(dir1x)))
      val t10 = math.min(runOnce(op(dir10x)), runOnce(op(dir10x)))
      val bound = 1.5 * expected
      val ratio = t10 / math.max(t1, 0.2)
      report.append(f"| $name | $t1%.2f | $t10%.2f | ${ratio}%.1f× | ≤${bound}%.0f× |\n")
      val s1 = shape(op(dir1x))
      val s10 = shape(op(dir10x))
      val degraded =
        s10.count(_ == "Exchange") > s1.count(_ == "Exchange") ||
        s10.contains("BroadcastNestedLoopJoin") && !s1.contains("BroadcastNestedLoopJoin") ||
        s10.contains("CartesianProduct")
      val shapeNote = if (s1 == s10) None
        else Some(s"$name: plan shape drifted (1x=${s1.mkString(">")} vs 10x=${s10.mkString(">")})")
      Seq(
        if (ratio <= bound) None
        else Some(f"$name: t10=$t10%.2fs vs t1=$t1%.2fs — ${ratio}%.1f× exceeds ${bound}%.0f× (expected ${expected}%.0f× + 50%% tolerance)"),
        if (!degraded) None
        else shapeNote.orElse(Some(s"$name: plan degraded at 10x"))
      ).flatten
    }
    info(report.toString)
    println(s"[scale-stress]\n$report")
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  /** Round 10 (VERDICT r9 item 1): the two scale-watch rows —
    * sim_ann_ivf and dedup_embedding_cosine — get DETERMINISTIC
    * candidate-pair-count evidence beside their wall-clock ratios.
    * Counts are pure functions of corpus content (md5 sampling, fixed
    * LSH seed), immune to host noise: a bucket/band-geometry
    * regression moves the count, jitter never does. Bounds derivation
    * lives in SCALE.md §candidate-counts. */
  test("ANN candidate-pair counts match the documented geometry at 1x and 10x") {
    gated()
    ensureScaled()
    val n1 = Tables.embeddings(spark, dir1x).count()
    val n10 = Tables.embeddings(spark, dir10x).count()
    assert(n10 == 10 * n1, s"scaled embeddings must be 10x: $n1 -> $n10")
    def p15(n: Long) = math.pow(n.toDouble, 1.5)
    val ivf1 = LlmOps.simAnnIvfPairs(spark, dir1x).count()
    val ivf10 = LlmOps.simAnnIvfPairs(spark, dir10x).count()
    val lsh1 = LlmOps.dedupEmbeddingCosineCandidates(spark, dir1x).count()
    val lsh10 = LlmOps.dedupEmbeddingCosineCandidates(spark, dir10x).count()
    val report =
      f"""| op | n_1x=$n1 | n_10x=$n10 | growth |
         ||---|---|---|---|
         || sim_ann_ivf pairs | $ivf1 (${ivf1 / p15(n1)}%.2f·n^1.5) | $ivf10 (${ivf10 / p15(n10)}%.2f·n^1.5) | ${ivf10.toDouble / ivf1}%.1f× |
         || dedup_embedding_cosine cands | $lsh1 | $lsh10 | ${lsh10.toDouble / lsh1}%.1f× |
         |""".stripMargin
    info(report)
    println(s"[candidate-counts]\n$report")
    // IVF: balanced buckets give nprobe·n²/k = 2·n^1.5 pairs; md5
    // hash-sampled centroids leave moderate imbalance, so allow 6×.
    // The failure mode this pins: a regression to corpus-wide pairs
    // (n²/2) measures 11× over the bound at n_1x and 35× at n_10x.
    assert(ivf1 <= 6 * p15(n1), s"ivf pairs at 1x: $ivf1 > 6·n^1.5=${6 * p15(n1)}")
    assert(ivf10 <= 6 * p15(n10), s"ivf pairs at 10x: $ivf10 > 6·n^1.5=${6 * p15(n10)}")
    // growth must track n^1.5 (31.6× at 10×), same 1.5× tolerance as
    // the wall-clock bounds
    assert(ivf10.toDouble / ivf1 <= 1.5 * 31.6,
      s"ivf pair growth ${ivf10.toDouble / ivf1} exceeds 1.5·31.6×")
    // LSH: this corpus plants no near-dups, so candidates are pure
    // random band collisions with floor 32·(n²/2)·p^16 at the
    // documented p ≈ 0.524 (measured 2 015 vs theoretical 2 066 at
    // n=2 000). Two complementary bounds (ADVICE r10):
    //
    // (a) ABSOLUTE ceiling at both scales, 1.5× the theoretical
    //     floor. This is what catches a UNIFORM band-geometry
    //     regression — e.g. one fewer effective bit per band
    //     multiplies the floor by 1/p ≈ 1.9 at BOTH scales, so the
    //     relative projection in (b) would still pass while this
    //     ceiling fails.
    // (b) RELATIVE quadratic projection of the measured 1× rate to
    //     10× with the same 1.5× headroom — catches growth-EXPONENT
    //     regressions (a candidate stage that stops being ~n²
    //     bounded, e.g. signature collapse onto one bucket) even if
    //     the absolute constant drifts with a corpus regeneration.
    def lshFloor(n: Long): Double =
      32.0 * (n.toDouble * (n - 1) / 2) * math.pow(0.524, 16)
    assert(lsh1 <= 1.5 * lshFloor(n1),
      f"lsh candidates at 1x: $lsh1 > 1.5x theoretical floor ${lshFloor(n1)}%.0f " +
        "- band geometry regressed (fewer effective bits per band?)")
    assert(lsh10 <= 1.5 * lshFloor(n10),
      f"lsh candidates at 10x: $lsh10 > 1.5x theoretical floor ${lshFloor(n10)}%.0f")
    val rate1 = lsh1.toDouble / (n1.toDouble * (n1 - 1) / 2)
    val ceil10 = 1.5 * (rate1 * n10.toDouble * (n10 - 1) / 2)
    assert(lsh10 <= ceil10,
      s"lsh candidates at 10x: $lsh10 > quadratic projection $ceil10 of the 1x rate $rate1")
    assert(lsh1 > 0 && lsh10 > 0, "candidate stages must be non-empty")
  }

  // ---- recall helpers (shared by the gated 1×/10× evidence run and
  // ---- the ungated sf0.01 pre-commit slice) -----------------------

  /** IVF (#79 graded geometry): recall of its top-5 for a
    * deterministic 64-query subset vs the brute-force cosine top-5. */
  private def recallIvf(dir: String): Double = {
    import org.apache.spark.sql.graft.TopKAgg
    val emb = Tables.embeddings(spark, dir)
    val qids = emb
      .withColumn("h", md5(concat(col("vec_id").cast("string"), lit("#recall"))))
      .orderBy(col("h"), col("vec_id")).limit(64)
      .select("vec_id").collect().map(_.getLong(0)).toSeq // 64 ids — metadata
    val bf = Transforms.knnTopK(
        emb.where(col("vec_id").isin(qids: _*)), emb,
        col("vec_id"), col("embedding"), col("vec_id"), col("embedding"), 5)
      .select(col("q_id"), col("i_id"))
    val ivf = LlmOps.simAnnIvfPairs(spark, dir)
      .where(col("a_id").isin(qids: _*))
      .groupBy(col("a_id"))
      .agg(TopKAgg.topK(col("cos_sim"), col("b_id"), 5).as("top"))
      .select(col("a_id").as("q_id"), explode(col("top")).as("c"))
      .select(col("q_id"), col("c.id").as("i_id"))
    bf.join(ivf, Seq("q_id", "i_id")).count().toDouble / bf.count()
  }

  /** PQ (#136 graded geometry at 64 queries via
    * [[graft.ops.VecOps.pqTopK]] — round 12 widened the pin from the
    * operator's own 8 queries, whose 40 ground-truth slots let the
    * 10× floor pass by exactly one hit): recall of the ADC top-5 vs
    * the exact squared-L2 top-5 (ADC estimates L2, so L2 is the right
    * ground truth) over ~320 slots. */
  private def recallPq(dir: String): Double = {
    import org.apache.spark.sql.graft.TopKAgg
    val dot = org.apache.spark.sql.graft.VectorExprs.vecDot _
    val emb = Tables.embeddings(spark, dir)
    val q = emb
      .withColumn("h", md5(concat(col("vec_id").cast("string"), lit("#q"))))
      .orderBy(col("h"), col("vec_id")).limit(64)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val exact = emb.select(col("vec_id").as("i_id"), col("embedding").as("iv"))
      .join(broadcast(q), col("q_id") =!= col("i_id"))
      .select(col("q_id"), col("i_id"),
        (dot(col("qv"), col("qv")) - lit(2) * dot(col("qv"), col("iv"))
          + dot(col("iv"), col("iv"))).as("d2"))
      .groupBy(col("q_id"))
      .agg(TopKAgg.topK(-col("d2"), col("i_id"), 5).as("top"))
      .select(col("q_id"), explode(col("top")).as("c"))
      .select(col("q_id"), col("c.id").as("i_id"))
    val pq = graft.ops.VecOps.pqTopK(Tables.embeddings(spark, dir), 64)
      .select(col("q_id"), col("vec_id").as("i_id"))
    exact.join(pq, Seq("q_id", "i_id")).count().toDouble / exact.count()
  }

  private def ivfChanceAt(n: Long) = 2.0 / math.ceil(math.sqrt(n.toDouble))
  private def pqChanceAt(n: Long) = 5.0 / (n - 1)

  /** Round 12 (VERDICT r11 item 5): the UNGATED pre-commit slice of
    * the recall/candidate evidence — the gated 1×/10× run below is
    * once-a-round, so a geometry regression (wrong probe count,
    * collapsed codebook, band-bit loss) used to surface only at
    * round end. This runs the same floors at sf0.01 directly (no
    * scaled-corpus write) in ~15 s. The LSH ceiling allows for the
    * operator's 50 planted twin pairs (the #74 de-vacuation) on top
    * of the random-collision floor 32·(n²/2)·p^16, p ≈ 0.524. */
  test("substring-window fan-out and Adamic-Adar candidate identity at sf0.01 (pre-commit, ungated)") {
    // #217: the window fan-out must obey the exact per-doc stride
    // formula ceil(max(len-29,1)/10) — a stride/width regression (the
    // quadratic risk: denser windows) breaks the upper bound, a
    // vacuous fan-out breaks the lower
    val lens = Tables.documents(spark, sf01)
      .select(length(col("text")).as("len")).collect()
      .map(_.getAs[Int]("len"))
    val bound = lens.map(l => ((math.max(l - 29, 1) - 1) / 10 + 1).toLong).sum
    val wins = CorpusOps.substringWindows(spark, sf01).count()
    assert(wins > 0 && wins <= bound,
      s"window fan-out $wins outside (0, stride bound $bound]")
    assert(wins >= lens.length.toLong, "every doc must contribute a window")
    // #218: candidate pairs == sum over common neighbors of C(deg,2) —
    // the exact cost identity of the BY-COMMON-NEIGHBOR keyed join the
    // scaladoc promises (sum_w deg(w)^2 /2 form); any drift between the
    // candidate stage and the degree table breaks this equality
    val e = GraphOps.copurchaseEdges(spark, sf01).localCheckpoint()
    val cand = GraphOps.adamicAdarCandidates(e).count()
    val degSum = e.select(col("u").as("x"))
      .unionAll(e.select(col("v").as("x")))
      .groupBy(col("x")).agg(count(lit(1)).as("d"))
      .agg((sum(col("d") * (col("d") - 1)) / 2).cast("long").as("s"))
      .collect().head.getAs[Long]("s")
    info(s"sf0.01: $wins windows (bound $bound); AA ${e.count()} edges, $cand candidates = sum C(deg,2) $degSum")
    assert(cand == degSum, s"AA candidates $cand != sum C(deg,2) $degSum")
  }

  test("substring-window fan-out scales linearly 1x to 10x; AA identity holds at sf0.1") {
    gated()
    ensureScaled()
    // documents replicas are LENGTH-preserving word rotations, so the
    // stride fan-out must grow ~10x (within-doc distinctness may vary
    // slightly across rotations); superlinear growth = stride/width
    // regression, sublinear = dropped docs
    val w1 = CorpusOps.substringWindows(spark, dir1x).count()
    val w10 = CorpusOps.substringWindows(spark, dir10x).count()
    val ratio = w10.toDouble / w1
    info(f"substring windows: 1x=$w1 10x=$w10 ratio=$ratio%.2f")
    assert(ratio >= 9.5 && ratio <= 10.5,
      f"window fan-out ratio $ratio%.2f outside [9.5, 10.5]")
    // AA at sf0.1 (facts 10x sf0.01, fixed part catalog): the graph
    // densifies by design — the pin is the cost identity, which holds
    // at every scale, not a growth bound the catalog-bounded graph
    // doesn't obey
    val e = GraphOps.copurchaseEdges(spark, src).localCheckpoint()
    val cand = GraphOps.adamicAdarCandidates(e).count()
    val degSum = e.select(col("u").as("x"))
      .unionAll(e.select(col("v").as("x")))
      .groupBy(col("x")).agg(count(lit(1)).as("d"))
      .agg((sum(col("d") * (col("d") - 1)) / 2).cast("long").as("s"))
      .collect().head.getAs[Long]("s")
    info(s"AA at sf0.1: ${e.count()} edges, $cand candidates")
    assert(cand == degSum, s"AA candidates $cand != sum C(deg,2) $degSum at sf0.1")
  }

  /** Round 13 (VERDICT r12 item 1): the round-12 heavy cohort gets
    * the same 1×/10× wall-clock + plan-shape evidence as the original
    * heavy set, PLUS exact count pins where the disjoint-replica
    * construction makes growth deterministic: replica k's lineitem /
    * orders keys are disjoint shifts of replica 0's, so the
    * co-purchase graph is 10 disconnected copies — k-core peeling
    * decomposes per component and every per-iteration (nodes, edges)
    * row at 10× must be EXACTLY 10× its 1× row, and the Adamic–Adar
    * candidate count exactly 10× (Σ C(deg,2) per copy). */
  test("round-12 heavy cohort scales near-linearly 1x to 10x with stable plans") {
    gated()
    ensureScaled()
    val k1 = GraphOps.graphKcore(spark, dir1x).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    val k10 = GraphOps.graphKcore(spark, dir10x).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    k1.foreach { case (i, (n, e)) =>
      assert(k10(i) == ((10 * n, 10 * e)),
        s"k-core iter $i: 10x ${k10(i)} != 10 * 1x ($n, $e)")
    }
    val c1 = GraphOps.adamicAdarCandidates(
      GraphOps.copurchaseEdges(spark, dir1x).localCheckpoint()).count()
    val c10 = GraphOps.adamicAdarCandidates(
      GraphOps.copurchaseEdges(spark, dir10x).localCheckpoint()).count()
    assert(c10 == 10 * c1, s"AA candidates: 10x $c10 != 10 * 1x $c1")
    info(s"count pins: k-core per-iter sizes and AA candidates ($c1 -> $c10) exactly 10x")
    val LIN = 10.0
    val ops: Seq[(String, String => DataFrame, Double)] = Seq(
      // iterative peel: per-round keyed degree agg + broadcast
      // semi-joins over checkpointed edges — rounds × linear
      ("graph_kcore", d => GraphOps.graphKcore(spark, d), LIN),
      // candidate cost Σ C(deg,2): exactly 10x by construction here
      ("graph_adamic_adar", d => GraphOps.graphAdamicAdar(spark, d), LIN),
      // posting-list equi-join: postings volume linear in corpus
      ("sim_bm25_rank", d => CorpusOps.simBm25Rank(spark, d), LIN),
      // gram tables sublinear (vocab), scoring linear in gram volume
      ("text_kneser_ney_lm", d => CorpusOps.textKneserNeyLm(spark, d), LIN),
      // distributed prefix rank: per-bucket cumsums, linear
      ("agg_winsorized_mean", d => AggOps.aggWinsorizedMean(spark, d), LIN),
      // one moment aggregate over the corpus
      ("agg_corr_matrix", d => AggOps.aggCorrMatrix(spark, d), LIN),
      // three chained customer-scale sketch-ntile passes
      ("agg_rfm_segments", d => AggOps.aggRfmSegments(spark, d), LIN))
    // Ops whose candidate tables are DATA-scale: Spark auto-broadcasts
    // them at 1× and correctly switches to sort-merge once the side
    // outgrows the broadcast threshold at 10× — a size-adaptive
    // strategy shift that ADDS exchanges by design (the behavior a
    // 100 TB run needs), so the exchange-count pin would flag exactly
    // the right plan. For these, only the genuine scale-killers fail
    // the shape check.
    val sizeAdaptiveJoins = Set("graph_adamic_adar")
    val report = new StringBuilder(
      "| op | t_1x (s) | t_10x (s) | ratio | bound |\n|---|---|---|---|---|\n")
    val failures = ops.flatMap { case (name, op, expected) =>
      runOnce(op(dir1x)) // unmeasured warm-up (JIT, codegen, file index)
      val t1 = math.min(runOnce(op(dir1x)), runOnce(op(dir1x)))
      val t10 = math.min(runOnce(op(dir10x)), runOnce(op(dir10x)))
      val bound = 1.5 * expected
      val ratio = t10 / math.max(t1, 0.2)
      report.append(f"| $name | $t1%.2f | $t10%.2f | ${ratio}%.1f× | ≤${bound}%.0f× |\n")
      val s1 = shape(op(dir1x))
      val s10 = shape(op(dir10x))
      val degraded =
        if (sizeAdaptiveJoins(name))
          s10.contains("BroadcastNestedLoopJoin") || s10.contains("CartesianProduct")
        else
          s10.count(_ == "Exchange") > s1.count(_ == "Exchange") ||
          s10.contains("BroadcastNestedLoopJoin") && !s1.contains("BroadcastNestedLoopJoin") ||
          s10.contains("CartesianProduct")
      val shapeNote = if (s1 == s10) None
        else Some(s"$name: plan shape drifted (1x=${s1.mkString(">")} vs 10x=${s10.mkString(">")})")
      Seq(
        if (ratio <= bound) None
        else Some(f"$name: t10=$t10%.2fs vs t1=$t1%.2fs — ${ratio}%.1f× exceeds ${bound}%.0f× (expected ${expected}%.0f× + 50%% tolerance)"),
        if (!degraded) None
        else shapeNote.orElse(Some(s"$name: plan degraded at 10x"))
      ).flatten
    }
    info(report.toString)
    println(s"[scale-stress r12-cohort]\n$report")
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  /** Round 13 (VERDICT r12 item 8): one CHEAP 10× wall-clock smoke in
    * the default suite, so a scale-geometry regression (a quadratic
    * window fan-out, a de-keyed dup-set join) surfaces pre-commit
    * instead of at the once-a-round gated run. Corpus: sf0.01
    * documents ×1 / ×10 through the SAME writer transform as the
    * gated evidence corpus (fingerprint-reused across runs, so the
    * write is paid once per source regeneration). The bound is
    * deliberately loose — 25× vs the linear 10× — because pre-commit
    * timing on a noisy host must only catch GEOMETRY (quadratic =
    * ~100×), never jitter; the tight 1.5×-of-linear bound stays with
    * the gated run. */
  test("10x wall-clock smoke at sf0.01 (pre-commit, ungated): substring-window dedup") {
    val s1 = s"$root/smoke001/x1"
    val s10 = s"$root/smoke001/x10"
    val smokeFp = s"writer=v$WriterVersion;src=${new java.io.File(s"$sf01/documents.parquet").lastModified()}"
    def ok(dir: String) = {
      val fp = new java.io.File(s"$dir/FINGERPRINT")
      new java.io.File(s"$dir/documents.parquet/_SUCCESS").exists() &&
      fp.exists() &&
      new String(java.nio.file.Files.readAllBytes(fp.toPath), "UTF-8") == smokeFp
    }
    Seq(s1 -> 1, s10 -> 10).foreach { case (dir, reps) =>
      if (!ok(dir)) {
        writeScaledDocuments(sf01, dir, reps)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$dir/FINGERPRINT"), smokeFp.getBytes("UTF-8"))
      }
    }
    // deterministic geometry pin: window fan-out must grow ~10×
    val w1 = CorpusOps.substringWindows(spark, s1).count()
    val w10 = CorpusOps.substringWindows(spark, s10).count()
    val wRatio = w10.toDouble / w1
    assert(wRatio >= 9.5 && wRatio <= 10.5,
      f"smoke window fan-out ratio $wRatio%.2f outside [9.5, 10.5]")
    // wall-clock: warm once, best-of-2 each side, floor 0.2 s
    runOnce(CorpusOps.dedupSubstringWindow(spark, s1))
    val t1 = math.min(runOnce(CorpusOps.dedupSubstringWindow(spark, s1)),
                      runOnce(CorpusOps.dedupSubstringWindow(spark, s1)))
    val t10 = math.min(runOnce(CorpusOps.dedupSubstringWindow(spark, s10)),
                       runOnce(CorpusOps.dedupSubstringWindow(spark, s10)))
    val ratio = t10 / math.max(t1, 0.2)
    info(f"smoke: t1=$t1%.2fs t10=$t10%.2fs ratio=$ratio%.1f× (bound 25×)")
    assert(ratio <= 25.0,
      f"substring-window dedup smoke: $ratio%.1f× at 10× data exceeds 25× — geometry regression")
    val (p1, p10) = (shape(CorpusOps.dedupSubstringWindow(spark, s1)),
                     shape(CorpusOps.dedupSubstringWindow(spark, s10)))
    assert(!p10.contains("CartesianProduct") &&
      (p10.count(_ == "Exchange") <= p1.count(_ == "Exchange")),
      s"smoke plan degraded at 10x: ${p10.mkString(">")}")
  }

  /** VERDICT r13 item 6: a SECOND ungated 10× smoke from a different
    * family — the join-family heavy op with by-design Σ deg² candidate
    * cost (#218 Adamic–Adar), so pre-commit scale coverage isn't
    * single-shape. Disjoint per-replica key shifts make the 10×
    * co-purchase graph exactly 10 disconnected copies, so BOTH the
    * edge count and the candidate-pair count must be exactly 10× —
    * a lost support prune or de-keyed common-neighbor join shows as a
    * superlinear candidate ratio long before the (deliberately loose,
    * noise-proof) 25× wall-clock bound trips. */
  test("10x wall-clock smoke at sf0.01 (pre-commit, ungated): Adamic-Adar join fan-out") {
    val s1 = s"$root/smokejoin001/x1"
    val s10 = s"$root/smokejoin001/x10"
    val smokeFp = s"writer=v$WriterVersion;src=${new java.io.File(s"$sf01/lineitem.parquet").lastModified()}"
    def ok(dir: String) = {
      val fp = new java.io.File(s"$dir/FINGERPRINT")
      new java.io.File(s"$dir/lineitem.parquet/_SUCCESS").exists() &&
      fp.exists() &&
      new String(java.nio.file.Files.readAllBytes(fp.toPath), "UTF-8") == smokeFp
    }
    Seq(s1 -> 1, s10 -> 10).foreach { case (dir, reps) =>
      if (!ok(dir)) {
        writeScaledLineitem(sf01, dir, reps)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$dir/FINGERPRINT"), smokeFp.getBytes("UTF-8"))
      }
    }
    // deterministic geometry pins: exactly 10 disjoint graph copies
    val e1 = GraphOps.copurchaseEdges(spark, s1).localCheckpoint()
    val e10 = GraphOps.copurchaseEdges(spark, s10).localCheckpoint()
    val (n1, n10) = (e1.count(), e10.count())
    assert(n1 > 0 && n10 == 10 * n1, s"edge count $n10 != 10× $n1")
    val c1 = GraphOps.adamicAdarCandidates(e1).count()
    val c10 = GraphOps.adamicAdarCandidates(e10).count()
    assert(c10 == 10 * c1,
      s"AA candidates $c10 != 10× $c1 — candidate-geometry regression")
    // wall-clock: warm once, best-of-2 each side, floor 0.2 s; bound
    // deliberately loose (25× vs linear 10×) — pre-commit timing on a
    // noisy host must catch GEOMETRY (quadratic ≈ 100×), never jitter
    runOnce(GraphOps.graphAdamicAdar(spark, s1))
    val t1 = math.min(runOnce(GraphOps.graphAdamicAdar(spark, s1)),
                      runOnce(GraphOps.graphAdamicAdar(spark, s1)))
    val t10 = math.min(runOnce(GraphOps.graphAdamicAdar(spark, s10)),
                       runOnce(GraphOps.graphAdamicAdar(spark, s10)))
    val ratio = t10 / math.max(t1, 0.2)
    info(f"join smoke: t1=$t1%.2fs t10=$t10%.2fs ratio=$ratio%.1f× (bound 25×)")
    assert(ratio <= 25.0,
      f"Adamic-Adar smoke: $ratio%.1f× at 10× data exceeds 25× — geometry regression")
    // plan shape: never a loop join at either scale (exchange counts
    // are exempt — the size-adaptive joins legitimately swap
    // auto-broadcast for sort-merge as the candidate table grows)
    val p10 = shape(GraphOps.graphAdamicAdar(spark, s10))
    assert(!p10.contains("CartesianProduct") &&
      !p10.contains("BroadcastNestedLoopJoin"),
      s"join smoke plan degraded at 10x: ${p10.mkString(">")}")
  }

  /** #241's recall against the same exact-L2 ground truth as #136's —
    * the composed index can only lose candidates the coarse quantizer
    * prunes, so its recall sits between the full-PQ recall and the
    * IVF candidate coverage. */
  private def recallIvfPq(dir: String): Double = {
    import org.apache.spark.sql.graft.TopKAgg
    val dot = org.apache.spark.sql.graft.VectorExprs.vecDot _
    val emb = Tables.embeddings(spark, dir)
    val q = emb
      .withColumn("h", md5(concat(col("vec_id").cast("string"), lit("#q"))))
      .orderBy(col("h"), col("vec_id")).limit(64)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val exact = emb.select(col("vec_id").as("i_id"), col("embedding").as("iv"))
      .join(broadcast(q), col("q_id") =!= col("i_id"))
      .select(col("q_id"), col("i_id"),
        (dot(col("qv"), col("qv")) - lit(2) * dot(col("qv"), col("iv"))
          + dot(col("iv"), col("iv"))).as("d2"))
      .groupBy(col("q_id"))
      .agg(TopKAgg.topK(-col("d2"), col("i_id"), 5).as("top"))
      .select(col("q_id"), explode(col("top")).as("c"))
      .select(col("q_id"), col("c.id").as("i_id"))
    val got = graft.ops.VecOps.ivfPqTopK(spark, dir, 64)
      .select(col("q_id"), col("vec_id").as("i_id"))
    exact.join(got, Seq("q_id", "i_id")).count().toDouble / exact.count()
  }

  test("ANN recall + LSH candidate floors at sf0.01 (pre-commit, ungated)") {
    val n = Tables.embeddings(spark, sf01).count()
    val ivfLift = recallIvf(sf01) / ivfChanceAt(n)
    val pqLift = recallPq(sf01) / pqChanceAt(n)
    val ivfpqLift = recallIvfPq(sf01) / pqChanceAt(n)
    info(f"sf0.01 lifts: IVF $ivfLift%.1f× chance, PQ $pqLift%.1f× chance, " +
      f"IVF-PQ $ivfpqLift%.1f× chance")
    assert(ivfLift >= 2.0, f"IVF recall lift at sf0.01: $ivfLift%.1f < 2× chance")
    assert(pqLift >= 10.0, f"PQ recall lift at sf0.01: $pqLift%.1f < 10× chance")
    // composed: PQ quantization × coarse pruning — floor set from the
    // measured value minus a regeneration margin (a collapsed bucket
    // or codebook reads ~1×)
    assert(ivfpqLift >= 5.0,
      f"IVF-PQ recall lift at sf0.01: $ivfpqLift%.1f < 5× chance")
    val lsh = LlmOps.dedupEmbeddingCosineCandidates(spark, sf01).count()
    val floor = 32.0 * (n.toDouble * (n - 1) / 2) * math.pow(0.524, 16) + 50
    assert(lsh > 0 && lsh <= 1.5 * floor,
      f"LSH candidates at sf0.01: $lsh outside (0, 1.5×floor=${1.5 * floor}%.0f]")
  }

  /** Round 11 (VERDICT r10 item 6): the ANN rows pin candidate counts
    * and wall-clock; this pins what those buy — measured recall@5
    * against exact ground truth, deterministic on both sides (the
    * approximate index and the brute-force scan are both exact
    * functions of the corpus). The floors are REGRESSION pins set
    * from the measured values minus a corpus-regeneration margin,
    * not quality claims: IVF probes 2 of ⌈√n⌉ buckets and PQ
    * quantizes to 16 codewords per 8-dim subspace, so neither is
    * expected near 1.0 on this corpus — what must not happen is a
    * silent geometry change (wrong probe count, collapsed codebook)
    * dropping recall to near-random while counts and time stay
    * plausible. */
  test("ANN recall@5 vs exact ground truth holds at 1x and 10x") {
    gated()
    ensureScaled()

    val (n1, n10) = (Tables.embeddings(spark, dir1x).count(),
                     Tables.embeddings(spark, dir10x).count())
    val (ivf1, ivf10) = (recallIvf(dir1x), recallIvf(dir10x))
    val (pq1, pq10) = (recallPq(dir1x), recallPq(dir10x))
    // This corpus is near-random in embedding space (max pairwise
    // cosine ≈ 0.51): true neighbours are barely separated from the
    // bulk, so ABSOLUTE recall is inherently low for any sublinear
    // index and would be a corpus statistic, not an operator pin. The
    // scale-invariant pin is recall LIFT over the chance baseline of
    // an index with the same candidate budget:
    //   IVF: probing nprobe of ⌈√n⌉ buckets examines ≈ nprobe/⌈√n⌉ of
    //        the corpus, so random bucketing recalls that fraction.
    //   PQ:  ADC ranks ALL n candidates; chance top-5 recall of a
    //        non-informative ranking is 5/(n-1).
    // A collapsed geometry (wrong probe count, degenerate codebook)
    // drops lift to ~1 regardless of host or corpus regeneration.
    val lifts = Seq(ivf1 / ivfChanceAt(n1), ivf10 / ivfChanceAt(n10),
                    pq1 / pqChanceAt(n1), pq10 / pqChanceAt(n10))
    val report =
      f"""| index | recall@5 at 1x (lift) | recall@5 at 10x (lift) | lift floor |
         ||---|---|---|---|
         || sim_ann_ivf (nprobe=2 of sqrt-n) | $ivf1%.3f (${lifts(0)}%.1f×) | $ivf10%.3f (${lifts(1)}%.1f×) | 2× chance |
         || sim_ann_pq (M=8, K=16 Lloyd ADC) | $pq1%.3f (${lifts(2)}%.1f×) | $pq10%.3f (${lifts(3)}%.1f×) | 10× chance |
         |""".stripMargin
    info(report)
    println(s"[ann-recall]\n$report")
    // measured round 12 at 64 queries: IVF 3.2× / 6.7× chance, PQ
    // 55× / 275× chance (≈44 / 22 hits of ~320 slots — the round-11
    // 8-query pin rested on ONE hit) — floors sit well under measured
    // but far above a collapsed index
    assert(lifts(0) >= 2.0 && lifts(1) >= 2.0,
      f"IVF recall lift regressed toward chance: 1x=${lifts(0)}%.1f 10x=${lifts(1)}%.1f < 2")
    assert(lifts(2) >= 10.0 && lifts(3) >= 10.0,
      f"PQ recall lift regressed toward chance: 1x=${lifts(2)}%.1f 10x=${lifts(3)}%.1f < 10")
  }

  /** Round 13: the #229–#235 cohort's 1×→10× evidence. The replica
    * construction gives EXACT expectations for five of the seven:
    * values repeat ×10 (Spearman ρ is affine-rank-invariant, histogram
    * shares and CCF are scale-invariant), user/graph copies are
    * disjoint (per-campaign attribution and the Jaccard score multiset
    * are exactly ×10). ANOVA/KW arms re-hash on the shifted user ids,
    * so only their totals pin. Timing rows use the r12-cohort bound
    * (1.5× of linear); Jaccard inherits Adamic–Adar's size-adaptive
    * join exemption (its candidate tables are data-scale, so the 1×
    * auto-broadcasts correctly become sort-merge at 10×). */
  test("round-13 cohort scales 1x to 10x with deterministic invariants and stable plans") {
    gated()
    ensureScaled()

    // Spearman: ranks transform affinely (2r' = 10(2r−1)+1) under the
    // ×10 value repetition, so ρ is EXACTLY invariant
    val sp1 = AggOps.aggSpearmanCorr(spark, dir1x).collect().head
    val sp10 = AggOps.aggSpearmanCorr(spark, dir10x).collect().head
    assert(sp10.getAs[Long]("n_rows") == 10 * sp1.getAs[Long]("n_rows"))
    assert(sp10.getAs[Boolean]("rank_sum_ok_x") && sp10.getAs[Boolean]("rank_sum_ok_y"))
    assert(math.abs(sp10.getAs[Double]("spearman_rho") -
      sp1.getAs[Double]("spearman_rho")) <= 2e-6,
      s"Spearman rho must be invariant: 1x=$sp1 10x=$sp10")

    // position attribution: disjoint user copies with identical
    // histories ⇒ every per-campaign row exactly ×10
    def attrRows(d: String) = EtlOps.eventsAttributionPosition(spark, d)
      .collect().map(r => r.getAs[Int]("campaign") -> r).toMap
    val (at1, at10) = (attrRows(dir1x), attrRows(dir10x))
    assert(at10.keySet == at1.keySet)
    at1.foreach { case (c, r1) =>
      val r10 = at10(c)
      assert(r10.getAs[Long]("n_conversions") == 10 * r1.getAs[Long]("n_conversions"), s"campaign $c")
      assert(r10.getAs[Long]("n_touches") == 10 * r1.getAs[Long]("n_touches"), s"campaign $c")
      assert(math.abs(r10.getAs[Double]("total_credit") -
        10 * r1.getAs[Double]("total_credit")) < 1e-5, s"campaign $c")
      assert(math.abs(r10.getAs[Double]("credited_revenue") -
        10 * r1.getAs[Double]("credited_revenue")) < 1e-3, s"campaign $c")
    }

    // Jaccard: 10 disjoint graph copies ⇒ the 10× top-20 score list is
    // the 1× score list with each entry repeated 10 times, truncated
    val j1 = GraphOps.graphJaccardLinks(spark, dir1x).collect().map(_.getAs[Double]("jaccard"))
    val j10 = GraphOps.graphJaccardLinks(spark, dir10x).collect().map(_.getAs[Double]("jaccard"))
    val expected = j1.flatMap(s => Seq.fill(10)(s)).take(20).toSeq
    assert(j10.toSeq == expected,
      s"Jaccard 10x scores ${j10.toSeq} != expanded 1x scores $expected")

    // histogram: per-bin counts exactly ×10, shares invariant
    def histRows(d: String) = AggOps.aggHistogramNumeric(spark, d)
      .collect().map(r => r.getAs[Long]("bin") -> r).toMap
    val (h1, h10) = (histRows(dir1x), histRows(dir10x))
    assert(h10.keySet == h1.keySet)
    h1.foreach { case (b, r1) =>
      assert(h10(b).getAs[Long]("n_orders") == 10 * r1.getAs[Long]("n_orders"), s"bin $b")
      assert(math.abs(h10(b).getAs[Double]("share") - r1.getAs[Double]("share")) <= 1e-6, s"bin $b")
    }

    // CCF: both centered series scale ×10 (µs shifts never cross a day
    // boundary), so every lag's correlation is invariant to 4dp
    def ccfRows(d: String) = EtlOps.tsCrossCorrelation(spark, d)
      .collect().map(r => r.getAs[Int]("lag") -> r).toMap
    val (cc1, cc10) = (ccfRows(dir1x), ccfRows(dir10x))
    (-3 to 3).foreach { k =>
      assert(cc10(k).getAs[Long]("n_days") == cc1(k).getAs[Long]("n_days"), s"lag $k")
      assert(cc10(k).getAs[Long]("n_pairs") == cc1(k).getAs[Long]("n_pairs"), s"lag $k")
      assert(math.abs(cc10(k).getAs[Double]("ccf") - cc1(k).getAs[Double]("ccf")) <= 2e-4,
        s"lag $k: ccf drifted ${cc1(k)} -> ${cc10(k)}")
    }

    // ANOVA / KW arms re-randomize on shifted user ids: pin the totals
    // and that the statistics stay well-formed
    val an1 = AggOps.aggAnovaF(spark, dir1x).collect().head
    val an10 = AggOps.aggAnovaF(spark, dir10x).collect().head
    def tot(r: org.apache.spark.sql.Row) =
      r.getAs[Long]("n_a") + r.getAs[Long]("n_b") + r.getAs[Long]("n_c")
    assert(tot(an10) == 10 * tot(an1))
    assert(an10.getAs[Double]("f_stat") >= 0.0)
    val kw1 = AggOps.aggKruskalWallis(spark, dir1x).collect().head
    val kw10 = AggOps.aggKruskalWallis(spark, dir10x).collect().head
    assert(tot(kw10) == 10 * tot(kw1))
    assert(kw10.getAs[Double]("h_tie_corrected") >= 0.0)

    // timing + plan-shape rows (r12-cohort machinery)
    val LIN = 10.0
    val ops: Seq[(String, String => DataFrame, Double)] = Seq(
      ("agg_anova_f", d => AggOps.aggAnovaF(spark, d), LIN),
      ("agg_kruskal_wallis", d => AggOps.aggKruskalWallis(spark, d), LIN),
      ("agg_spearman_corr", d => AggOps.aggSpearmanCorr(spark, d), LIN),
      // Jaccard's 1× baseline auto-broadcasts the data-scale
      // candidate/edge joins that 10× correctly runs as sort-merge, so
      // its wall-clock ratio structurally exceeds linear (measured
      // 8–17× across runs); the bound is set to catch GEOMETRY — a
      // broken support-prune reads ~100× (Σ deg² per extra neighbor)
      ("graph_jaccard_links", d => GraphOps.graphJaccardLinks(spark, d), LIN * 5.0 / 3),
      ("agg_histogram_numeric", d => AggOps.aggHistogramNumeric(spark, d), LIN),
      ("ts_cross_correlation", d => EtlOps.tsCrossCorrelation(spark, d), LIN),
      ("events_attribution_position", d => EtlOps.eventsAttributionPosition(spark, d), LIN))
    // ops whose 1×-broadcastable join sides are DATA-scale: the 10×
    // broadcast→sort-merge shift is the behavior a 100 TB run needs
    // (Spearman: the extendedprice rank table estimate grows with the
    // corpus even though its distinct size is replica-invariant)
    val sizeAdaptiveJoins = Set("graph_jaccard_links", "agg_spearman_corr")
    val report = new StringBuilder(
      "| op | t_1x (s) | t_10x (s) | ratio | bound |\n|---|---|---|---|---|\n")
    val failures = ops.flatMap { case (name, op, expectedRatio) =>
      runOnce(op(dir1x)) // unmeasured warm-up
      val t1 = math.min(runOnce(op(dir1x)), runOnce(op(dir1x)))
      val t10 = math.min(runOnce(op(dir10x)), runOnce(op(dir10x)))
      val bound = 1.5 * expectedRatio
      val ratio = t10 / math.max(t1, 0.2)
      report.append(f"| $name | $t1%.2f | $t10%.2f | ${ratio}%.1f× | ≤${bound}%.0f× |\n")
      val s1 = shape(op(dir1x))
      val s10 = shape(op(dir10x))
      val degraded =
        if (sizeAdaptiveJoins(name))
          s10.contains("BroadcastNestedLoopJoin") || s10.contains("CartesianProduct")
        else
          s10.count(_ == "Exchange") > s1.count(_ == "Exchange") ||
          s10.contains("BroadcastNestedLoopJoin") && !s1.contains("BroadcastNestedLoopJoin") ||
          s10.contains("CartesianProduct")
      Seq(
        if (ratio <= bound) None
        else Some(f"$name: t10=$t10%.2fs vs t1=$t1%.2fs — ${ratio}%.1f× exceeds ${bound}%.0f×"),
        if (!degraded) None
        else Some(s"$name: plan degraded at 10x (1x=${s1.mkString(">")} vs 10x=${s10.mkString(">")})")
      ).flatten
    }
    info(report.toString)
    println(s"[scale-stress r13-cohort]\n$report")
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  /** Round 13 batch 2 (#236–#240): the construction again gives exact
    * expectations — order values repeat ×10 so every χ² cell scales
    * ×10 and Cramér's V is EXACTLY invariant; both daily series scale
    * ×10 so every rolling-window correlation is invariant; event
    * types are replica-invariant so the BH family size m is pinned;
    * user copies are disjoint so user/converter TOTALS are exactly
    * ×10 (arms re-hash on shifted ids, so per-arm splits don't pin). */
  test("round-13 batch-2 invariants and timing hold 1x to 10x") {
    gated()
    ensureScaled()

    // Cramér's V invariance (χ² scales ×10 up to the 8dp cell grid)
    val v1 = AggOps.aggCramersV(spark, dir1x).collect().head
    val v10 = AggOps.aggCramersV(spark, dir10x).collect().head
    assert(v10.getAs[Long]("n_orders") == 10 * v1.getAs[Long]("n_orders"))
    assert(v10.getAs[Long]("n_rows") == v1.getAs[Long]("n_rows") &&
           v10.getAs[Long]("n_cols") == v1.getAs[Long]("n_cols"))
    assert(math.abs(v10.getAs[Double]("chi2") - 10 * v1.getAs[Double]("chi2"))
      <= 1e-6 * math.max(1.0, 10 * v1.getAs[Double]("chi2")),
      s"chi2 must scale x10: 1x=$v1 10x=$v10")
    assert(math.abs(v10.getAs[Double]("cramers_v") - v1.getAs[Double]("cramers_v"))
      <= 2e-6, s"V must be invariant: 1x=$v1 10x=$v10")

    // rolling correlation invariance per day row
    def corrRows(d: String) = EtlOps.tsRollingCorr(spark, d).collect()
      .map(r => r.getAs[java.sql.Timestamp]("day") -> r.getAs[Double]("corr14"))
    val (rc1, rc10) = (corrRows(dir1x), corrRows(dir10x))
    assert(rc10.map(_._1).toSeq == rc1.map(_._1).toSeq)
    rc1.zip(rc10).foreach { case ((d, c1), (_, c10)) =>
      assert(math.abs(c10 - c1) <= 2e-4, s"day $d: corr drifted $c1 -> $c10")
    }

    // BH family size pinned; per-type populations exactly ×10
    def fdrRows(d: String) = EtlOps.eventsFdrBh(spark, d).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val (f1, f10) = (fdrRows(dir1x), fdrRows(dir10x))
    assert(f10.keySet == f1.keySet)
    f1.foreach { case (t, r1) =>
      assert(f10(t).getAs[Long]("n_a") + f10(t).getAs[Long]("n_b") ==
        10 * (r1.getAs[Long]("n_a") + r1.getAs[Long]("n_b")), s"type $t")
      assert(f10(t).getAs[Long]("m_tests") == r1.getAs[Long]("m_tests"), s"type $t")
    }

    // Bayes: user and converter totals exactly ×10
    val b1 = EtlOps.eventsBayesAb(spark, dir1x).collect().head
    val b10 = EtlOps.eventsBayesAb(spark, dir10x).collect().head
    assert(b10.getAs[Long]("n_a") + b10.getAs[Long]("n_b") ==
      10 * (b1.getAs[Long]("n_a") + b1.getAs[Long]("n_b")))
    assert(b10.getAs[Long]("c_a") + b10.getAs[Long]("c_b") ==
      10 * (b1.getAs[Long]("c_a") + b1.getAs[Long]("c_b")))

    // timing + shape rows (r13-cohort machinery)
    val LIN = 10.0
    val ops: Seq[(String, String => DataFrame, Double)] = Seq(
      ("events_fdr_bh", d => EtlOps.eventsFdrBh(spark, d), LIN),
      ("events_bayes_ab", d => EtlOps.eventsBayesAb(spark, d), LIN),
      ("ts_rolling_corr", d => EtlOps.tsRollingCorr(spark, d), LIN),
      ("events_uplift_deciles", d => EtlOps.eventsUpliftDeciles(spark, d), LIN),
      ("agg_cramers_v", d => AggOps.aggCramersV(spark, d), LIN))
    val report = new StringBuilder(
      "| op | t_1x (s) | t_10x (s) | ratio | bound |\n|---|---|---|---|---|\n")
    val failures = ops.flatMap { case (name, op, expectedRatio) =>
      runOnce(op(dir1x)) // unmeasured warm-up
      val t1 = math.min(runOnce(op(dir1x)), runOnce(op(dir1x)))
      val t10 = math.min(runOnce(op(dir10x)), runOnce(op(dir10x)))
      val bound = 1.5 * expectedRatio
      val ratio = t10 / math.max(t1, 0.2)
      report.append(f"| $name | $t1%.2f | $t10%.2f | ${ratio}%.1f× | ≤${bound}%.0f× |\n")
      val s1 = shape(op(dir1x))
      val s10 = shape(op(dir10x))
      val degraded =
        s10.count(_ == "Exchange") > s1.count(_ == "Exchange") ||
        s10.contains("BroadcastNestedLoopJoin") && !s1.contains("BroadcastNestedLoopJoin") ||
        s10.contains("CartesianProduct")
      Seq(
        if (ratio <= bound) None
        else Some(f"$name: t10=$t10%.2fs vs t1=$t1%.2fs — ${ratio}%.1f× exceeds ${bound}%.0f×"),
        if (!degraded) None
        else Some(s"$name: plan degraded at 10x (1x=${s1.mkString(">")} vs 10x=${s10.mkString(">")})")
      ).flatten
    }
    info(report.toString)
    println(s"[scale-stress r13-batch2]\n$report")
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  /** Round 13 batches 3–4 (#241–#245): exact expectations from the
    * replica construction once more — order/document values repeat
    * ×10 (PSI and log2-histogram shares invariant, per-bin counts
    * exactly ×10; channel-histogram pixel counts exactly ×10 with
    * invariant shares), and user copies are disjoint with identical
    * histories and +k µs shifts (each 1-day window's per-user spends
    * repeat ×10, ties break toward the smallest id = the k=0 replica,
    * so the windowed TOP-3 ROWS ARE IDENTICAL at 10×). IVF-PQ's
    * geometry is pinned through its components (#79 candidate count,
    * PQ codebook) — here it gets a wall-clock row with the
    * size-adaptive exemption (its bucket join is data-scale, like
    * Jaccard's). */
  test("round-13 batch-3/4 invariants and timing hold 1x to 10x") {
    gated()
    ensureScaled()

    // PSI: every bin count ×10 in both periods ⇒ smoothed shares move
    // only by the Laplace +1 term (negligible at these counts) ⇒ PSI
    // equal to well under one display grid
    val p1 = EtlOps.etlPsiDrift(spark, dir1x).collect()
      .map(r => r.getAs[Long]("bin") -> r).toMap
    val p10 = EtlOps.etlPsiDrift(spark, dir10x).collect()
      .map(r => r.getAs[Long]("bin") -> r).toMap
    assert(p10.keySet == p1.keySet)
    p1.foreach { case (b, r1) =>
      assert(p10(b).getAs[Long]("n_pre") == 10 * r1.getAs[Long]("n_pre"), s"bin $b")
      assert(p10(b).getAs[Long]("n_post") == 10 * r1.getAs[Long]("n_post"), s"bin $b")
      assert(math.abs(p10(b).getAs[Double]("share_pre") -
        r1.getAs[Double]("share_pre")) <= 1e-4, s"bin $b")
    }
    val psiPair = (p1.values.head.getAs[Double]("psi"),
                   p10.values.head.getAs[Double]("psi"))
    assert(math.abs(psiPair._2 - psiPair._1) <= 1e-4,
      s"PSI must be scale-invariant: $psiPair")

    // log2 histogram: counts exactly ×10, shares invariant
    val l1 = AggOps.aggLog2Histogram(spark, dir1x).collect()
      .map(r => r.getAs[Long]("bin2") -> r).toMap
    val l10 = AggOps.aggLog2Histogram(spark, dir10x).collect()
      .map(r => r.getAs[Long]("bin2") -> r).toMap
    assert(l10.keySet == l1.keySet)
    l1.foreach { case (b, r1) =>
      assert(l10(b).getAs[Long]("n_orders") == 10 * r1.getAs[Long]("n_orders"), s"bin $b")
      assert(math.abs(l10(b).getAs[Double]("share") -
        r1.getAs[Double]("share")) <= 1e-6, s"bin $b")
    }

    // channel histogram: documents replicate length-preserving with
    // shifted ids, so pixel populations per (channel, bucket) need
    // not pin exactly (dims derive from doc_id) — pin the structure:
    // totals equal 3× the summed raster sizes and shares sum to 1
    val ch10 = graft.ops.LlmOps.multimodalChannelHistogram(spark, dir10x).collect()
    val px10 = Tables.documents(spark, dir10x).select(col("doc_id")).collect()
      .map { r =>
        val (w, h) = graft.multimodal.BinaryDecode.syntheticDims(r.getAs[Long](0))
        w.toLong * h
      }.sum
    (0 to 2).foreach { c =>
      val chan = ch10.filter(_.getAs[Int]("channel") == c)
      assert(chan.map(_.getAs[Long]("n_px")).sum == px10, s"channel $c at 10x")
      assert(math.abs(chan.map(_.getAs[Double]("share")).sum - 1.0) < 1e-5)
    }

    // windowed top-k: each 1× (user, spend) repeats as 10 id-shifted
    // copies with IDENTICAL spend, so per window (a) the rank-1 row is
    // IDENTICAL at 10× (the k=0 copy has the smallest id among the
    // tied copies) and (b) the 10× top-3 spend list is the 1× ranked
    // spend list with each entry repeated 10×, truncated
    def topkRows(d: String) = StreamOps.streamTopkWindowed(spark, d).collect()
      .map(r => (r.getTimestamp(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    val (t1, t10) = (topkRows(dir1x), topkRows(dir10x))
    val (g1, g10) = (t1.groupBy(_._1), t10.groupBy(_._1))
    assert(g10.keySet == g1.keySet)
    g1.foreach { case (w, rows1raw) =>
      val rows1 = rows1raw.sortBy(_._2)
      val rows10 = g10(w).sortBy(_._2)
      assert(rows10.head == rows1.head, s"window $w rank-1 row drifted")
      val expSpend = rows1.map(_._4).flatMap(s => Seq.fill(10)(s))
        .take(rows10.length)
      assert(rows10.map(_._4) == expSpend, s"window $w spend list")
    }

    // timing + shape rows
    val LIN = 10.0
    val ops: Seq[(String, String => DataFrame, Double)] = Seq(
      // size-adaptive like Jaccard: 1× auto-broadcasts the bucket/enc
      // joins that 10× correctly runs keyed
      ("sim_ann_ivfpq", d => graft.ops.VecOps.simAnnIvfPq(spark, d), LIN * 5.0 / 3),
      ("etl_psi_drift", d => EtlOps.etlPsiDrift(spark, d), LIN),
      ("agg_log2_histogram", d => AggOps.aggLog2Histogram(spark, d), LIN),
      ("multimodal_channel_histogram",
        d => graft.ops.LlmOps.multimodalChannelHistogram(spark, d), LIN),
      ("stream_topk_windowed", d => StreamOps.streamTopkWindowed(spark, d), LIN))
    val sizeAdaptiveJoins = Set("sim_ann_ivfpq")
    val report = new StringBuilder(
      "| op | t_1x (s) | t_10x (s) | ratio | bound |\n|---|---|---|---|---|\n")
    val failures = ops.flatMap { case (name, op, expectedRatio) =>
      runOnce(op(dir1x)) // unmeasured warm-up
      val t1s = math.min(runOnce(op(dir1x)), runOnce(op(dir1x)))
      val t10s = math.min(runOnce(op(dir10x)), runOnce(op(dir10x)))
      val bound = 1.5 * expectedRatio
      val ratio = t10s / math.max(t1s, 0.2)
      report.append(f"| $name | $t1s%.2f | $t10s%.2f | ${ratio}%.1f× | ≤${bound}%.0f× |\n")
      val s1 = shape(op(dir1x))
      val s10 = shape(op(dir10x))
      val degraded =
        if (sizeAdaptiveJoins(name))
          // the IVF scoring scan is an INTENTIONAL broadcast nested
          // loop at both scales — only a NEW loop join is a killer
          s10.contains("BroadcastNestedLoopJoin") && !s1.contains("BroadcastNestedLoopJoin") ||
          s10.contains("CartesianProduct")
        else
          s10.count(_ == "Exchange") > s1.count(_ == "Exchange") ||
          s10.contains("BroadcastNestedLoopJoin") && !s1.contains("BroadcastNestedLoopJoin") ||
          s10.contains("CartesianProduct")
      Seq(
        if (ratio <= bound) None
        else Some(f"$name: t10=$t10s%.2fs vs t1=$t1s%.2fs — ${ratio}%.1f× exceeds ${bound}%.0f×"),
        if (!degraded) None
        else Some(s"$name: plan degraded at 10x (1x=${s1.mkString(">")} vs 10x=${s10.mkString(">")})")
      ).flatten
    }
    info(report.toString)
    println(s"[scale-stress r13-batch34]\n$report")
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  /** Round 13 batch 5 (#246–#247): strata derive from pre-period
    * counts (replica-invariant), so each CEM stratum's TOTAL
    * population is exactly ×10 — but arms re-hash on the shifted user
    * ids (the #229/#230 caveat), so per-arm splits and the ATT value
    * re-randomize and only totals pin. The ×10-repeated customer
    * spends make every Pareto cut exact (n and kₚ both ×10, the
    * top-kₚ multiset is 10 copies of the 1× one, shares invariant). */
  test("round-13 batch-5 invariants hold 1x to 10x") {
    gated()
    ensureScaled()
    def cemRows(d: String) = EtlOps.eventsCemAtt(spark, d).collect()
      .map(r => r.getAs[Long]("stratum") -> r).toMap
    val (c1, c10) = (cemRows(dir1x), cemRows(dir10x))
    assert(c10.keySet == c1.keySet)
    c1.foreach { case (s, r1) =>
      assert(c10(s).getAs[Long]("n_t") + c10(s).getAs[Long]("n_c") ==
        10 * (r1.getAs[Long]("n_t") + r1.getAs[Long]("n_c")), s"stratum $s")
    }
    // arms are balanced hash splits, so the 10× ATT must stay inside
    // the same null-noise envelope as the 1× reading (order of the
    // per-user outcome scale), not at some unrelated magnitude
    val attScale = c1.values.head.getAs[Double]("mean_t").abs +
      c1.values.head.getAs[Double]("mean_c").abs + 1.0
    assert(c10.values.head.getAs[Double]("att").abs <= attScale,
      s"10x ATT out of the null envelope: ${c10.values.head}")
    def paretoRows(d: String) = AggOps.aggParetoShare(spark, d).collect()
      .map(r => r.getAs[Int]("pct") -> r).toMap
    val (pa1, pa10) = (paretoRows(dir1x), paretoRows(dir10x))
    // the 10× sorted spend multiset is each 1× spend repeated 10
    // times, but ⌈p·10n/100⌉ ≠ 10⌈p·n/100⌉ when p·n/100 isn't
    // integral — so the EXACT expectation takes ⌊k₁₀/10⌋ full copies
    // plus a partial copy of the next customer
    val rev1 = Tables.orders(spark, dir1x)
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
      .collect().map(r => BigDecimal(r.getAs[java.math.BigDecimal]("rev")))
      .sorted.reverse
    val n1 = rev1.length.toLong
    val n10 = 10L * n1
    Seq(1, 5, 10, 20).foreach { p =>
      val k10 = (n10 * p + 99) / 100
      val full = (k10 / 10).toInt
      val expTop = rev1.take(full).sum * 10 +
        (if (k10 % 10 > 0) BigDecimal(k10 % 10) * rev1(full) else BigDecimal(0))
      assert(pa10(p).getAs[Long]("n_customers") == n10)
      assert(pa10(p).getAs[Long]("k_customers") == k10, s"pct $p")
      assert(math.abs(pa10(p).getAs[Double]("top_rev") - expTop.toDouble)
        <= 1e-6 * expTop.toDouble, s"pct $p top_rev")
      assert(math.abs(pa10(p).getAs[Double]("share") -
        pa1(p).getAs[Double]("share")) <= 1e-3, s"pct $p share drifted")
    }
  }

  /** Round 14 (#248–#259): the disjoint-replica construction gives
    * EXACT expectations for almost the whole cohort — standardized
    * moments, correlations, crossover signals, surrogate keys and
    * worst-residual identities are replication-INVARIANT, while
    * counts, drawdowns and endpoint totals scale exactly ×10. The
    * two deliberate tolerances: double recomputation noise on
    * invariant statistics (2e-6 — the inputs are 10× exact sums, so
    * only IEEE re-association at the cast differs) and percentile
    * interpolation at replica run boundaries (5% rel — the
    * interpolation index p·(10n−1) can land between distinct values
    * where p·(n−1) did not). */
  test("round-14 cohort scales 1x to 10x with exact invariants") {
    gated()
    ensureScaled()
    import org.apache.spark.sql.Row

    // #248: skew/kurt invariant, n ×10
    val sk1 = AggOps.aggSkewKurtosis(spark, dir1x).collect()
    val sk10 = AggOps.aggSkewKurtosis(spark, dir10x).collect()
    sk1.zip(sk10).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0))
      assert(b.getLong(1) == 10 * a.getLong(1), "n ×10")
      assert(math.abs(a.getDouble(2) - b.getDouble(2)) <= 2e-6, "skew invariant")
      assert(math.abs(a.getDouble(3) - b.getDouble(3)) <= 2e-6, "kurt invariant")
    }
    // #249: same years/days (replicas share dates), drawdown exactly ×10
    val dd1 = WindowOps.winDrawdownMax(spark, dir1x).collect()
    val dd10 = WindowOps.winDrawdownMax(spark, dir10x).collect()
    dd1.zip(dd10).foreach { case (a, b) =>
      assert(a.getInt(0) == b.getInt(0) && a.getLong(1) == b.getLong(1))
      assert(math.abs(b.getDouble(2) - 10.0 * a.getDouble(2))
        <= 1e-6 * math.max(1.0, 10.0 * a.getDouble(2)), "drawdown ×10")
      assert(a.getTimestamp(3) == b.getTimestamp(3), "trough day invariant")
    }
    // #253: the cross-multiplied signal is scale-invariant ⇒ identical rows
    val sm1 = EtlOps.tsSmaCrossover(spark, dir1x).collect().toSeq
    val sm10 = EtlOps.tsSmaCrossover(spark, dir10x).collect().toSeq
    assert(sm1.map(_.toSeq) == sm10.map(_.toSeq), "crossover table invariant")
    // #250: unigram sets are rotation-invariant ⇒ rouge1 multiset ×10;
    // pair count exactly ×10 (length-preserving rotations, within-replica
    // adjacency)
    val rg1 = CorpusOps.textRougeOverlap(spark, dir1x)
      .groupBy(col("rouge1_recall")).count().collect()
      .map(r => r.getDouble(0) -> r.getLong(1)).toMap
    val rg10 = CorpusOps.textRougeOverlap(spark, dir10x)
      .groupBy(col("rouge1_recall")).count().collect()
      .map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(rg10.values.sum == 10 * rg1.values.sum, "pair count ×10")
    rg1.foreach { case (v, n) =>
      assert(rg10.getOrElse(v, 0L) == 10 * n, s"rouge1=$v multiset ×10") }
    // #251: the op's data contract — per-(type, day) trials exactly ×10
    def trials(dir: String): Map[(String, java.sql.Date), (Long, Long)] =
      Tables.events(spark, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"),
          sum(when(Tables.money(col("value")) > 100, 1).otherwise(0)).as("k"))
        .collect()
        .map(r => (r.getString(0), r.getDate(1)) ->
          ((r.getLong(2), r.getLong(3)))).toMap
    val (tr1, tr10) = (trials(dir1x), trials(dir10x))
    assert(tr1.keySet == tr10.keySet, "same (type, day) grid")
    tr1.foreach { case (k, (n, s)) =>
      assert(tr10(k) == ((10 * n, 10 * s)), s"$k trials ×10") }
    assert(EtlOps.eventsSprtSequential(spark, dir10x).count() ==
      EtlOps.eventsSprtSequential(spark, dir1x).count(), "one row per type")
    // #252: correlation is replication-invariant; endpoints ×10
    val as1 = GraphOps.graphDegreeAssortativity(spark, dir1x).head()
    val as10 = GraphOps.graphDegreeAssortativity(spark, dir10x).head()
    assert(as10.getLong(0) == 10 * as1.getLong(0), "endpoints ×10")
    assert(math.abs(as10.getDouble(1) - as1.getDouble(1)) <= 2e-6,
      "assortativity invariant")
    // #254: the top coefficient and its (degree, triangles) shape are
    // invariant (10 shifted copies of the same best node; ties break
    // toward replica 0's smaller ids)
    val cc1 = GraphOps.graphClusteringCoefficient(spark, dir1x).head()
    val cc10 = GraphOps.graphClusteringCoefficient(spark, dir10x).head()
    assert(cc1.getLong(1) == cc10.getLong(1) && cc1.getLong(2) == cc10.getLong(2),
      "top node degree/triangles invariant")
    assert(math.abs(cc1.getDouble(3) - cc10.getDouble(3)) <= 1e-9,
      "top coefficient invariant")
    // #255: user_id shift is ≡ 0 mod 25 ⇒ per-nation rows ×10 exactly
    val en1 = StreamOps.streamStaticEnrich(spark, dir1x).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val en10 = StreamOps.streamStaticEnrich(spark, dir10x).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(en1.keySet == en10.keySet)
    en1.foreach { case (k, (n, v)) =>
      assert(en10(k)._1 == 10 * n, s"$k events ×10")
      assert(math.abs(en10(k)._2 - 10.0 * v) <= 1e-9 * math.max(1.0, 10.0 * v),
        s"$k value ×10") }
    // #256: per-copy (n, Σv) and the global mean are invariant ⇒ the
    // top shrunk value is invariant
    val eb1 = AggOps.aggEbShrunkMeans(spark, dir1x).head()
    val eb10 = AggOps.aggEbShrunkMeans(spark, dir10x).head()
    assert(eb1.getLong(1) == eb10.getLong(1), "top n_orders invariant")
    assert(math.abs(eb1.getDouble(3) - eb10.getDouble(3)) <= 2e-6,
      "top shrunk mean invariant")
    // #257: slope and the worst point are invariant (N, D scale ×100;
    // the argmax tie across copies breaks to replica 0's orderkey)
    val ro1 = AggOps.aggRegressionOutlier(spark, dir1x).collect()
    val ro10 = AggOps.aggRegressionOutlier(spark, dir10x).collect()
    ro1.zip(ro10).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0))
      assert(b.getLong(1) == 10 * a.getLong(1), "n_pts ×10")
      assert(math.abs(a.getDouble(2) - b.getDouble(2)) <= 2e-6, "slope invariant")
      assert(a.getLong(3) == b.getLong(3) && a.getInt(4) == b.getInt(4),
        "worst point invariant (replica-0 tie-break)")
      assert(math.abs(a.getDouble(7) - b.getDouble(7)) <= 1e-4,
        "worst residual invariant")
    }
    // #258: rotation preserves (source, lang) ⇒ identical keys, n ×10
    val sk1r = EtlOps.etlSurrogateKeyAssign(spark, dir1x).collect()
    val sk10r = EtlOps.etlSurrogateKeyAssign(spark, dir10x).collect()
    assert(sk1r.length == sk10r.length, "same dimension")
    sk1r.zip(sk10r).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0) && a.getString(1) == b.getString(1) &&
        a.getString(2) == b.getString(2), "keys invariant")
      assert(b.getLong(3) == 10 * a.getLong(3), "n_docs ×10") }
    // #259: lags are shift-invariant (+k µs on both sides), so the 10×
    // lag multiset is EXACTLY each 1× lag repeated ten times — which
    // pins the interpolated percentiles EXACTLY (the naive "p90 within
    // a few % of 1×" expectation is FALSE: the interpolation index
    // 0.9·(10n−1) can land between distinct tail values far apart —
    // observed 340 vs 286 minutes on this corpus — so the pin
    // recomputes the expected interpolation over the replicated
    // multiset instead of tolerating drift)
    val tc1 = EtlOps.eventsTimeToConvert(spark, dir1x).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    val tc10 = EtlOps.eventsTimeToConvert(spark, dir10x).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(tc1.keySet == tc10.keySet)
    val lag1: Map[Int, IndexedSeq[Double]] = {
      val ev = Tables.events(spark, dir1x)
      val p = ev.where(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          unix_micros(col("ts")).as("p_us"))
      val c = ev.where(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          unix_micros(col("ts")).as("c_us"),
          get_json_object(col("props"), "$.k").cast("int").as("campaign"))
      p.join(c, "user_id")
        .where(col("c_us") < col("p_us") &&
               col("c_us") >= col("p_us") - lit(7L * 86400L * 1000000L))
        .groupBy(col("purchase_id"))
        .agg(max(col("p_us")).as("p_us"),
          max_by(struct(col("campaign"), col("c_us")),
            struct(col("c_us"), col("click_id"))).as("nc"))
        .select(col("nc.campaign").as("campaign"),
          ((col("p_us") - col("nc.c_us")).cast("double") / lit(60000000.0))
            .as("lag_min"))
        .collect().groupBy(_.getInt(0))
        .map { case (k, rs) => k -> rs.map(_.getDouble(1)).sorted.toIndexedSeq }
    }
    def pctl(vs: IndexedSeq[Double], p: Double): Double = {
      val h = p * (vs.length - 1)
      val lo = h.toInt
      val v = if (lo + 1 >= vs.length) vs(lo)
              else vs(lo) + (h - lo) * (vs(lo + 1) - vs(lo))
      math.round(v * 10000.0) / 10000.0
    }
    tc1.foreach { case (k, (n, _, _)) =>
      assert(tc10(k)._1 == 10 * n, s"campaign $k conversions ×10")
      val rep = lag1(k).flatMap(v => IndexedSeq.fill(10)(v))
      assert(math.abs(tc10(k)._2 - pctl(rep, 0.5)) <= 2e-3,
        s"campaign $k p50: got ${tc10(k)._2}, expected ${pctl(rep, 0.5)}")
      assert(math.abs(tc10(k)._3 - pctl(rep, 0.9)) <= 2e-3,
        s"campaign $k p90: got ${tc10(k)._3}, expected ${pctl(rep, 0.9)}")
    }
    // #260: disjoint custkey shifts keep every replica's per-customer
    // totals — and so every order's share8 — IDENTICAL to replica 0's,
    // so the 10× top-20 is computable exactly from the 10× sort rule
    // (share desc, orderkey asc) over the replicated candidates. The
    // copies of the 1× top-20 dominate every other 10× row with one
    // exception class: share-TIED originals of lower 1× rank, so the
    // candidate set is copies of all 1× rows with share8 ≥ the 1×
    // 20th share — built here from the raw 1× table
    val sg10 = WindowOps.winShareOfGroup(spark, dir10x).collect().map(r =>
      (r.getAs[Long]("o_orderkey"), r.getAs[Long]("o_custkey"),
       r.getAs[Double]("share"))).toSeq
    val raw1 = Tables.orders(spark, dir1x)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        (BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP)
          * 100).toLongExact))
    val tot1 = raw1.groupBy(_._2).map { case (c, rs) => c -> rs.map(_._3).sum }
    val shares1 = raw1.map { case (ok, ck, c) =>
      (ok, ck, c * 100000000L / tot1(ck)) }
    val floor20 = shares1.map(_._3).sorted.reverse.take(20).last
    val expTop = shares1.filter(_._3 >= floor20).flatMap { case (ok, ck, s8) =>
      (0 until 10).map(k => (ok + k * 100000000L, ck + k * 10000000L, s8))
    }.sortBy { case (ok, _, s8) => (-s8, ok) }.take(20)
      .map { case (ok, ck, s8) => (ok, ck, s8.toDouble / 100000000L) }.toSeq
    assert(sg10 == expTop, s"#260 10× top-20:\n got=$sg10\n exp=$expTop")
    // #261: +k µs ts shifts stay inside the day, user shifts are
    // disjoint ⇒ per week n_days invariant, ΣDAU and WAU exactly ×10,
    // and the integer-grid stickiness IDENTICAL (⌊10a·10⁸/10b⌋ =
    // ⌊a·10⁸/b⌋)
    val st1 = EtlOps.eventsStickinessRatio(spark, dir1x).collect()
    val st10 = EtlOps.eventsStickinessRatio(spark, dir10x).collect()
    assert(st1.length == st10.length, "#261 same weeks")
    st1.zip(st10).foreach { case (a, b) =>
      assert(a.getTimestamp(0) == b.getTimestamp(0), "week invariant")
      assert(a.getLong(1) == b.getLong(1), "n_days invariant")
      assert(b.getLong(2) == 10 * a.getLong(2), "ΣDAU ×10")
      assert(b.getLong(3) == 10 * a.getLong(3), "WAU ×10")
      assert(a.getDouble(4) == b.getDouble(4), "stickiness grid-identical")
    }
  }

  /** Round 15 (#264–#266): replicas share dates and word multisets,
    * so the growth/dependence/decay STATISTICS are replication-
    * invariant while their count inputs scale exactly ×10. The two
    * bit-exactness arguments: an IEEE division of exact longs is
    * correctly rounded of the REAL quotient, and (10a)/(10b) has the
    * same real quotient as a/b — so the gridded growth/MI terms are
    * IDENTICAL doubles at 10×, not merely close; only the Zipf fit
    * carries a tolerance (the ln·10⁹ grid floors ln(10c) with ±1-unit
    * jitter vs ln(c)+ln10, so slope may move at the 1e-6 display
    * grid's edge). */
  test("round-15 cohort scales 1x to 10x with exact invariants") {
    gated()
    ensureScaled()
    // #264: monthly cents ×10 exactly ⇒ revenue ×10, growth IDENTICAL
    val yo1 = EtlOps.tsYoyGrowth(spark, dir1x).collect()
    val yo10 = EtlOps.tsYoyGrowth(spark, dir10x).collect()
    assert(yo1.length == yo10.length, "same months")
    yo1.zip(yo10).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0) && a.getLong(1) == b.getLong(1))
      // compare in CENTS: 10·(c/100) double-rounds where (10c)/100
      // does not, so the ×10 identity lives on the exact longs
      assert(math.round(b.getDouble(2) * 100) ==
        10L * math.round(a.getDouble(2) * 100), "revenue ×10 exactly")
      assert(Option(a.get(4)) == Option(b.get(4)), "growth grid-identical")
    }
    // #265: all counts ×10 ⇒ every probability and term identical
    val mi1 = AggOps.aggMutualInformation(spark, dir1x).collect()
    val mi10 = AggOps.aggMutualInformation(spark, dir10x).collect()
    assert(mi1.length == mi10.length)
    mi1.zip(mi10).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0))
      assert(b.getLong(1) == 10 * a.getLong(1), "n_events ×10")
      assert(a.getLong(2) == b.getLong(2), "cell support invariant")
      assert(a.getDouble(3) == b.getDouble(3), "MI part grid-identical")
    }
    // #266: word rotation preserves multisets ⇒ counts ×10, ranks
    // identical; slope invariant to the grid edge, intercept shifts
    // by exactly ln 10 (same grid caveat)
    val z1 = CorpusOps.textZipfFit(spark, dir1x).head
    val z10 = CorpusOps.textZipfFit(spark, dir10x).head
    // the synthetic corpus vocabulary (31 words) is under the top-100
    // cap, so the head is the whole vocabulary — invariant under
    // rotation-replication
    assert(z1.getAs[Long]("n_terms") == z10.getAs[Long]("n_terms"))
    assert(z10.getAs[Long]("max_count") == 10 * z1.getAs[Long]("max_count"))
    assert(math.abs(z10.getAs[Double]("slope") - z1.getAs[Double]("slope"))
      <= 1e-5, s"zipf slope drifted: ${z1.getAs[Double]("slope")} -> " +
        s"${z10.getAs[Double]("slope")}")
    assert(math.abs(z10.getAs[Double]("intercept_ln") -
      z1.getAs[Double]("intercept_ln") - math.log(10.0)) <= 1e-5,
      "intercept shifts by exactly ln 10")
    // #269: lang and word multisets survive rotation ⇒ slice counts
    // ×10 ⇒ every probability, mixture and gridded term identical
    val j1 = graft.ops.TextOps.textJsDivergence(spark, dir1x).head
    val j10 = graft.ops.TextOps.textJsDivergence(spark, dir10x).head
    assert(j1.getAs[Long]("n_terms") == j10.getAs[Long]("n_terms"))
    assert(j10.getAs[Long]("tokens_en") == 10 * j1.getAs[Long]("tokens_en"))
    assert(j10.getAs[Long]("tokens_rest") == 10 * j1.getAs[Long]("tokens_rest"))
    assert(j1.getAs[Double]("jsd") == j10.getAs[Double]("jsd"),
      "JSD grid-identical under replication")
    // #270: each replica's per-(type, user+k·10⁷) gap multiset equals
    // replica 0's (uniform +k µs shift) ⇒ every histogram cell ×10
    val ih1 = EtlOps.eventsInterarrivalHist(spark, dir1x).collect()
    val ih10 = EtlOps.eventsInterarrivalHist(spark, dir10x).collect()
    assert(ih1.length == ih10.length, "#270 same cells")
    ih1.zip(ih10).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0) && a.getLong(1) == b.getLong(1))
      assert(b.getLong(2) == 10 * a.getLong(2), "n_pairs ×10")
      assert(b.getLong(3) == 10 * a.getLong(3), "gap sum ×10")
    }
    // #271: term counts ×10, ranks identical ⇒ cum ×10, coverage
    // identical (correctly-rounded division of exact longs)
    val vc1 = CorpusOps.textVocabCoverage(spark, dir1x).collect()
    val vc10 = CorpusOps.textVocabCoverage(spark, dir10x).collect()
    assert(vc1.length == vc10.length)
    vc1.zip(vc10).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0))
      assert(b.getLong(1) == 10 * a.getLong(1), "covered ×10")
      assert(b.getLong(2) == 10 * a.getLong(2), "total ×10")
      assert(a.getDouble(3) == b.getDouble(3), "coverage grid-identical")
    }
    // #272: disjoint user shifts + uniform +k µs preserve every
    // per-user (cutover, sides, cents) — the 10× top-20 savers are
    // computable exactly by replicating the 1× per-user table and
    // re-sorting (savings desc, user asc)
    val br10 = EtlOps.etlBaselineReportingUsage(spark, dir10x).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSeq
    val ev1 = Tables.events(spark, dir1x)
      .select(col("user_id"), unix_micros(col("ts")), col("event_type"),
        col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        (BigDecimal(r.getDouble(3))
          .setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact))
    val cutU = ev1.filter(_._3 == "purchase").groupBy(_._1)
      .map { case (u, es) => u -> es.map(_._2).min }
    val perUser = ev1.filter(e => cutU.contains(e._1)).groupBy(_._1).toSeq
      .map { case (u, es) =>
        val c = cutU(u)
        val b = es.filter(_._2 < c); val r = es.filter(_._2 > c)
        (u, b.size.toLong, r.size.toLong, b.map(_._4).sum, r.map(_._4).sum) }
      .filter(x => x._2 > 0 && x._3 > 0)
    val expBr = perUser.flatMap { case (u, nb, nr, bc, rc) =>
      (0 until 10).map(k => (u + k * 10000000L, nb, nr, bc, rc)) }
      .sortBy { case (u, _, _, bc, rc) => (-(bc - rc), u) }.take(20)
      .map { case (u, nb, nr, bc, rc) =>
        (u, nb, nr, bc.toDouble / 100, rc.toDouble / 100,
         (bc - rc).toDouble / 100) }
    assert(br10 == expBr, s"#272 10× top-20:\n got=${br10.take(3)}\n exp=${expBr.take(3)}")
    // #273: exact replication multiplies every slice term count by 10,
    // so NOTHING can remain count-1 — the hapax set collapses to zero
    // while terms stay invariant and tokens scale exactly
    val hx1 = CorpusOps.textHapaxRatio(spark, dir1x).collect()
    val hx10 = CorpusOps.textHapaxRatio(spark, dir10x).collect()
    assert(hx1.length == hx10.length)
    hx1.zip(hx10).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0))
      assert(a.getLong(1) == b.getLong(1), "n_terms invariant")
      assert(b.getLong(2) == 0L, "hapax set collapses under ×10 replication")
      assert(b.getLong(3) == 10 * a.getLong(3), "tokens ×10")
    }
  }
  /** Round 16 (#274–#276, #279): the v5 writer replicates customer /
    * supplier with replica-matched key shifts and VERBATIM nation
    * keys, so the nation-level trade graph is the SAME 25-node graph
    * at 10× (edge weights ×10, edge SET identical) and every
    * per-nation group is the same value multiset repeated ×10. The
    * bit-exactness lever is the round-15 one: (10a)/(10b) is the same
    * real quotient as a/b, and both decimal sums stay exactly
    * double-representable, so the gridded loo means / medians /
    * z-moment quotients are IDENTICAL doubles — the jackknife and BFS
    * outputs must be exactly invariant, Levene's moments exactly ×10
    * with F moving by the exact df ratio, and pseudonymized join
    * counts exactly ×10 with the integrity flag held. */
  test("round-16 cohort scales 1x to 10x with exact invariants") {
    gated()
    ensureScaled()
    // #274: identical edge set ⇒ identical distances, exactly
    val sp1 = GraphOps.graphShortestPaths(spark, dir1x).collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue))
      .toSeq.sorted
    val sp10 = GraphOps.graphShortestPaths(spark, dir10x).collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue))
      .toSeq.sorted
    assert(sp1 == sp10, s"#274 distances must be replication-invariant")
    // #276: loo means bit-identical ((10a)/(10b) = a/b correctly
    // rounded) ⇒ every statistic invariant, n_total ×10
    val jk1 = AggOps.aggJackknifeGroups(spark, dir1x).collect()(0)
    val jk10 = AggOps.aggJackknifeGroups(spark, dir10x).collect()(0)
    assert(jk10.getAs[Long]("g_groups") == jk1.getAs[Long]("g_groups"))
    assert(jk10.getAs[Long]("n_total") == 10 * jk1.getAs[Long]("n_total"))
    Seq("theta_hat", "theta_jack", "se_jack", "bias_jack").foreach { c =>
      assert(jk10.getAs[Double](c) == jk1.getAs[Double](c),
        s"#276 $c must be bit-identical at 10x")
    }
    // #275: medians of a x10-replicated multiset are unchanged (the
    // interpolation lands on the same value pair), so z-moments scale
    // exactly x10; SSB/SSW x10 at the 6dp display grid and F moves by
    // the exact within-df ratio (10N-5)/(N-5) (~10: same variance
    // ratio, ten times the evidence)
    val lv1 = AggOps.aggLeveneBf(spark, dir1x).collect()(0)
    val lv10 = AggOps.aggLeveneBf(spark, dir10x).collect()(0)
    val n1 = lv1.getAs[Long]("n_total")
    assert(lv10.getAs[Long]("n_total") == 10 * n1)
    def rel(a: Double, b: Double) = math.abs(a - b) / math.max(1.0, math.abs(b))
    assert(rel(lv10.getAs[Double]("ss_between"),
               10 * lv1.getAs[Double]("ss_between")) <= 1e-9, "#275 SSB x10")
    assert(rel(lv10.getAs[Double]("ss_within"),
               10 * lv1.getAs[Double]("ss_within")) <= 1e-9, "#275 SSW x10")
    val dfRatio = (10.0 * n1 - 5.0) / (n1 - 5.0)
    assert(rel(lv10.getAs[Double]("f_stat"),
               lv1.getAs[Double]("f_stat") * dfRatio) <= 1e-6,
      s"#275 F must move by the exact df ratio $dfRatio")
    // #279: per-nation cells are the same multiset x10 - every count
    // x10 exactly, the integrity flag held at both scales
    val an1 = EtlOps.etlAnonymizeReferential(spark, dir1x).collect()
    val an10 = EtlOps.etlAnonymizeReferential(spark, dir10x).collect()
    assert(an1.length == an10.length, "same nations")
    an1.zip(an10).foreach { case (a, b) =>
      assert(a.getAs[Number]("c_nationkey").longValue ==
             b.getAs[Number]("c_nationkey").longValue)
      assert(b.getAs[Boolean]("integrity_ok") && a.getAs[Boolean]("integrity_ok"))
      Seq("n_customers", "n_pseudonyms", "n_orders_plain", "n_orders_pseudo")
        .foreach { c =>
          assert(b.getAs[Long](c) == 10 * a.getAs[Long](c), s"#279 $c x10")
        }
    }
  }
  /** Round-16 batches 2–4 (#281, #282, #285, #289): each replica is a
    * disjoint user/doc universe whose VALUE content repeats exactly,
    * so probability-shaped outputs (info-gain entropies, delta-method
    * ratios, PII rates) are replication-INVARIANT while their count
    * inputs scale exactly ×10. Top
    * paths replicate per user-replica with identical journeys, so the
    * top-20 path SET and order survive with counts ×10. */
  test("round-16 batch-2/4 cohort scales 1x to 10x with exact invariants") {
    gated()
    ensureScaled()
    // #281: same paths, counts ×10, order preserved
    val tp1 = EtlOps.eventsTopPaths(spark, dir1x).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val tp10 = EtlOps.eventsTopPaths(spark, dir10x).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(tp10 == tp1.map { case (p, n) => (p, 10 * n) },
      s"#281 top-20: ${tp10.take(3)} vs x10 of ${tp1.take(3)}")
    // #282: probabilities identical ⇒ entropies and IG grid-identical
    val ig1 = AggOps.aggInfoGain(spark, dir1x).collect()(0)
    val ig10 = AggOps.aggInfoGain(spark, dir10x).collect()(0)
    assert(ig10.getAs[Long]("n_total") == 10 * ig1.getAs[Long]("n_total"))
    assert(ig10.getAs[Long]("n_high") == 10 * ig1.getAs[Long]("n_high"))
    Seq("h_label", "h_conditional", "info_gain").foreach { c =>
      assert(ig10.getAs[Double](c) == ig1.getAs[Double](c),
        s"#282 $c must be grid-identical at 10x")
    }
    // #285 carries NO exact pin here: the md5 arm coin is keyed on the
    // user id, and replica ids are shifted, so each replica's users
    // re-randomize across arms (by design — the split must be a pure
    // key function) and arm moments are not replication-covariant.
    // Its exactness evidence is the driver-side replay in
    // Round16OpsSpec; here we only require the op runs at 10x with
    // both arms populated.
    val dm10 = AggOps.aggDeltaMethodRatio(spark, dir10x).collect()(0)
    assert(dm10.getAs[Long]("n_users_a") > 0 &&
           dm10.getAs[Long]("n_users_b") > 0)
    // #289: regex hits replicate with the rotated-word texts (matches
    // cannot span the space boundary), so counts x10 and rates held
    val pi1 = LlmOps.textPiiScan(spark, dir1x).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toMap
    val pi10 = LlmOps.textPiiScan(spark, dir10x).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toMap
    assert(pi1.keySet == pi10.keySet)
    pi1.foreach { case (src, (n, e, l, w, rate)) =>
      val b = pi10(src)
      assert(b == ((10 * n, 10 * e, 10 * l, 10 * w, rate)),
        s"#289 $src: $b vs x10 of ${(n, e, l, w, rate)}")
    }
  }

  test("round-17 cohort (#291-#292): snapshot stats-pruning and evolution hold at 1x AND 10x") {
    // Key shifts (k·10⁸) move the %5/%7/%11 cohort classes per
    // replica, so exact ×10 output pins don't hold for these ops;
    // the falsifiable form is REPLAY EQUALITY at each scale — the
    // op's graded row must equal a direct Spark computation of the
    // same v1/band/tier logic on that corpus — plus the ops' inline
    // requires (pruning strictness, file-list identity, band
    // disjointness) holding on a 1.5M-row table, which is where a
    // stats or evolution bug that sf0.01 masks would surface.
    gated()
    ensureScaled()
    def v1Of(dir: String): DataFrame = {
      val o = Tables.orders(spark, dir).select(col("o_orderkey").as("k"),
        col("o_orderstatus").as("st"),
        Tables.money(col("o_totalprice")).as("price"))
      val v0 = o.where(col("k") % 5 =!= 0)
      v0.where(col("k") % 7 =!= 2)
        .select(col("k"),
          when(col("k") % 7 === 1, lit("X")).otherwise(col("st")).as("st"),
          when(col("k") % 7 === 1, (col("price") + lit(100)).cast("decimal(18,2)"))
            .otherwise(col("price")).as("price"))
        .unionAll(o.where(col("k") % 5 === 0 && col("k") % 7 === 3)
          .select(col("k"), col("st"), col("price")))
    }
    Seq(dir1x, dir10x).foreach { dir =>
      val v1 = v1Of(dir)
      // #291: graded row == the band replay, and the op's inline
      // requires (strict pruning + skipped-file disjointness) passed
      val r = EtlOps.etlSnapshotStatsPruned(spark, dir).collect()(0)
      val band = v1.where(col("price").between(lit(50000.00), lit(150000.00)))
        .agg(count(lit(1)).as("n"),
          sum(col("price")).cast("double").as("t"),
          min(col("price")).cast("double").as("mn"),
          max(col("price")).cast("double").as("mx")).collect()(0)
      assert(r.getAs[Boolean]("pruned") &&
        r.getAs[Long]("n_rows") == band.getAs[Long]("n") &&
        r.getAs[Double]("total_price") == band.getAs[Double]("t") &&
        r.getAs[Double]("min_price") == band.getAs[Double]("mn") &&
        r.getAs[Double]("max_price") == band.getAs[Double]("mx"),
        s"#291 replay mismatch at $dir: $r vs $band")
      // #292: width sequence 3→4→4, invariant rows/totals, tier
      // counts equal the %11 cohort replay
      val rows = EtlOps.etlSnapshotAddColumn(spark, dir).collect()
        .map(x => (x.getAs[Int]("version"), x.getAs[Int]("n_cols"),
          x.getAs[Long]("n_rows"), x.getAs[Double]("total_price"),
          x.getAs[Long]("n_tier_set"), x.getAs[Long]("n_tier_high")))
      val exp = v1.agg(count(lit(1)).as("n"),
          sum(col("price")).cast("double").as("t"),
          count(when(col("k") % 11 === 0, lit(1))).as("set"),
          count(when(col("k") % 11 === 0 && col("price") >= 150000, lit(1)))
            .as("hi")).collect()(0)
      val (n, t) = (exp.getAs[Long]("n"), exp.getAs[Double]("t"))
      assert(rows.toSeq == Seq(
        (1, 3, n, t, 0L, 0L),
        (2, 4, n, t, 0L, 0L),
        (3, 4, n, t, exp.getAs[Long]("set"), exp.getAs[Long]("hi"))),
        s"#292 replay mismatch at $dir: ${rows.toSeq}")
    }
  }

  test("round-17 cohort (#293-#295): snapshot restore/rename/delete hold at 1x AND 10x") {
    // Same replay-equality form as the #291/#292 pin (key shifts move
    // the modulo cohorts per replica, so exact ×10 pins don't apply):
    // each op's graded rows must equal a direct Spark computation of
    // the same version logic on that corpus, and the ops' inline
    // requires (file-list identity, physical-name stability, skip/
    // rewrite split, verbatim carry) must hold on a 1.5M-row table.
    gated()
    ensureScaled()
    def tbl(dir: String): (DataFrame, DataFrame) = {
      val o = Tables.orders(spark, dir).select(col("o_orderkey").as("k"),
        col("o_orderstatus").as("st"),
        Tables.money(col("o_totalprice")).as("price"))
      val v0 = o.where(col("k") % 5 =!= 0)
      val v1 = v0.where(col("k") % 7 =!= 2)
        .select(col("k"),
          when(col("k") % 7 === 1, lit("X")).otherwise(col("st")).as("st"),
          when(col("k") % 7 === 1, (col("price") + lit(100)).cast("decimal(18,2)"))
            .otherwise(col("price")).as("price"))
        .unionAll(o.where(col("k") % 5 === 0 && col("k") % 7 === 3)
          .select(col("k"), col("st"), col("price")))
      (v0, v1)
    }
    Seq(dir1x, dir10x).foreach { dir =>
      val (v0, v1) = tbl(dir)
      def aggOf(df: DataFrame): (Long, Double, Long) = {
        val r = df.agg(count(lit(1)).as("n"),
          sum(col("price")).cast("double").as("t"),
          sum(when(col("st") === "X", 1L).otherwise(0L)).as("u")).collect()(0)
        (r.getAs[Long]("n"), r.getAs[Double]("t"), r.getAs[Long]("u"))
      }
      val (n0, t0, u0) = aggOf(v0)
      val (n1, t1, u1) = aggOf(v1)
      // #293: version rows (0, 1, 2) with v2 == v0's content exactly
      val rr = EtlOps.etlSnapshotRestore(spark, dir).collect()
        .map(x => (x.getAs[Int]("version"), x.getAs[Long]("n_rows"),
          x.getAs[Double]("total_price"), x.getAs[Long]("n_updated"))).toSeq
      assert(rr == Seq((0, n0, t0, u0), (1, n1, t1, u1), (2, n0, t0, u0)),
        s"#293 replay mismatch at $dir: $rr")
      // #294: rename is content-invariant; the post-rename merge adds
      // exactly +50 per %13-cohort row
      val t3 = v1.agg(sum(when(col("k") % 13 === 0,
          (col("price") + lit(50)).cast("decimal(18,2)"))
          .otherwise(col("price"))).cast("double")).collect()(0).getDouble(0)
      val rn = EtlOps.etlSnapshotRenameColumn(spark, dir).collect()
        .map(x => (x.getAs[Int]("version"), x.getAs[String]("col_name"),
          x.getAs[Long]("n_rows"), x.getAs[Double]("total_amount"))).toSeq
      assert(rn == Seq((1, "o_price", n1, t1), (2, "o_amount", n1, t1),
        (3, "o_amount", n1, t3)),
        s"#294 replay mismatch at $dir: $rn")
      // #295: survivors == the NOT-BETWEEN replay, zero in-band rows
      val sv = v1.where(!col("price").between(lit(60000.00), lit(120000.00)))
      val e = sv.agg(count(lit(1)).as("n"),
        sum(col("price")).cast("double").as("t"),
        min(col("price")).cast("double").as("mn"),
        max(col("price")).cast("double").as("mx")).collect()(0)
      val dl = EtlOps.etlSnapshotDeleteWhere(spark, dir).collect()(0)
      assert(dl.getAs[Long]("n_rows") == e.getAs[Long]("n") &&
        dl.getAs[Double]("total_price") == e.getAs[Double]("t") &&
        dl.getAs[Double]("min_price") == e.getAs[Double]("mn") &&
        dl.getAs[Double]("max_price") == e.getAs[Double]("mx") &&
        dl.getAs[Long]("n_in_band") == 0L,
        s"#295 replay mismatch at $dir: $dl vs $e")
    }
  }

  test("round-17 cohort (#296): the snapshot sink's table equals the last-state replay at 1x AND 10x") {
    // The scaled events corpus shifts user ids per replica (each
    // user's history is replica-local), so the sink's live view at
    // 10× is EXACTLY 10 replicas of the 1× view: replay equality at
    // each scale plus the exact ×10 row pin. Each invocation drives
    // 4 chronological foreachBatch merges over a 1.5M/15M-event log —
    // the guard-read + bucket-rewrite cost path at real volume.
    gated()
    ensureScaled()
    def lastState(dir: String): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(spark, dir)
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1 && col("event_type") =!= "error")
        .select(col("user_id"), col("event_type").as("last_type"),
          Tables.money(col("value")).cast("double").as("last_value"),
          col("ts").as("last_ts"))
    }
    val counts = Seq(dir1x, dir10x).map { dir =>
      val got = StreamOps.streamSnapshotSink(spark, dir)
      val exp = lastState(dir)
      assert(got.exceptAll(exp).count() == 0 &&
             exp.exceptAll(got).count() == 0,
        s"#296 replay mismatch at $dir")
      got.count()
    }
    assert(counts(1) == 10 * counts(0),
      s"#296 live view must replicate exactly: ${counts(1)} vs 10x${counts(0)}")
  }
}
