package graft

import org.apache.spark.sql.functions._
import graft.ops.{LlmOps, ScanOps}
import graft.multimodal.BinaryDecode

/** Invariant tests for the extended LLM-pipeline family (§2.L). */
class LlmOpsSpec extends SparkSpec {

  test("simhash banding finds exactly the hamming<=3 pairs (pigeonhole completeness)") {
    val fps = LlmOps.textSimhash(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val brute = (for {
      (d1, s1) <- fps; (d2, s2) <- fps if d1 < d2
      if java.lang.Long.bitCount(s1 ^ s2) <= 3
    } yield (d1, d2)).toSet
    val banded = LlmOps.dedupSimhashBand(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == brute, s"banded=${banded.size} brute=${brute.size}")
  }

  test("jaccard scores are within [0,1] and symmetric in set sizes") {
    val rows = LlmOps.simJaccardNgram(spark, sf001).collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val j = r.getDouble(2); j >= 0.0 && j <= 1.0
    })
  }

  test("quality score equals its closed form") {
    val rows = LlmOps.textQualityScore(spark, sf001).collect()
    rows.foreach { r =>
      val ratio = r.getAs[Double]("stopword_ratio")
      val marked = r.getAs[Boolean]("has_dup_marker")
      val q = r.getAs[Double]("quality")
      val expect = 1.0 - 0.5 * ratio - (if (marked) 0.2 else 0.0)
      assert(math.abs(q - expect) < 1e-3, s"$r")
    }
  }

  test("language-id confusion matrix accounts for every scoring document") {
    val conf = LlmOps.textLanguageId(spark, sf001)
    val total = conf.agg(sum(col("n_docs"))).head.getLong(0)
    val docs = Tables.documents(spark, sf001).count()
    assert(total <= docs && total > 0)
  }

  test("IVF neighbors are ranked by descending rounded cosine") {
    val rows = LlmOps.simAnnIvf(spark, sf001).collect()
      .groupBy(_.getLong(0))
    rows.values.foreach { group =>
      val byRank = group.sortBy(_.getInt(1))
      assert(byRank.map(_.getInt(1)).toSeq == (1 to byRank.length))
      val coss = byRank.map(_.getDouble(3)).toSeq
      assert(coss == coss.sorted.reverse, coss.toString)
    }
  }

  test("connected components equal a naive union-find over the same pairs") {
    val pairs = LlmOps.dedupSimhashBand(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    // naive union-find
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val naive = parent.keys.map(n => n -> find(n)).toMap
    // canonical = min id per component
    val minOf = naive.groupBy(_._2).map { case (root, m) => root -> m.keys.min }
    val expected = naive.map { case (n, root) => n -> minOf(root) }
    val got = LlmOps.dedupClusterComponents(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected, s"got=${got.size} expected=${expected.size}")
  }

  test("LSH embedding dedup == brute force, with planted near-dups found") {
    // 60 random 64-dim vectors + 8 planted near-identical pairs
    // (tiny perturbation, cosine ~0.9999): the banded path must return
    // exactly the brute-force result and it must be non-empty.
    val rnd = new scala.util.Random(7)
    def vec(): Array[Float] = Array.fill(64)(rnd.nextGaussian().toFloat)
    val base = (0 until 60).map(i => (i.toLong, vec()))
    val planted = (0 until 8).flatMap { i =>
      val v = vec()
      val dup = v.map(x => x + 0.005f * rnd.nextGaussian().toFloat)
      Seq((100L + 2 * i, v), (101L + 2 * i, dup))
    }
    import spark.implicits._
    val df = (base ++ planted).toDF("vec_id", "embedding")
    val banded = graft.api.Transforms
      .dedupByEmbeddingCosine(df, col("vec_id"), col("embedding"), 64, 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val a = df.toDF("d1", "ea")
    val b = df.toDF("d2", "eb")
    val brute = a.join(b, col("d1") < col("d2"))
      .select(col("d1"), col("d2"),
        graft.api.Transforms.cosine(col("ea"), col("eb")).as("cos_sim"))
      .where(col("cos_sim") >= 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(brute.size >= 8, s"planting failed: ${brute.size}")
    assert(banded == brute, s"banded=${banded.size} brute=${brute.size}")
  }

  test("IVF is a subset of the exact pair universe and self-free") {
    val rows = LlmOps.simAnnIvf(spark, sf001).collect()
    assert(rows.forall(r => r.getLong(0) != r.getLong(2)))
  }

  test("BinaryDecode round-trips a real PNG through javax.imageio") {
    val png = BinaryDecode.syntheticPng(7L)
    // a real PNG: magic bytes, decodable, dimensions from the id
    assert(png.take(4).map(b => f"$b%02X").mkString == "89504E47")
    val meta = BinaryDecode.decodeOne(7L, png)
    val (w, h) = BinaryDecode.syntheticDims(7L)
    assert(meta.width == w && meta.height == h && meta.channels == 3)
    assert(meta.n_bytes == png.length && meta.header_hex == "89504E47")
    // pixel checksum equals the generator arithmetic — PNG is lossless
    val expected = (for (y <- 0 until h; x <- 0 until w) yield {
      val (r, g, b) = BinaryDecode.syntheticPixel(7L, x, y)
      (r + g + b).toLong
    }).sum
    assert(meta.pix_sum == expected)
    // undecodable payloads fail loudly instead of fabricating metadata
    intercept[IllegalArgumentException] {
      BinaryDecode.decodeOne(1L, "not an image".getBytes("UTF-8"))
    }
    import spark.implicits._
    val ds = spark.createDataset(Seq(1L, 2L).map(id => (id, BinaryDecode.syntheticPng(id))))
    val out = BinaryDecode.decode(spark, ds).collect().sortBy(_.doc_id)
    assert(out.map(_.doc_id).toSeq == Seq(1L, 2L))
    assert(out.forall(m => m.width == BinaryDecode.syntheticDims(m.doc_id)._1))
  }

  test("frame sampling decodes every Nth frame of a real multi-frame GIF") {
    val gif = BinaryDecode.syntheticGif(5L, nFrames = 6)
    val all = BinaryDecode.frameSample(5L, gif, everyN = 1)
    assert(all.map(_.frame_idx) == Seq(0, 1, 2, 3, 4, 5))
    assert(all.forall(_.n_pixels == 32)) // 8x4 frames
    // solid-color frames survive GIF's palette exactly
    all.foreach { f =>
      val (r, g, b) = BinaryDecode.syntheticPixel(5L, f.frame_idx, 0)
      assert(f.pix_sum == 32L * (r + g + b), s"frame ${f.frame_idx}")
    }
    val sampled = BinaryDecode.frameSample(5L, gif, everyN = 2)
    assert(sampled.map(_.frame_idx) == Seq(0, 2, 4))
    assert(sampled == all.filter(_.frame_idx % 2 == 0))
    assert(BinaryDecode.frameSample(6L, Array.empty[Byte], 1).isEmpty)
  }

  test("resize produces a real fixed-size PNG independent of input size") {
    val small = BinaryDecode.resizePng(BinaryDecode.syntheticPng(1L), 4, 4)
    val large = BinaryDecode.resizePng(BinaryDecode.syntheticPng(255L), 4, 4)
    val ms = BinaryDecode.decodeOne(0L, small)
    val ml = BinaryDecode.decodeOne(0L, large)
    assert(ms.width == 4 && ms.height == 4 && ml.width == 4 && ml.height == 4)
    // deterministic
    assert(small.toSeq == BinaryDecode.resizePng(BinaryDecode.syntheticPng(1L), 4, 4).toSeq)
    // nearest-neighbor of a 1-pixel-tall image replicates that row
    val (w1, _) = BinaryDecode.syntheticDims(0L) // 1x1
    assert(w1 == 1)
    val up = BinaryDecode.decodeOne(0L, BinaryDecode.resizePng(BinaryDecode.syntheticPng(0L), 2, 2))
    val (r, g, b) = BinaryDecode.syntheticPixel(0L, 0, 0)
    assert(up.pix_sum == 4L * (r + g + b))
  }

  test("downsample computes the exact floor block average, odd edges included") {
    // id=17: dims (1 + 17%16, 1 + (17/16)%16) = (2, 2) -> one 2x2 block
    val m = BinaryDecode.downsampleOne(17L, BinaryDecode.syntheticPng(17L))
    assert((m.in_w, m.in_h, m.out_w, m.out_h) == (2, 2, 1, 1))
    val px = for (y <- 0 to 1; x <- 0 to 1) yield BinaryDecode.syntheticPixel(17L, x, y)
    val expect = px.map(_._1).sum / 4 + px.map(_._2).sum / 4 + px.map(_._3).sum / 4
    assert(m.out_pix_sum == expect)
    // id=2: dims (3, 1) -> blocks {x:0-1} and {x:2} of one row each
    val m2 = BinaryDecode.downsampleOne(2L, BinaryDecode.syntheticPng(2L))
    assert((m2.in_w, m2.in_h, m2.out_w, m2.out_h) == (3, 1, 2, 1))
    val p = (0 to 2).map(x => BinaryDecode.syntheticPixel(2L, x, 0))
    val e2 = (p(0)._1 + p(1)._1) / 2 + (p(0)._2 + p(1)._2) / 2 + (p(0)._3 + p(1)._3) / 2 +
      p(2)._1 + p(2)._2 + p(2)._3
    assert(m2.out_pix_sum == e2)
  }

  test("sink_shard_manifest shards are complete and roughly balanced") {
    val rows = ScanOps.sinkShardManifest(spark, sf001).collect()
    assert(rows.map(_.getAs[Long]("shard")).toSeq == (0L to 7L))
    val counts = rows.map(_.getAs[Long]("n_docs"))
    assert(counts.sum == Tables.documents(spark, sf001).count())
    // md5 sharding of 500 docs across 8 shards: no shard empty or dominant
    assert(counts.min > 0 && counts.max < counts.sum / 2, counts.toSeq)
  }

  test("phash dedup: within-group recall complete, hamming <= 2, candidates at the LSH floor") {
    val pairs = LlmOps.multimodalPhashDedup(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Int]("hamming")).toMap
    val n = Tables.documents(spark, sf001).count()
    // every group of 4 consecutive doc_ids is a near-dup clique: the
    // variants differ in ONE sampled pixel => <= 2 dHash bits, so the
    // 4x16 banding is pigeonhole-complete and all 6 pairs per group
    // must be reported
    val within = for {
      g <- 0L until n / 4
      Seq(a, b) <- (0 to 3).map(v => 4 * g + v).combinations(2).toSeq
    } yield (a, b)
    within.foreach { p =>
      assert(pairs.contains(p), s"missing within-group pair $p")
      assert(pairs(p) <= 2, s"pair $p hamming ${pairs(p)} > 2")
    }
    // md5 pixels keep cross-group collisions at the random floor: at
    // 500 docs the reported pairs are EXACTLY the within-group cliques
    assert(pairs.size == within.size, s"${pairs.size} pairs vs ${within.size} within-group")
  }

  test("dhash decode matches direct pixel arithmetic, variants differ in the sampled pixel only") {
    // decoded hash == hash computed straight from the md5-pixel
    // formula (proves the PNG round trip preserved every pixel)
    val sx = (0 until 9).map(_ * 16 / 9)
    def arithHash(id: Long): Long = {
      val g = id / 4; val v = (id % 4).toInt
      def p(gx: Int, gy: Int): Int = {
        val base = BinaryDecode.phashPixel(g, sx(gx), gy * 2)
        if (sx(gx) == 7 && gy * 2 == 6) (base + v * 97) % 256 else base
      }
      (for (gy <- 0 until 8; gx <- 0 until 7 + 1; if p(gx + 1, gy) > p(gx, gy))
        yield gy * 8 + gx)
        .map(i => if (i == 63) Long.MinValue else 1L << i).sum
    }
    for (id <- 0L until 16L) {
      val dec = BinaryDecode.dhashOne(id, BinaryDecode.syntheticPhashPng(id))
      assert(dec == arithHash(id), s"doc $id decoded hash != arithmetic hash")
    }
    // variants of one group: hamming 0 vs base only at v=0
    val hs = (0 to 3).map(v => BinaryDecode.dhashOne(8L + v,
      BinaryDecode.syntheticPhashPng(8L + v)))
    for (a <- 0 to 3; b <- a + 1 to 3)
      assert(java.lang.Long.bitCount(hs(a) ^ hs(b)) <= 2, s"variants $a,$b too far")
  }

  test("multimodal_binary metadata agrees with the library decoder") {
    val viaQuery = LlmOps.multimodalBinary(spark, sf001).limit(20).collect()
    viaQuery.foreach { r =>
      val id = r.getLong(0)
      val m = BinaryDecode.decodeOne(id, BinaryDecode.syntheticPng(id))
      assert(r.getAs[Int]("width") == m.width)
      assert(r.getAs[Int]("height") == m.height)
      assert(r.getAs[Int]("channels") == m.channels)
      assert(r.getAs[String]("header_hex") == m.header_hex)
      assert(r.getAs[Long]("pix_sum") == m.pix_sum)
    }
  }
}
