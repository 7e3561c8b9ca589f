package graft

import org.apache.spark.sql.functions._
import graft.ops.LlmOps
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

  test("BinaryDecode stub: deterministic metadata from payload bytes") {
    val meta = BinaryDecode.decodeOne(7L, "hello".getBytes("UTF-8"))
    assert(meta == graft.multimodal.MediaMeta(7L, 5, 'h'.toInt, 'e'.toInt, 3, "68656C6C"))
    import spark.implicits._
    val ds = spark.createDataset(Seq((1L, "ab".getBytes("UTF-8")), (2L, Array.empty[Byte])))
    val out = BinaryDecode.decode(spark, ds).collect().sortBy(_.doc_id)
    assert(out(0).n_bytes == 2 && out(0).fake_width == 'a'.toInt)
    assert(out(1).n_bytes == 0 && out(1).fake_width == 0)
  }

  test("frame sampling emits bounded per-frame metadata (1-to-N decode shape)") {
    val bytes = Array.tabulate[Byte](100)(_.toByte) // 6 full 16-byte frames
    val all = BinaryDecode.frameSample(5L, bytes, everyN = 1)
    assert(all.map(_.frame_idx) == Seq(0, 1, 2, 3, 4, 5))
    assert(all.forall(f => f.byte_offset == f.frame_idx * 16))
    val sampled = BinaryDecode.frameSample(5L, bytes, everyN = 2)
    assert(sampled.map(_.frame_idx) == Seq(0, 2, 4))
    assert(sampled == all.filter(_.frame_idx % 2 == 0))
    assert(BinaryDecode.frameSample(6L, Array.empty[Byte], 1).isEmpty)
  }

  test("resize stub: fixed-size output independent of input size") {
    val small = BinaryDecode.resizeStub("abc".getBytes, 4, 4)
    val large = BinaryDecode.resizeStub(Array.tabulate[Byte](10000)(_.toByte), 4, 4)
    assert(small.length == 48 && large.length == 48)
    assert(BinaryDecode.resizeStub(Array.empty[Byte], 2, 2).forall(_ == 0))
    // deterministic
    assert(small.toSeq == BinaryDecode.resizeStub("abc".getBytes, 4, 4).toSeq)
  }

  test("multimodal_binary metadata agrees with the library decoder") {
    val viaQuery = LlmOps.multimodalBinary(spark, sf001).limit(20).collect()
    val texts = Tables.documents(spark, sf001).orderBy(col("doc_id")).limit(20)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    viaQuery.foreach { r =>
      val m = BinaryDecode.decodeOne(r.getLong(0), texts(r.getLong(0)).getBytes("UTF-8"))
      assert(r.getAs[Int]("n_bytes") == m.n_bytes)
      assert(r.getAs[Int]("fake_width") == m.fake_width)
      assert(r.getAs[String]("header_hex") == m.header_hex)
    }
  }
}
