package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.graft.TopKState
import graft.functions.{VecMeanBuf, VectorMean}

/** SURVEY §5.3 property tests over the pure cores of the custom
  * aggregates (no Spark session needed — these are the exact
  * reduce/merge functions the plans execute). Deterministic seeds,
  * 200 cases per property (scalacheck Gen without the scalatestplus
  * bridge, which is not on the offline classpath). */
class PropertiesSpec extends AnyFunSuite {

  private def forAll[A](gen: Gen[A], n: Int = 200)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(for { a <- ga; b <- gb } yield (a, b))(Function.tupled(f))

  private val scoredGen: Gen[List[(Double, Long)]] = for {
    n <- Gen.choose(0, 60)
    xs <- Gen.listOfN(n, for {
      s <- Gen.choose(-100, 100).map(_ / 10.0) // coarse grid: forces score ties
      id <- Gen.choose(0L, 30L)
    } yield (s, id))
  } yield xs.distinctBy(_._2) // unique ids, like (cos, b_id) pairs

  private def naiveTopK(xs: List[(Double, Long)], k: Int): List[(Double, Long)] =
    xs.sortBy { case (s, id) => (-s, id) }.take(k)

  test("TopKState.insert equals sort-and-take for any input order") {
    forAll(scoredGen) { xs =>
      val st = new TopKState(5)
      xs.foreach { case (s, id) => st.insert(s, id) }
      val got = (0 until st.n).map(i => (st.cs(i), st.ids(i))).toList
      assert(got == naiveTopK(xs, 5))
    }
  }

  test("TopKState.merge is equivalent to inserting both streams (associativity)") {
    forAll(scoredGen, scoredGen) { (xs0, ys0) =>
      // disjoint ids across the two partitions, as in a real shuffle
      val xs = xs0
      val ys = ys0.map { case (s, id) => (s, id + 1000L) }
      val a = new TopKState(5); xs.foreach { case (s, id) => a.insert(s, id) }
      val b = new TopKState(5); ys.foreach { case (s, id) => b.insert(s, id) }
      var i = 0
      while (i < b.n) { a.insert(b.cs(i), b.ids(i)); i += 1 } // = TopKByScore.merge
      val got = (0 until a.n).map(j => (a.cs(j), a.ids(j))).toList
      assert(got == naiveTopK(xs ++ ys, 5))
    }
  }

  test("TopKByScore serialize/deserialize round-trips any state") {
    forAll(scoredGen) { xs =>
      val st = new TopKState(5)
      xs.foreach { case (s, id) => st.insert(s, id) }
      val agg = org.apache.spark.sql.graft.TopKByScore(null, null, 5)
      val back = agg.deserialize(agg.serialize(st))
      assert(back.k == st.k && back.n == st.n)
      assert((0 until st.n).forall(i => back.cs(i) == st.cs(i) && back.ids(i) == st.ids(i)))
    }
  }

  private val vecsGen: Gen[List[Array[Float]]] = for {
    n <- Gen.choose(1, 20)
    vs <- Gen.listOfN(n, Gen.listOfN(4, Gen.choose(-1000, 1000).map(_ / 100.0f)))
  } yield vs.map(_.toArray)

  test("VectorMean: any partition split merges to the same centroid") {
    forAll(vecsGen, Gen.choose(0, 19)) { (vs, splitRaw) =>
      val split = splitRaw % vs.length
      def reduceAll(part: Seq[Array[Float]]): VecMeanBuf =
        part.foldLeft(VectorMean.zero)((b, v) => VectorMean.reduce(b, v.toSeq))
      val whole = VectorMean.finish(reduceAll(vs))
      val merged = VectorMean.finish(
        VectorMean.merge(reduceAll(vs.take(split)), reduceAll(vs.drop(split))))
      assert(whole.length == merged.length)
      whole.zip(merged).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    }
  }

  test("BinaryDecode PNG round-trip preserves dims and pixel sum for any id") {
    import graft.multimodal.BinaryDecode
    forAll(Gen.choose(0L, 1000000L)) { id =>
      val m = BinaryDecode.decodeOne(id, BinaryDecode.syntheticPng(id))
      val (w, h) = BinaryDecode.syntheticDims(id)
      assert(m.width == w && m.height == h && m.channels == 3)
      assert(m.header_hex == "89504E47")
      val expected = (for (y <- 0 until h; x <- 0 until w) yield {
        val (r, g, b) = BinaryDecode.syntheticPixel(id, x, y)
        (r + g + b).toLong
      }).sum
      assert(m.pix_sum == expected)
    }
  }
}
