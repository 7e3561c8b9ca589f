package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mutable partial state for [[VectorMean]]: element-wise running sums
  * plus the vector count. Sized lazily from the first vector seen. */
case class VecMeanBuf(var sums: Array[Double], var n: Long)

/** SURVEY §2 #30 — the UDAF surface: element-wise mean of fixed-length
  * float vectors (per-label embedding centroid), as a typed
  * `Aggregator` registered through `functions.udaf`.
  *
  * Scale posture: this is an algebraic aggregate — partials are
  * (sum-vector, count) pairs merged associatively, so Spark plans it
  * as partial aggregation before the shuffle (map-side combine): at
  * 100 TB each executor ships one 64-double buffer per label, not its
  * vectors. Float elements are widened to double before accumulation;
  * callers round the finished means (4 dp) when cross-engine identity
  * is required, since summation order is partition-dependent in the
  * last ulp.
  */
object VectorMean extends Aggregator[Seq[Float], VecMeanBuf, Seq[Double]] {

  def zero: VecMeanBuf = VecMeanBuf(Array.emptyDoubleArray, 0L)

  def reduce(b: VecMeanBuf, v: Seq[Float]): VecMeanBuf = {
    if (b.n == 0L) b.sums = new Array[Double](v.length)
    var i = 0
    while (i < v.length) { b.sums(i) += v(i).toDouble; i += 1 }
    b.n += 1L
    b
  }

  def merge(x: VecMeanBuf, y: VecMeanBuf): VecMeanBuf = {
    if (x.n == 0L) y
    else if (y.n == 0L) x
    else {
      var i = 0
      while (i < x.sums.length) { x.sums(i) += y.sums(i); i += 1 }
      x.n += y.n
      x
    }
  }

  def finish(b: VecMeanBuf): Seq[Double] =
    if (b.n == 0L) Seq.empty else b.sums.toSeq.map(_ / b.n)

  def bufferEncoder: Encoder[VecMeanBuf] = Encoders.product[VecMeanBuf]
  def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
}
