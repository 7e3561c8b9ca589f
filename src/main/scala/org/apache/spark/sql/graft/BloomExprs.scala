package org.apache.spark.sql.graft

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.util.sketch.BloomFilter

/** Column-level access to Spark's OWN runtime-filter machinery
  * ([[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain]],
  * the codegen'd probe that `InjectRuntimeFilter` plants under scans)
  * so a query can apply a bloom-filter semi-join reduction
  * EXPLICITLY: build the filter over the small side once, embed the
  * serialized bits as a literal, and probe with the same xxhash64
  * the build used.
  *
  * Why not a UDF over `org.apache.spark.util.sketch.BloomFilter`: the
  * expression form stays inside whole-stage codegen (the filter
  * deserializes once per task, not per row via closure), and the
  * literal form passes `BloomFilterMightContain`'s constant-bloom
  * type check — it is exactly what Spark's automatic runtime
  * filtering would emit, made available where the optimizer's
  * heuristics won't fire (e.g. a pre-shuffle contamination prune).
  *
  * Lives under `org.apache.spark.sql` for the same reason as
  * [[VectorExprs]]: the Column↔Expression bridge is `private[sql]`.
  *
  * Hash contract: build inserts LONGS (`putLong`, which
  * `DataFrameStatFunctions.bloomFilter` uses for a LongType column)
  * and `mightContain`'s value expression must be LongType — pass
  * `xxhash64(x)` on BOTH sides, never the raw value on one side.
  */
object BloomExprs {

  /** Serialize a built bloom filter into the binary form
    * [[BloomFilterMightContain]] deserializes. */
  def serialize(bf: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** `might_contain(<literal bloom>, hash)` — true if `hash` may be
    * in the set (no false negatives; false-positive rate set at build
    * time). `hash` must be a LongType column (use `xxhash64`). */
  def mightContain(bloomBytes: Array[Byte], hash: Column): Column =
    ExpressionUtils.column(BloomFilterMightContain(
      Literal(bloomBytes), ExpressionUtils.expression(hash)))
}
