package graft

import org.apache.spark.sql.functions._
import graft.ops._

/** Round-15 additions (#262–#263): invariants the DuckDB hash-compare
  * cannot articulate — the VARIANT op's typed-path access agrees with
  * the string-JSON machinery it supersedes and its envelope schema is
  * uniform; the snapshot compaction round-trip preserves content while
  * actually shrinking the layout (file counts live in
  * SnapshotTableSpec, content identity here). */
class Round15OpsSpec extends SparkSpec {

  test("variant extract (#262): partitions the corpus, typed paths agree with get_json_object") {
    val out = ScalarOps.variantExtractAgg(spark, sf001).collect()
    val nEvents = Tables.events(spark, sf001).count()
    assert(out.map(_.getAs[Long]("n")).sum == nEvents,
      "the (k_bucket, etype) cells partition the corpus")
    assert(out.forall { r =>
      val b = r.getAs[Int]("k_bucket"); b >= 0 && b <= 9 })
    val types = Tables.events(spark, sf001)
      .select(col("event_type")).distinct().collect().map(_.getString(0)).toSet
    assert(out.map(_.getAs[String]("etype")).toSet == types,
      "every event type appears")
    // exact-value closure: Σ total_value over cells = the exact
    // decimal corpus total (cents ride longs end-to-end)
    val total = Tables.events(spark, sf001)
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double"))
      .collect()(0).getDouble(0)
    val got = BigDecimal(out.map(r =>
      BigDecimal(r.getAs[Double]("total_value"))).sum.toDouble)
    assert((got - BigDecimal(total)).abs <= BigDecimal("0.01"),
      s"value closure: $got vs $total")
    // the variant path access itself must agree with the string-JSON
    // machinery it supersedes, row by row
    val disagree = Tables.events(spark, sf001)
      .select(
        variant_get(parse_json(col("props")), "$.k", "int").as("vk"),
        get_json_object(col("props"), "$.k").cast("int").as("jk"))
      .where(!(col("vk") <=> col("jk"))).count()
    assert(disagree == 0, "variant_get and get_json_object must agree")
    // envelope schema is uniform across the corpus — the shredding
    // precondition (one physical layout for every row)
    val schemas = Tables.events(spark, sf001)
      .select(schema_of_variant(parse_json(
        concat(lit("{\"meta\":"), col("props"), lit(",\"etype\":\""),
          col("event_type"), lit("\",\"cents\":"),
          (col("value").cast("decimal(18,2)") * 100).cast("long")
            .cast("string"), lit("}")))).as("s"))
      .distinct().collect().map(_.getString(0))
    assert(schemas.length == 1, s"non-uniform variant schema: ${schemas.toSeq}")
    assert(schemas.head.contains("cents") && schemas.head.contains("meta"),
      s"unexpected schema: ${schemas.head}")
  }

  test("snapshot compact (#263): v1 and v2 rows are identical (content-preserving)") {
    val rows = EtlOps.etlSnapshotCompact(spark, sf001).collect()
    assert(rows.length == 2)
    val Array(a, b) = rows
    assert(a.getInt(0) == 1 && b.getInt(0) == 2)
    assert(a.getLong(1) == b.getLong(1), "n_rows preserved")
    assert(a.getDouble(2) == b.getDouble(2), "total preserved exactly")
    assert(a.getLong(3) == b.getLong(3), "updated-row count preserved")
  }
}
