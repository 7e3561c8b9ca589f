package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.pipeline.{EtlPipeline, SchemaValidator}

/** End-to-end pipeline integration: raw CSV → validate → normalize →
  * upsert → partitioned sink, with Luigi-style idempotence. */
class PipelineSpec extends SparkSpec {

  private def writeRawCsv(dir: String, rows: Seq[(Long, String, Long, String, Double)]): Unit = {
    import spark.implicits._
    rows.toDF("reading_id", "ts", "meter_id", "fuel", "value")
      .withColumn("ts", col("ts").cast("timestamp"))
      .coalesce(1).write.mode("overwrite").option("header", "true").csv(dir)
  }

  test("pipeline: quarantine, dedup, unit conversion, partitioned load") {
    val raw = Files.createTempDirectory("graft_raw").toString
    val sink = Files.createTempDirectory("graft_sink").toString + "/readings"
    writeRawCsv(raw, Seq(
      (1L, "2024-01-01 00:00:00", 10L, "electricity", 5.00),
      (2L, "2024-01-01 00:00:00", 10L, "electricity", 5.00),  // dup (meter, ts)
      (3L, "2024-01-01 01:00:00", 10L, "natural_gas", 2.00),  // therms -> kWh
      (4L, "2024-01-02 00:00:00", 11L, "electricity", -1.0),  // negative: quarantine
      (5L, "2024-01-02 01:00:00", 11L, "electricity", 7.25)))
    val s = EtlPipeline.run(spark, raw, sink)
    // 5 in, 1 quarantined, dup (meter 10 @ 00:00) collapsed -> 3 survive
    assert(s == EtlPipeline.Summary(ingested = 5, quarantined = 1, deduped = 3, loaded = 3))
    val out = spark.read.parquet(sink)
    // unit conversion exact: 2.00 therms * 29.3001 = 58.6002 kWh
    val gas = out.where(col("reading_id") === 3).head
    assert(gas.getDecimal(gas.fieldIndex("kwh")).doubleValue() == 58.6002)
    // dup keeps the earliest reading_id
    assert(out.where(col("meter_id") === 10 && col("ts") === "2024-01-01 00:00:00")
      .head.getLong(0) == 1L)
    // date partitions on disk
    val dirs = new java.io.File(sink).listFiles().map(_.getName)
    assert(dirs.exists(_.startsWith("reading_date=2024-01-01")))
    assert(dirs.exists(_.startsWith("reading_date=2024-01-02")))
  }

  test("pipeline re-run is idempotent; delta batch upserts last-write-wins") {
    val raw = Files.createTempDirectory("graft_raw2").toString
    val sink = Files.createTempDirectory("graft_sink2").toString + "/readings"
    writeRawCsv(raw, Seq(
      (1L, "2024-01-01 00:00:00", 10L, "electricity", 5.00),
      (2L, "2024-01-01 01:00:00", 10L, "electricity", 6.00)))
    val first = EtlPipeline.run(spark, raw, sink)
    val again = EtlPipeline.run(spark, raw, sink)
    assert(first.loaded == 2 && again.loaded == 2) // converged
    // delta: reading 2 restated, reading 3 new
    writeRawCsv(raw, Seq(
      (2L, "2024-01-01 01:00:00", 10L, "electricity", 9.99),
      (3L, "2024-01-01 02:00:00", 10L, "electricity", 1.00)))
    val delta = EtlPipeline.run(spark, raw, sink)
    assert(delta.loaded == 3)
    val out = spark.read.parquet(sink)
    val v2 = out.where(col("reading_id") === 2).head
    assert(v2.getDecimal(v2.fieldIndex("kwh")).doubleValue() == 9.99) // new batch won
  }

  test("schema validator fails fast on missing or mistyped columns") {
    import spark.implicits._
    val df = Seq((1L, "x")).toDF("reading_id", "fuel")
    intercept[IllegalArgumentException] {
      SchemaValidator.requireColumns(df,
        Seq("reading_id" -> org.apache.spark.sql.types.LongType,
            "ts" -> org.apache.spark.sql.types.TimestampType))
    }
  }
}
