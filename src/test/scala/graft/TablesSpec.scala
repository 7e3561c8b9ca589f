package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loader contract tests: the corpus regenerates between rounds and has
  * already drifted its timestamp encoding once (TIMESTAMP(NANOS) →
  * timestamp[us] in round 8, which broke 34 operators at analysis
  * time). These cases pin the guarantees that recovery relied on:
  *  - `Tables.events` yields identical TimestampType values whichever
  *    documented encoding is on disk (ns-long legacy, µs NTZ, µs UTC);
  *  - a drift OUTSIDE the allowed kind set fails AT LOAD with a
  *    message naming the table and column, not deep inside a query.
  */
class TablesSpec extends SparkSpec {

  /** A tiny events table with deterministic µs-aligned instants. */
  private def sampleRows: Seq[(Long, Long, Long, String, Double, String)] =
    (0L until 10L).map { i =>
      // 2024-01-01T00:00:00Z plus i minutes and i microseconds
      val us = 1704067200000000L + i * 60000000L + i
      (i, us, i % 3, s"type${i % 2}", i * 1.5, s"""{"k":$i}""")
    }

  /** Write the sample as events.parquet under a fresh dir with `ts`
    * encoded by `enc`, returning the dir usable as an sfDir. */
  private def writeEvents(enc: String): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(s"tables_spec_$enc").toString
    val base = sampleRows.toDF("event_id", "us", "user_id", "event_type", "value", "props")
    val ts = enc match {
      case "ns_long" => (col("us") * 1000L).as("ts")                       // legacy NANOS surfaced as ns-long
      case "us_ntz"  => timestamp_micros(col("us")).cast(TimestampNTZType).as("ts")
      case "us_utc"  => timestamp_micros(col("us")).as("ts")
    }
    base.select(col("event_id"), ts, col("user_id"), col("event_type"),
        col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def loaded(dir: String): Seq[(Long, Long)] =
    Tables.events(spark, dir)
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted

  test("events loader: all three ts encodings load to identical TimestampType instants") {
    val expected = sampleRows.map(r => (r._1, r._2)).sorted
    for (enc <- Seq("ns_long", "us_ntz", "us_utc")) {
      val df: DataFrame = Tables.events(spark, writeEvents(enc))
      assert(df.schema("ts").dataType == TimestampType, s"enc=$enc")
      assert(loaded(writeEvents(enc)) == expected, s"enc=$enc")
    }
  }

  test("events loader: a ts drift outside the kind set fails at load, naming the column") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tables_spec_bad").toString
    sampleRows.toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .select(col("event_id"), col("us").cast("string").as("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalArgumentException](Tables.events(spark, dir))
    assert(e.getMessage.contains("events"), e.getMessage)
    assert(e.getMessage.contains("ts"), e.getMessage)
  }

  test("events loader: DateType ts is rejected at load like any other kind drift") {
    // DateType is outside KTs (the normalizer can't recover an instant
    // from a date), so it must fail with the same require-based
    // IllegalArgumentException as any contract drift — not a separate
    // exception type deeper in the loader.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tables_spec_date").toString
    sampleRows.toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .select(col("event_id"), timestamp_micros(col("us")).cast(DateType).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalArgumentException](Tables.events(spark, dir))
    assert(e.getMessage.contains("events"), e.getMessage)
    assert(e.getMessage.contains("ts"), e.getMessage)
  }

  test("KTs normalization is generic: drifted o_orderdate encodings load as TimestampType") {
    // The round-8 drift hit events.ts; if a future regeneration does
    // the same to orders/lineitem timestamps, the SAME normalization
    // must apply (ADVICE r9: previously only events normalized, so an
    // ns-long o_orderdate would pass the load contract then break
    // date arithmetic downstream).
    import spark.implicits._
    val us0 = 1704067200000000L // 2024-01-01T00:00:00Z
    for (enc <- Seq("ns_long", "us_ntz", "us_utc")) {
      val dir = java.nio.file.Files.createTempDirectory(s"tables_spec_ord_$enc").toString
      val base = Seq((1L, 1L, "O", 10.0, us0, "1-URGENT"))
        .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "us", "o_orderpriority")
      val od = enc match {
        case "ns_long" => (col("us") * 1000L).as("o_orderdate")
        case "us_ntz"  => timestamp_micros(col("us")).cast(TimestampNTZType).as("o_orderdate")
        case "us_utc"  => timestamp_micros(col("us")).as("o_orderdate")
      }
      base.select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"), od, col("o_orderpriority"))
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
      val df = Tables.orders(spark, dir)
      assert(df.schema("o_orderdate").dataType == TimestampType, s"enc=$enc")
      val got = df.select(unix_micros(col("o_orderdate"))).collect()(0).getLong(0)
      assert(got == us0, s"enc=$enc got=$got")
    }
  }

  test("loader contract: a missing column fails at load with the table named") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tables_spec_miss").toString
    Seq((1, "AFRICA")).toDF("r_regionkey", "wrong_name")
      .write.mode("overwrite").parquet(s"$dir/region.parquet")
    val e = intercept[IllegalArgumentException](Tables.region(spark, dir))
    assert(e.getMessage.contains("region"), e.getMessage)
    assert(e.getMessage.contains("r_name"), e.getMessage)
  }

  test("graded corpus passes the kind contract for every table") {
    for (sf <- Seq(sf001, sf01)) {
      Seq(Tables.region(spark, sf), Tables.nation(spark, sf),
        Tables.customer(spark, sf), Tables.supplier(spark, sf),
        Tables.part(spark, sf), Tables.orders(spark, sf),
        Tables.lineitem(spark, sf), Tables.events(spark, sf),
        Tables.documents(spark, sf), Tables.embeddings(spark, sf))
        .foreach(df => assert(df.columns.nonEmpty))
    }
  }
}
