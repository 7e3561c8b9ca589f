package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.api.Transforms
import graft.streaming.{EventRow, EventStreams}

/** Scale-shape capabilities: stream-stream interval joins with
  * bounded state, salted joins for skew, bucketed co-located joins
  * without a shuffle. */
class ScaleShapeSpec extends SparkSpec {

  private def ev(id: Long, t: String, user: Long, typ: String): EventRow =
    EventRow(id, Timestamp.valueOf(t), user, typ, 1.0)

  test("stream-stream interval join matches clicks to in-window signups") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val signups = MemoryStream[EventRow]
    val clicks = MemoryStream[EventRow]
    val q = EventStreams.signupClickJoin(signups.toDF(), clicks.toDF())
      .writeStream.format("memory").queryName("t_ss_join")
      .outputMode(OutputMode.Append).start()
    try {
      signups.addData(ev(1, "2024-01-01 10:00:00", user = 7, typ = "signup"))
      clicks.addData(
        ev(2, "2024-01-01 10:20:00", user = 7, typ = "click"),  // in window
        ev(3, "2024-01-01 11:20:00", user = 7, typ = "click"),  // out of window
        ev(4, "2024-01-01 10:30:00", user = 8, typ = "click"))  // other user
      q.processAllAvailable()
      val rows = spark.table("t_ss_join").collect()
      assert(rows.map(_.getAs[Long]("click_id")).toSet == Set(2L))
    } finally q.stop()
  }

  test("salted join returns exactly the plain join's rows") {
    val orders = Tables.orders(spark, sf001)
      .select(col("o_orderkey"), col("o_custkey"))
    val cust = Tables.customer(spark, sf001)
      .select(col("c_custkey"), col("c_mktsegment"))
    val plain = orders.join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_mktsegment"))
    val salted = Transforms.saltedJoin(orders, cust,
        col("o_custkey"), col("c_custkey"), col("o_orderkey"), saltFactor = 4)
      .select(col("o_orderkey"), col("c_mktsegment"))
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    assert(plain.count() > 0 && salted.count() == plain.count())
  }

  test("dynamic partition pruning fires on a partitioned fact join") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    Tables.orders(spark, sf001)
      .withColumn("order_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("order_year").parquet(dir)
    val fact = spark.read.parquet(dir)
    import spark.implicits._
    // dim filtered on a non-partition column; only the join reveals
    // which fact partitions matter -> DPP inserts a runtime filter.
    // The dim must be a file source: a local relation folds the filter
    // away before the PartitionPruning rule can see it.
    val dimDir = java.nio.file.Files.createTempDirectory("graft_dpp_dim").toString
    Seq((1995, "old"), (1996, "old"), (2000, "new"))
      .toDF("dim_year", "era").write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    val joined = fact.join(dim,
        col("order_year") === col("dim_year") && col("era") === "new")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"), plan)
    assert(joined.count() ==
      Tables.orders(spark, sf001).where(year(col("o_orderdate")) === 2000).count())
  }

  test("prefix-sum chunker and packer stay distributed at 1M rows") {
    // 1M rows through chunkByRange/packSequences: the per-bucket data
    // windows run across 200 buckets (no single-partition funnel) and
    // finish in seconds; only B=200 metadata rows see the scan window.
    import spark.implicits._
    val df = spark.range(1000000L).toDF("id")
      .withColumn("w", (col("id") % 97 + 1).cast("long")).repartition(16)
    val chunked = Transforms.chunkByRange(df, col("id"),
      floor(col("id") / 5000).cast("long"), 1000)
    val sizes = chunked.groupBy(col("batch_id")).count()
      .agg(min(col("count")), max(col("count")), count(lit(1))).head
    assert(sizes.getLong(0) == 1000 && sizes.getLong(1) == 1000 &&
           sizes.getLong(2) == 1000) // 1000 exact batches of 1000
    val packed = Transforms.packSequences(df, col("id"),
      floor(col("id") / 5000).cast("long"), col("w"), capacity = 8192L)
    val total = df.agg(sum(col("w"))).head.getLong(0)
    val seqs = packed.agg(countDistinct(col("seq_id")), max(col("seq_token_start"))).head
    // stream length / capacity bounds the sequence count
    assert(math.abs(seqs.getLong(0) - total / 8192) <= 1)
    assert(seqs.getLong(1) < total)
  }

  test("bucketed tables join without a shuffle exchange") {
    val wh = java.nio.file.Files.createTempDirectory("graft_buckets").toString
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.orders(spark, sf001).select(col("o_orderkey"), col("o_custkey"))
        .write.mode("overwrite").bucketBy(4, "o_custkey")
        .sortBy("o_custkey").option("path", s"$wh/orders_b")
        .saveAsTable("orders_bucketed")
      Tables.customer(spark, sf001).select(col("c_custkey"), col("c_mktsegment"))
        .write.mode("overwrite").bucketBy(4, "c_custkey")
        .sortBy("c_custkey").option("path", s"$wh/cust_b")
        .saveAsTable("customer_bucketed")
      val joined = spark.table("orders_bucketed")
        .join(spark.table("customer_bucketed"),
              col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan) // co-located: no shuffle
      assert(joined.count() ==
        Tables.orders(spark, sf001).join(Tables.customer(spark, sf001),
          col("o_custkey") === col("c_custkey")).count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_bucketed")
      spark.sql("DROP TABLE IF EXISTS customer_bucketed")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
