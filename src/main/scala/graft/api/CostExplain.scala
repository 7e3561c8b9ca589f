package graft.api

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.types._

/** User-facing cost/statistics readout — the ANALYZE surface the
  * library lacked (VERDICT r15 "what's missing" #3): plans were
  * dumped (PLANS.md) and contract-swept (PlanContractSpec), but a
  * user had no way to ask "what does the optimizer THINK this costs,
  * and which joins will broadcast?" without reading tree dumps.
  *
  * Three readouts, all driver-cheap (they walk the already-planned
  * logical tree or the catalog — no data pass except `analyze`,
  * which runs Spark's own ANALYZE TABLE machinery). Note: Spark
  * gates rowCount/column-stat PROPAGATION into plan statistics on
  * `spark.sql.cbo.enabled` (or planStatsEnabled) — collect with
  * [[analyze]] any time, but enable CBO to see row counts in
  * [[nodeStats]]:
  *
  *  - [[nodeStats]]: one row per optimized-plan node with Catalyst's
  *    own Statistics (sizeInBytes, rowCount when the CBO/stats
  *    propagation knows it) — the per-node cost model readout.
  *  - [[joinAdvisory]]: one row per join with both sides' size
  *    estimates and whether the CURRENT autoBroadcastJoinThreshold
  *    lets a side broadcast — the "is this join a shuffle at 100 TB"
  *    screen a user runs before submitting.
  *  - [[analyze]]: materialize a DataFrame as a catalog table, run
  *    `ANALYZE TABLE ... COMPUTE STATISTICS FOR ALL COLUMNS` (Spark's
  *    real CBO stats collection, one distributed pass), and return
  *    the collected column stats (ndv/nulls/min/max/avg-len) from
  *    the catalog — making subsequent plans over that table
  *    stats-informed rather than size-guessed.
  *
  * Scale posture: nodeStats/joinAdvisory are pure driver metadata
  * (plan-tree walks); analyze is ONE distributed aggregate, the same
  * pass Spark itself runs for CBO, and should be scheduled like any
  * stats collection (off-peak, per-partition incremental at 100 TB).
  */
object CostExplain {

  private val nodeSchema = StructType(Seq(
    StructField("node_id", IntegerType, nullable = false),
    StructField("node", StringType, nullable = false),
    StructField("detail", StringType, nullable = false),
    StructField("size_bytes", LongType, nullable = false),
    StructField("row_count", LongType, nullable = true)))

  /** Per-node optimizer statistics of `df`'s OPTIMIZED logical plan,
    * pre-order (node 0 = root). sizeInBytes is Catalyst's own
    * estimate (exact file sizes at scans, propagated upward);
    * row_count is null unless stats (CBO/ANALYZE or an exact local
    * relation) pin it. */
  def nodeStats(df: DataFrame): DataFrame = {
    val plan = df.queryExecution.optimizedPlan
    val rows = scala.collection.mutable.ArrayBuffer.empty[Row]
    var id = 0
    def visit(p: LogicalPlan): Unit = {
      val st = p.stats
      rows += Row(id, p.nodeName,
        p.simpleString(maxFields = 8).take(160),
        st.sizeInBytes.min(BigInt(Long.MaxValue)).toLong,
        st.rowCount.map(_.min(BigInt(Long.MaxValue)).toLong).orNull)
      id += 1
      p.children.foreach(visit)
    }
    visit(plan)
    df.sparkSession.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows.toSeq).asJava), nodeSchema)
  }

  private val joinSchema = StructType(Seq(
    StructField("join_id", IntegerType, nullable = false),
    StructField("join_type", StringType, nullable = false),
    StructField("left_size_bytes", LongType, nullable = false),
    StructField("right_size_bytes", LongType, nullable = false),
    StructField("threshold_bytes", LongType, nullable = false),
    StructField("broadcast_left", BooleanType, nullable = false),
    StructField("broadcast_right", BooleanType, nullable = false),
    StructField("advisory", StringType, nullable = false)))

  /** Per-join broadcastability advisory for `df`'s optimized plan
    * under the session's CURRENT autoBroadcastJoinThreshold: which
    * side (if either) is small enough to broadcast, and the plain-
    * words consequence ("broadcasts" vs "shuffles both sides"). */
  def joinAdvisory(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    // Spark's own conf parser: accepts bare bytes plus the full
    // k/kb/m/mb/g/gb/t/tb suffix family case-insensitively, so
    // session values like "10MB" (the Spark-docs spelling) don't
    // crash this user-facing advisory. JavaUtils rejects negatives,
    // and "-1" is the STANDARD way to disable broadcast joins —
    // Spark's conf layer strips the sign before delegating, so this
    // call site must too (review r17; a negative threshold means
    // "never broadcast", which the > 0 guards below already encode).
    val threshold = {
      val raw = spark.conf
        .get("spark.sql.autoBroadcastJoinThreshold", "10485760").trim
      if (raw.startsWith("-"))
        -org.apache.spark.network.util.JavaUtils.byteStringAsBytes(raw.substring(1))
      else org.apache.spark.network.util.JavaUtils.byteStringAsBytes(raw)
    }
    val rows = scala.collection.mutable.ArrayBuffer.empty[Row]
    var id = 0
    df.queryExecution.optimizedPlan.foreach {
      case j: Join =>
        val ls = j.left.stats.sizeInBytes.min(BigInt(Long.MaxValue)).toLong
        val rs = j.right.stats.sizeInBytes.min(BigInt(Long.MaxValue)).toLong
        val bl = threshold > 0 && ls <= threshold
        val br = threshold > 0 && rs <= threshold
        val advisory =
          if (br) "broadcasts right side"
          else if (bl) "broadcasts left side"
          else "shuffles both sides (no side under threshold)"
        rows += Row(id, j.joinType.toString, ls, rs, threshold, bl, br,
          advisory)
        id += 1
      case _ => ()
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows.toSeq).asJava), joinSchema)
  }

  private val colSchema = StructType(Seq(
    StructField("column", StringType, nullable = false),
    StructField("distinct_count", LongType, nullable = true),
    StructField("null_count", LongType, nullable = true),
    StructField("avg_len", LongType, nullable = true),
    StructField("max_len", LongType, nullable = true),
    StructField("min_value", StringType, nullable = true),
    StructField("max_value", StringType, nullable = true)))

  /** Materialize `df` as catalog table `table` (overwriting), run
    * Spark's `ANALYZE TABLE … COMPUTE STATISTICS FOR ALL COLUMNS`
    * (one distributed stats pass), and return the collected
    * per-column statistics from the catalog. After this call, plans
    * reading `table` carry exact rowCount + column NDVs — the CBO
    * inputs — instead of file-size guesses. */
  def analyze(spark: SparkSession, df: DataFrame, table: String): DataFrame = {
    df.write.mode("overwrite").saveAsTable(table)
    spark.sql(s"ANALYZE TABLE $table COMPUTE STATISTICS FOR ALL COLUMNS")
    val meta = spark.sessionState.catalog
      .getTableMetadata(TableIdentifier(table))
    val colStats = meta.stats.map(_.colStats).getOrElse(Map.empty)
    val rows = df.schema.fieldNames.toSeq.map { name =>
      colStats.get(name) match {
        case Some(cs) => Row(name,
          cs.distinctCount.map(_.toLong).orNull,
          cs.nullCount.map(_.toLong).orNull,
          cs.avgLen.map(_.toLong).orNull,
          cs.maxLen.map(_.toLong).orNull,
          cs.min.orNull, cs.max.orNull)
        case None => Row(name, null, null, null, null, null, null)
      }
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava), colSchema)
  }

  /** The catalog-level table statistics (total size + row count)
    * collected by [[analyze]], as (size_bytes, row_count). */
  def tableStats(spark: SparkSession, table: String): Option[(Long, Option[Long])] =
    spark.sessionState.catalog.getTableMetadata(TableIdentifier(table))
      .stats.map(s => (s.sizeInBytes.toLong, s.rowCount.map(_.toLong)))
}
