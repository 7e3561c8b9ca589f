package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-checked loaders for the graded corpus (`/root/testdata/sf*`)
  * plus the decimal-cast helpers every oracle-checked query uses.
  *
  * Determinism rules (SURVEY.md §2) enforced through these helpers:
  *  - money/qty columns are exact 2-decimal doubles at rest; cast to
  *    DECIMAL(18,2) *before* aggregation so sums are exact and
  *    order-independent (raw double sums drift in the last ulp with
  *    shuffle order, breaking cross-engine hash comparison);
  *  - after every decimal multiply, re-cast to a bounded precision so
  *    Spark and DuckDB precision-inference rules can't diverge;
  *  - `events.ts` physical type has drifted across corpus
  *    generations (TIMESTAMP(NANOS) originally; `timestamp[us]` since
  *    the round-8 regeneration), so the loader adapts to the schema it
  *    actually reads instead of assuming one generation:
  *      LongType (NANOS surfaced via
  *      `spark.sql.legacy.parquet.nanosAsLong`) → integer-DIV 1000 to
  *      micros (all corpus ns values are µs-aligned, verified; integer
  *      `DIV`, not `/` — double division of ~1.7e18 ns loses sub-µs
  *      precision in the 53-bit mantissa);
  *      TimestampNTZType (µs, isAdjustedToUTC=false) → cast to
  *      TimestampType (session TZ is UTC everywhere, so the instant is
  *      value-identical and DuckDB's native µs read agrees);
  *      TimestampType → pass through.
  *    Downstream operators always see TimestampType regardless of the
  *    corpus generation on disk.
  *
  * Scale note (100 TB posture): loaders return plain scans — no
  * caching, no repartition — so Catalyst can push filters/projections
  * into the parquet reader of every query that composes them.
  */
object Tables {
  val DEC2: DecimalType = DecimalType(18, 2)

  /** Exact decimal view of a 2-dp money/quantity column. */
  def money(c: Column): Column = c.cast(DEC2)

  /** Bounded re-cast after decimal arithmetic (keeps both engines'
    * precision-inference on the same page; value-exact when the true
    * scale of `c` is <= s). */
  def dec(c: Column, p: Int, s: Int): Column = c.cast(DecimalType(p, s))

  /** Expected column names per table (SURVEY §1.2) — loads fail fast
    * on corpus drift instead of failing obscurely mid-query. Types
    * are left to parquet (they vary only in the documented ns-ts
    * case). */
  private val expectedCols: Map[String, Seq[String]] = Map(
    "region"   -> Seq("r_regionkey", "r_name"),
    "nation"   -> Seq("n_nationkey", "n_name", "n_regionkey"),
    "customer" -> Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
    "supplier" -> Seq("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
    "part"     -> Seq("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"),
    "orders"   -> Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
                      "o_orderdate", "o_orderpriority"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
                      "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
                      "l_linestatus", "l_shipdate"),
    "events"   -> Seq("event_id", "ts", "user_id", "event_type", "value", "props"),
    "documents" -> Seq("doc_id", "text", "lang", "source", "n_chars"),
    "embeddings" -> Seq("vec_id", "embedding", "label"),
  )

  private def read(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    val missing = expectedCols(name).filterNot(df.columns.contains)
    require(missing.isEmpty, s"table $name at $sfDir missing columns: $missing")
    df
  }

  def region(spark: SparkSession, sf: String): DataFrame   = read(spark, sf, "region")
  def nation(spark: SparkSession, sf: String): DataFrame   = read(spark, sf, "nation")
  def customer(spark: SparkSession, sf: String): DataFrame = read(spark, sf, "customer")
  def supplier(spark: SparkSession, sf: String): DataFrame = read(spark, sf, "supplier")
  def part(spark: SparkSession, sf: String): DataFrame     = read(spark, sf, "part")
  def orders(spark: SparkSession, sf: String): DataFrame   = read(spark, sf, "orders")
  def lineitem(spark: SparkSession, sf: String): DataFrame = read(spark, sf, "lineitem")
  def documents(spark: SparkSession, sf: String): DataFrame  = read(spark, sf, "documents")
  def embeddings(spark: SparkSession, sf: String): DataFrame = read(spark, sf, "embeddings")

  /** events with `ts` normalized to TimestampType whatever the corpus
    * generation wrote (see the drift note in the object scaladoc).
    *
    * NOTE: the nanosAsLong conf is set at session build in
    * Verify/Bench/test builders; the runtime set here is a documented
    * defensive fallback for sessions built elsewhere (e.g. the driver's
    * smoke-check session). It intentionally leaks to the session — the
    * conf only changes how NANOS parquet columns are surfaced (as
    * nanosecond longs instead of a hard reader error), so it is safe
    * session-wide and a no-op on µs corpora. */
  def events(spark: SparkSession, sf: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = read(spark, sf, "events")
    val tsCol = df.schema("ts").dataType match {
      case LongType         => timestamp_micros(expr("ts DIV 1000"))
      case TimestampNTZType => col("ts").cast(TimestampType)
      case TimestampType    => col("ts")
      case other =>
        throw new IllegalStateException(
          s"events.ts at $sf has unsupported physical type $other; " +
            "expected ns-long (legacy NANOS), TIMESTAMP_NTZ (us) or TIMESTAMP")
    }
    df.withColumn("ts", tsCol)
  }

  /** Timestamp literal (session TZ is UTC everywhere). */
  def ts(lit0: String): Column = lit(lit0).cast(TimestampType)

  /** Register corpus tables as temp views for SQL-expressed queries
    * (GROUPING SETS, WITHIN GROUP, ... — surfaces the DataFrame API
    * lacks). Idempotent: same name always binds the same definition. */
  def views(spark: SparkSession, sf: String, names: String*): Unit =
    names.foreach {
      case "events" => events(spark, sf).createOrReplaceTempView("events")
      case n        => read(spark, sf, n).createOrReplaceTempView(n)
    }
}
