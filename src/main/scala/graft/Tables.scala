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
  *  - `events.ts` (and potentially any timestamp-kind column:
  *    `o_orderdate`, `l_shipdate`) physical type has drifted across corpus
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
  *    Downstream operators always see TimestampType for every
  *    timestamp-kind column regardless of the corpus generation on
  *    disk — the normalization lives in read(), so every loader gets
  *    it, not just events.
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

  /** The experimentation battery's deterministic two-arm hash coin:
    * arm A ⇔ even first md5 nibble of the user id. ONE definition
    * (review r17: previously restated verbatim at ~14 call sites
    * across AggOps/EtlOps — a salt/nibble/parity change had to land
    * everywhere at once or one op's arms silently desynchronized
    * from the rest of the battery). The mod-3 sibling for k-sample
    * tests is AggOps.arm3. Every oracle spells the same expression
    * in SQL: ascii(substring(md5(CAST(user_id AS VARCHAR)), 1, 1)) % 2. */
  def expArm2IsA: Column =
    ascii(substring(md5(col("user_id").cast("string")), 1, 1)) % 2 === 0

  /** Process-lifetime scratch registry (review r17): ONE shutdown
    * hook draining a concurrent queue, replacing two inconsistent
    * policies — a fresh hook Thread per snapshot fixture, and no
    * cleanup at all for the scan/join fixture sinks, which leaked a
    * fact-table-sized directory per invocation into java.io.tmpdir
    * across every round. Registration is thread-safe and idempotent
    * per path; deletion is best-effort at JVM exit (each bench/verify
    * JVM cleans everything it wrote). */
  private val scratchPaths =
    new java.util.concurrent.ConcurrentLinkedQueue[String]()
  private lazy val scratchHookInstalled: Unit = {
    sys.addShutdownHook {
      scratchPaths.forEach(p => deleteRecursively(new java.io.File(p)))
    }
    ()
  }
  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(): Unit
  }
  /** Register `path` for best-effort recursive deletion at JVM exit;
    * returns it for inline use. */
  def registerScratch(path: String): String = {
    scratchHookInstalled
    scratchPaths.add(path)
    path
  }

  /** Column KINDS a physical type may drift within without breaking
    * the engine — the round-8 corpus regeneration moved timestamps
    * between encodings while every query's semantics were unchanged,
    * so the load-time contract checks names + kind, not exact parquet
    * types. A drift OUTSIDE its kind (e.g. ts becoming a string)
    * fails at load with one message naming the table/column/type,
    * instead of 30 analysis errors deep inside operators. */
  private sealed trait Kind { def ok(t: DataType): Boolean }
  private case object KInt extends Kind {          // any integral
    def ok(t: DataType): Boolean = t match {
      case ByteType | ShortType | IntegerType | LongType => true; case _ => false }
  }
  private case object KNum extends Kind {          // any numeric
    def ok(t: DataType): Boolean = t.isInstanceOf[NumericType]
  }
  private case object KStr extends Kind {
    def ok(t: DataType): Boolean = t == StringType
  }
  private case object KTs extends Kind {           // the documented ts drift set
    // Exactly the encodings read() can normalize to TimestampType.
    // DateType is deliberately NOT admitted: no corpus generation has
    // written dates, and admitting a type the normalizer can't handle
    // would defeat the fail-fast contract (load would pass, then date
    // arithmetic would break deep inside operators).
    def ok(t: DataType): Boolean = t match {
      case TimestampType | TimestampNTZType => true
      case LongType => true                        // legacy NANOS read as ns-long
      case _ => false }
  }
  private case object KNumArr extends Kind {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(e, _) => e.isInstanceOf[NumericType]; case _ => false }
  }

  /** Expected columns per table (SURVEY §1.2) — loads fail fast on
    * corpus drift instead of failing obscurely mid-query. */
  private val expectedCols: Map[String, Seq[(String, Kind)]] = Map(
    "region"   -> Seq("r_regionkey" -> KInt, "r_name" -> KStr),
    "nation"   -> Seq("n_nationkey" -> KInt, "n_name" -> KStr, "n_regionkey" -> KInt),
    "customer" -> Seq("c_custkey" -> KInt, "c_name" -> KStr, "c_nationkey" -> KInt,
                      "c_acctbal" -> KNum, "c_mktsegment" -> KStr),
    "supplier" -> Seq("s_suppkey" -> KInt, "s_name" -> KStr, "s_nationkey" -> KInt,
                      "s_acctbal" -> KNum),
    "part"     -> Seq("p_partkey" -> KInt, "p_name" -> KStr, "p_brand" -> KStr,
                      "p_type" -> KStr, "p_size" -> KInt, "p_retailprice" -> KNum),
    "orders"   -> Seq("o_orderkey" -> KInt, "o_custkey" -> KInt, "o_orderstatus" -> KStr,
                      "o_totalprice" -> KNum, "o_orderdate" -> KTs,
                      "o_orderpriority" -> KStr),
    "lineitem" -> Seq("l_orderkey" -> KInt, "l_partkey" -> KInt, "l_suppkey" -> KInt,
                      "l_linenumber" -> KInt, "l_quantity" -> KNum,
                      "l_extendedprice" -> KNum, "l_discount" -> KNum, "l_tax" -> KNum,
                      "l_returnflag" -> KStr, "l_linestatus" -> KStr,
                      "l_shipdate" -> KTs),
    "events"   -> Seq("event_id" -> KInt, "ts" -> KTs, "user_id" -> KInt,
                      "event_type" -> KStr, "value" -> KNum, "props" -> KStr),
    "documents" -> Seq("doc_id" -> KInt, "text" -> KStr, "lang" -> KStr,
                       "source" -> KStr, "n_chars" -> KInt),
    "embeddings" -> Seq("vec_id" -> KInt, "embedding" -> KNumArr, "label" -> KInt),
  )

  private def read(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val expect = expectedCols(name)
    // nanosAsLong must be set BEFORE the scan is planned or a legacy
    // TIMESTAMP(NANOS) column is a hard reader error; no-op on µs
    // corpora and safe session-wide (see events scaladoc note).
    if (expect.exists(_._2 == KTs))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    val problems = expect.flatMap { case (c, kind) =>
      df.schema.find(_.name == c) match {
        case None    => Some(s"$c: missing")
        case Some(f) if !kind.ok(f.dataType) =>
          Some(s"$c: ${f.dataType.simpleString} outside expected kind $kind")
        case _ => None
      }
    }
    require(problems.isEmpty,
      s"table $name at $sfDir drifted from the SURVEY §1.2 contract — ${problems.mkString("; ")}")
    // Normalize EVERY KTs column to TimestampType, whatever encoding
    // this corpus generation wrote. Per-kind, not per-table: the
    // round-8 regeneration drifted events.ts, and o_orderdate /
    // l_shipdate can drift the same way, so they get the same cure.
    val drifted = expect.collect {
      case (c, KTs) if df.schema(c).dataType != TimestampType => c
    }
    drifted.foldLeft(df) { (d, c) =>
      d.schema(c).dataType match {
        case LongType         => d.withColumn(c, timestamp_micros(expr(s"`$c` DIV 1000")))
        case TimestampNTZType => d.withColumn(c, col(c).cast(TimestampType))
        case _                => d // unreachable: the kind check admits nothing else
      }
    }
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

  /** events with `ts` normalized to TimestampType by read() — the
    * normalization is generic over every KTs column now, so events is
    * a plain delegate like the other loaders.
    *
    * NOTE on nanosAsLong: read() sets it for any table with a KTs
    * column; the session builders in Verify/Bench/tests also set it.
    * It intentionally leaks to the session — the conf only changes how
    * NANOS parquet columns are surfaced (as nanosecond longs instead
    * of a hard reader error), so it is safe session-wide and a no-op
    * on µs corpora. */
  def events(spark: SparkSession, sf: String): DataFrame = read(spark, sf, "events")

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
