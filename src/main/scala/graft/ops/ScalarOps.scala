package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.Tables._

/** SURVEY §2.H — scalar function families (#43–#50), one query per
  * family exercising it end-to-end.
  *
  * Scale posture: all narrow, codegen'd expressions over the scan —
  * zero shuffles except where a final aggregate is part of the query.
  * Built-in `functions._` everywhere except #50, which deliberately
  * demonstrates the UDF surface (and documents why built-ins are
  * preferred: a Scala UDF is an opaque black box to Catalyst — no
  * pushdown through it, serialization per row, no codegen fusion).
  *
  * Cross-engine notes: regexes stay POSIX-simple; date arithmetic
  * sticks to year/month/date_trunc/add_months/last_day (verified
  * identical semantics); transcendentals round to 4 dp (JVM vs libm
  * last-ulp drift).
  */
object ScalarOps {

  /** #43 — string functions: case, substring, length, pad, concat,
    * replace, split + element access. */
  def strFuncs(spark: SparkSession, sf: String): DataFrame =
    customer(spark, sf)
      .where(col("c_custkey") % 7 === 0)
      .select(col("c_custkey"),
        upper(col("c_mktsegment")).as("seg_upper"),
        lower(col("c_name")).as("name_lower"),
        substring(col("c_name"), 1, 8).as("name_prefix"),
        length(col("c_name")).cast("long").as("name_len"),
        lpad(col("c_custkey").cast("string"), 9, "0").as("key_padded"),
        concat_ws("-", col("c_mktsegment"), col("c_name")).as("seg_name"),
        regexp_replace(col("c_name"), "Customer", "Cust").as("name_short"),
        split(col("c_name"), "#").getItem(1).as("name_num"))
      .orderBy(col("c_custkey"))

  /** #44 — regular expressions: extract, replace, filter (POSIX-simple
    * patterns only, for cross-engine identity). */
  def strRegexp(spark: SparkSession, sf: String): DataFrame =
    nation(spark, sf)
      .where(col("n_name").rlike("[0-9]$"))
      .select(col("n_nationkey"), col("n_name"),
        regexp_extract(col("n_name"), "([0-9]+)", 1).as("nation_num"),
        regexp_replace(col("n_name"), "_", " ").as("name_spaced"))
      .orderBy(col("n_nationkey"))

  /** #45 — datetime functions over order dates (reference heritage:
    * baseline/reporting period arithmetic on UTC timestamps). */
  def dateFuncs(spark: SparkSession, sf: String): DataFrame =
    orders(spark, sf)
      .where(col("o_orderkey") % 11 === 0)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).as("order_year"),
        month(col("o_orderdate")).as("order_month"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        datediff(col("o_orderdate"), ts("1995-01-01")).as("days_since_95"),
        add_months(col("o_orderdate"), 3).cast("timestamp").as("plus_3m"),
        last_day(col("o_orderdate")).cast("timestamp").as("month_end"))
      .orderBy(col("o_orderkey"))

  /** #46 — math functions (exact on ints/decimals; transcendentals
    * rounded 4 dp). */
  def mathFuncs(spark: SparkSession, sf: String): DataFrame =
    part(spark, sf)
      .where(col("p_partkey") % 5 === 0)
      .select(col("p_partkey"),
        abs(col("p_size") - 25).as("size_dev"),
        ceil(col("p_retailprice")).as("price_ceil"),
        floor(col("p_retailprice")).as("price_floor"),
        (col("p_partkey") % 7).as("key_mod7"),
        pow(col("p_size"), 2).cast("long").as("size_sq"),
        round(sqrt(col("p_size")), 4).as("size_sqrt"),
        round(log(col("p_retailprice")), 4).as("price_ln"),
        round(exp(col("p_size") / lit(25.0)), 4).as("size_exp"))
      .orderBy(col("p_partkey"))

  /** #47 — array higher-order functions over embeddings: size,
    * element access, slice, min/max, filter, transform. The head3
    * slice is serialized to a comma-joined DECIMAL(12,4) string for
    * the graded projection (the driver's comparator can't hash raw
    * array cells; both engines render scale-4 decimals identically). */
  def arrayFuncs(spark: SparkSession, sf: String): DataFrame =
    embeddings(spark, sf)
      .where(col("vec_id") % 4 === 0)
      .select(col("vec_id"),
        size(col("embedding")).as("dim"),
        round(element_at(col("embedding"), 1).cast("double"), 4).as("first_val"),
        round(array_max(col("embedding")).cast("double"), 4).as("max_val"),
        round(array_min(col("embedding")).cast("double"), 4).as("min_val"),
        size(filter(col("embedding"), x => x > 0)).as("n_positive"),
        concat_ws(",",
          transform(slice(col("embedding"), 1, 3),
            x => round(x.cast("double"), 4)
              .cast(org.apache.spark.sql.types.DecimalType(12, 4))))
          .as("head3"))
      .orderBy(col("vec_id"))

  /** #48 — map/struct construction: per-source lang→count map built
    * from collected structs, then exploded back to sorted entries
    * (map iteration order is engine-specific, entry rows are not). */
  def mapStructFuncs(spark: SparkSession, sf: String): DataFrame = {
    val entries = documents(spark, sf)
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("source"))
      .agg(map_from_entries(collect_list(struct(col("lang"), col("n")))).as("lang_map"))
    entries
      .select(col("source"), explode(col("lang_map")).as(Seq("lang", "n_docs")))
      .orderBy(col("source"), col("lang"))
  }

  /** #49 — JSON functions: parse, extract, aggregate by extracted key
    * (reference heritage: API payload handling). */
  def jsonFuncs(spark: SparkSession, sf: String): DataFrame =
    events(spark, sf)
      .select(get_json_object(col("props"), "$.k").cast("int").as("k"),
              col("event_type"))
      .where(col("k") < 10)
      .groupBy(col("k"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("k"), col("event_type"))

  /** #262 — VARIANT semi-structured access (round 15; the
    * open-format semi-structured column Spark 4 / Delta / Iceberg v3
    * ship as the successor of string-JSON handling): parse ONCE into
    * the binary VARIANT encoding with `parse_json`, then typed-path
    * access via `variant_get` WITHOUT re-parsing per field. The op
    * builds a nested JSON document per event (the raw `props` object
    * wrapped in a typed envelope), parses it to a VariantType column,
    * projects three typed paths (an int through the nested object, a
    * string, an exact integer cents amount) and aggregates per
    * (k-bucket, event type). At 100 TB the win over #49's
    * `get_json_object` is structural: one parse per row at ingest (or
    * none with shredded VARIANT storage), then codegen'd byte-offset
    * field access — vs a full string re-parse PER EXTRACTED FIELD.
    * Exactness: the amount rides DECIMAL(18,2)·100 longs, double only
    * at display. Oracle: DuckDB builds the identical document and
    * extracts with its JSON functions — VARIANT is an encoding, not a
    * semantics change, so the hashes must match. */
  def variantExtractAgg(spark: SparkSession, sf: String): DataFrame =
    variantExtractCounts(events(spark, sf))
      .orderBy(col("k_bucket"), col("etype"))

  /** The #262 pipeline minus the batch-only final sort — shared with
    * StreamingSpec's chunked-replay proof (round 16, VERDICT r15 ask
    * 6): the identical parse_json → variant_get → groupBy tree runs
    * under a Complete-mode streaming aggregation, so the two surfaces
    * cannot drift. Works on any relation with (props, event_type,
    * value) columns, batch or streaming. */
  private[graft] def variantExtractCounts(ev: DataFrame): DataFrame = {
    val cents = (money(col("value")) * 100).cast("long")
    val doc = concat(lit("{\"meta\":"), col("props"),
      lit(",\"etype\":\""), col("event_type"),
      lit("\",\"cents\":"), cents.cast("string"), lit("}"))
    ev.select(parse_json(doc).as("v"))
      .select(
        variant_get(col("v"), "$.meta.k", "int").as("k"),
        variant_get(col("v"), "$.etype", "string").as("etype"),
        variant_get(col("v"), "$.cents", "long").as("cents"))
      .groupBy((col("k") % 10).as("k_bucket"), col("etype"))
      .agg(count(lit(1)).as("n"),
           (sum(col("cents")).cast("double") / 100.0).as("total_value"))
  }

  /** #50 — the UDF surface: a pure Scala string transform registered
    * via `udf()`. Kept deliberately trivial — the documented guidance
    * is "built-ins first" (see object scaladoc); this exists to prove
    * the extension point works. */
  def udfScalar(spark: SparkSession, sf: String): DataFrame = {
    val revUpper = udf((s: String) => if (s == null) null else s.toUpperCase.reverse)
    supplier(spark, sf)
      .select(col("s_suppkey"), col("s_name"),
              revUpper(col("s_name")).as("name_rev_upper"))
      .orderBy(col("s_suppkey"))
  }

  /** #161 — try_cast salvage semantics (round 7): ingest a MIXED
    * string column (numeric user ids, except `error` events carry
    * their raw props JSON — unparseable as an integer) and measure
    * the salvage rate per event type. `try_cast` turns the malformed
    * values into nulls instead of failing the job — the ANSI-mode
    * dirty-feed ingestion pattern (a plain CAST under ANSI SQL would
    * kill the whole stage on the first bad row at 100 TB); the
    * n_parsed / n_rows ratio is the DQ parse-rate signal #132's rule
    * engine would consume. Narrow, codegen'd, zero extra passes. */
  def scalarTryCast(spark: SparkSession, sf: String): DataFrame =
    events(spark, sf)
      .select(col("event_type"),
        when(col("event_type") === "error", col("props"))
          .otherwise(col("user_id").cast("string")).as("raw"))
      .select(col("event_type"), expr("try_cast(raw AS BIGINT)").as("parsed"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_rows"),
           count(col("parsed")).as("n_parsed"),
           sum(col("parsed")).as("parsed_sum"))
      .orderBy(col("event_type"))

  /** #162 — edit-distance fuzzy matching (round 7): `levenshtein`
    * over an id-adjacent pair join (customer k vs k+1 — a
    * deterministic, LINEAR pair set; production fuzzy dedup feeds
    * this scorer from #60/#72's banded candidates, never all pairs),
    * aggregated into a distance histogram. The zero-padded name
    * format means adjacent ids differ in few digit positions, so the
    * histogram is concentrated — the residual-scoring stage of a
    * name-matching pipeline with its candidate generation stubbed by
    * the key join. */
  def strFuzzyMatch(spark: SparkSession, sf: String): DataFrame = {
    val a = customer(spark, sf).select(col("c_custkey").as("k1"), col("c_name").as("n1"))
    val b = customer(spark, sf).select(col("c_custkey").as("k2"), col("c_name").as("n2"))
    a.join(b, col("k2") === col("k1") + 1)
      .select(levenshtein(col("n1"), col("n2")).cast("long").as("edit_dist"))
      .groupBy(col("edit_dist"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("edit_dist"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = ListMap(
    "str_funcs"        -> (strFuncs _),
    "str_regexp"       -> (strRegexp _),
    "date_funcs"       -> (dateFuncs _),
    "math_funcs"       -> (mathFuncs _),
    "array_funcs"      -> (arrayFuncs _),
    "map_struct_funcs" -> (mapStructFuncs _),
    "json_funcs"       -> (jsonFuncs _),
    "variant_extract_agg" -> (variantExtractAgg _),
    "udf_scalar"       -> (udfScalar _),
    "scalar_try_cast"  -> (scalarTryCast _),
    "str_fuzzy_match"  -> (strFuzzyMatch _),
  )

  val oracle: Map[String, String] = ListMap(
    "str_funcs" ->
      """SELECT c_custkey,
        |  upper(c_mktsegment) AS seg_upper,
        |  lower(c_name) AS name_lower,
        |  substr(c_name, 1, 8) AS name_prefix,
        |  length(c_name) AS name_len,
        |  lpad(CAST(c_custkey AS VARCHAR), 9, '0') AS key_padded,
        |  concat_ws('-', c_mktsegment, c_name) AS seg_name,
        |  regexp_replace(c_name, 'Customer', 'Cust') AS name_short,
        |  string_split(c_name, '#')[2] AS name_num
        |FROM customer WHERE c_custkey % 7 = 0 ORDER BY c_custkey""".stripMargin,
    "str_regexp" ->
      """SELECT n_nationkey, n_name,
        |  regexp_extract(n_name, '([0-9]+)', 1) AS nation_num,
        |  regexp_replace(n_name, '_', ' ') AS name_spaced
        |FROM nation WHERE regexp_matches(n_name, '[0-9]$')
        |ORDER BY n_nationkey""".stripMargin,
    "date_funcs" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INT) AS order_year,
        |  CAST(month(o_orderdate) AS INT) AS order_month,
        |  date_trunc('month', o_orderdate) AS month_start,
        |  CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INT)
        |    AS days_since_95,
        |  o_orderdate + INTERVAL 3 MONTH AS plus_3m,
        |  CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end
        |FROM orders WHERE o_orderkey % 11 = 0 ORDER BY o_orderkey""".stripMargin,
    "math_funcs" ->
      """SELECT p_partkey,
        |  abs(p_size - 25) AS size_dev,
        |  CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
        |  CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
        |  p_partkey % 7 AS key_mod7,
        |  CAST(pow(p_size, 2) AS BIGINT) AS size_sq,
        |  round(sqrt(p_size), 4) AS size_sqrt,
        |  round(ln(p_retailprice), 4) AS price_ln,
        |  round(exp(p_size / 25.0), 4) AS size_exp
        |FROM part WHERE p_partkey % 5 = 0 ORDER BY p_partkey""".stripMargin,
    "array_funcs" ->
      """SELECT vec_id,
        |  CAST(len(embedding) AS INT) AS dim,
        |  round(CAST(embedding[1] AS DOUBLE), 4) AS first_val,
        |  round(CAST(list_max(embedding) AS DOUBLE), 4) AS max_val,
        |  round(CAST(list_min(embedding) AS DOUBLE), 4) AS min_val,
        |  CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_positive,
        |  array_to_string(list_transform(embedding[1:3],
        |    x -> CAST(CAST(round(CAST(x AS DOUBLE), 4) AS DECIMAL(12,4)) AS VARCHAR)),
        |    ',') AS head3
        |FROM embeddings WHERE vec_id % 4 = 0 ORDER BY vec_id""".stripMargin,
    "map_struct_funcs" ->
      """SELECT source, lang, count(*) AS n_docs
        |FROM documents GROUP BY source, lang ORDER BY source, lang""".stripMargin,
    "json_funcs" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k,
        |  event_type, count(*) AS n
        |FROM events
        |WHERE CAST(json_extract_string(props, '$.k') AS INT) < 10
        |GROUP BY k, event_type ORDER BY k, event_type""".stripMargin,
    "variant_extract_agg" ->
      """WITH d AS (
        |  SELECT '{"meta":' || props || ',"etype":"' || event_type
        |    || '","cents":'
        |    || CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
        |            AS VARCHAR)
        |    || '}' AS j
        |  FROM events),
        |x AS (
        |  SELECT CAST(json_extract_string(j, '$.meta.k') AS INT) AS k,
        |    json_extract_string(j, '$.etype') AS etype,
        |    CAST(json_extract_string(j, '$.cents') AS BIGINT) AS cents
        |  FROM d)
        |SELECT k % 10 AS k_bucket, etype, count(*) AS n,
        |  CAST(sum(cents) AS DOUBLE) / 100 AS total_value
        |FROM x GROUP BY k_bucket, etype ORDER BY k_bucket, etype""".stripMargin,
    "udf_scalar" ->
      """SELECT s_suppkey, s_name, reverse(upper(s_name)) AS name_rev_upper
        |FROM supplier ORDER BY s_suppkey""".stripMargin,
    "scalar_try_cast" ->
      """SELECT event_type, count(*) AS n_rows,
        |  count(TRY_CAST(CASE WHEN event_type = 'error' THEN props
        |                      ELSE CAST(user_id AS VARCHAR) END AS BIGINT))
        |    AS n_parsed,
        |  CAST(sum(TRY_CAST(CASE WHEN event_type = 'error' THEN props
        |                         ELSE CAST(user_id AS VARCHAR) END AS BIGINT))
        |    AS BIGINT) AS parsed_sum
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "str_fuzzy_match" ->
      """SELECT CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS edit_dist,
        |  count(*) AS n_pairs
        |FROM customer a JOIN customer b ON b.c_custkey = a.c_custkey + 1
        |GROUP BY 1 ORDER BY edit_dist""".stripMargin,
  )
}
