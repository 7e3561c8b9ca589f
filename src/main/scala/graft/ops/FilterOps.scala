package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.Tables._

/** SURVEY §2.B — projection / filter / predicates (#6–#9).
  *
  * All pure narrow transformations: no shuffle, fully pushable, stay
  * inside one whole-stage-codegen span over the scan. Decimal chains
  * are re-cast to explicit bounded precisions after each multiply so
  * Spark and DuckDB precision inference cannot diverge (values stay
  * exact; only the final cast to DOUBLE reaches the output).
  */
object FilterOps {

  /** #6 — derived arithmetic columns: gross charge
    * extprice * (1-disc) * (1+tax), exact decimal chain → double. */
  def projectArith(spark: SparkSession, sf: String): DataFrame = {
    val f2 = (lit(1) - money(col("l_discount"))).cast(org.apache.spark.sql.types.DecimalType(4, 2))
    val f3 = (lit(1) + money(col("l_tax"))).cast(org.apache.spark.sql.types.DecimalType(4, 2))
    lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_linenumber"),
        (dec(money(col("l_extendedprice")) * f2, 24, 4) * f3)
          .cast(org.apache.spark.sql.types.DecimalType(30, 6))
          .cast("double").as("gross_charge"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** #7 — compound predicates: AND/OR/NOT, BETWEEN, IN, LIKE, modulo. */
  def filterCompound(spark: SparkSession, sf: String): DataFrame =
    orders(spark, sf)
      .where(col("o_orderstatus").isin("F", "O") &&
             col("o_totalprice").between(50000, 200000) &&
             (col("o_orderpriority").like("1%") || col("o_orderpriority").like("2%")) &&
             !(col("o_custkey") % 10 === 0))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
              col("o_totalprice"), col("o_orderpriority"))
      .orderBy(col("o_orderkey"))

  /** #8 — three-valued logic: the corpus has no NULLs (verified), so
    * nulls are synthesized with nullif, then exercised through
    * IS NULL, coalesce, and null-safe equality (<=>). */
  def filterNullSemantics(spark: SparkSession, sf: String): DataFrame =
    customer(spark, sf)
      .where(col("c_acctbal") < 0)
      .select(col("c_custkey"),
        expr("nullif(c_mktsegment, 'BUILDING')").as("seg_or_null"),
        expr("coalesce(nullif(c_mktsegment, 'BUILDING'), '(none)')").as("seg_filled"),
        expr("nullif(c_mktsegment, 'BUILDING') IS NULL").as("is_building"),
        expr("nullif(c_mktsegment, 'BUILDING') <=> nullif(c_mktsegment, 'AUTOMOBILE')")
          .as("null_safe_eq"))
      .orderBy(col("c_custkey"))

  /** #9 — CASE WHEN bucketing of order totals into price bands. */
  def caseExpr(spark: SparkSession, sf: String): DataFrame =
    orders(spark, sf)
      .select(
        when(col("o_totalprice") < 100000, "low")
          .when(col("o_totalprice") < 300000, "mid")
          .otherwise("high").as("band"),
        col("o_orderstatus"), col("o_totalprice"))
      .groupBy(col("band"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
           sum(money(col("o_totalprice"))).cast("double").as("total"))
      .orderBy(col("band"), col("o_orderstatus"))

  private val correlatedSql =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders o
      |WHERE o_totalprice > 4 * (SELECT max(l_extendedprice) FROM lineitem l
      |                          WHERE l.l_orderkey = o.o_orderkey)
      |ORDER BY o_orderkey""".stripMargin

  /** #84 — correlated scalar subquery (Catalyst decorrelates to a
    * left outer aggregate join — the subquery never executes
    * per-row). Exact comparison: max over 2-dp doubles. */
  def subqueryCorrelatedScalar(spark: SparkSession, sf: String): DataFrame = {
    views(spark, sf, "orders", "lineitem")
    spark.sql(correlatedSql)
  }

  private val notInNullsSql =
    """WITH probe AS (
      |  SELECT CASE WHEN o_orderkey % 7 = 0 THEN NULL
      |              ELSE o_custkey END AS k
      |  FROM orders),
      |base AS (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
      |SELECT
      |  (SELECT count(*) FROM base
      |   WHERE c_custkey NOT IN (SELECT k FROM probe)) AS n_not_in,
      |  (SELECT count(*) FROM base b WHERE NOT EXISTS
      |     (SELECT 1 FROM probe p WHERE p.k = b.c_custkey)) AS n_not_exists,
      |  (SELECT count(*) FROM base WHERE c_custkey NOT IN
      |     (SELECT k FROM probe WHERE k IS NOT NULL)) AS n_not_in_nonnull
      |""".stripMargin

  /** #150 — NOT IN vs NOT EXISTS under a nullable subquery, the
    * classic three-valued-logic trap: one NULL in the NOT IN list
    * makes every membership test UNKNOWN, so `n_not_in` is provably 0
    * while NOT EXISTS (which never yields UNKNOWN) and the
    * null-filtered NOT IN count the real complement. Catalyst plans
    * the three as null-aware anti join / anti join / anti join — all
    * shuffle-keyed, no per-row subquery execution. Getting this
    * WRONG silently is the #1 SQL-migration bug class; the op pins
    * the semantics under the oracle. */
  def subqueryNotInNulls(spark: SparkSession, sf: String): DataFrame = {
    views(spark, sf, "orders", "customer")
    spark.sql(notInNullsSql)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = ListMap(
    "project_arith"         -> (projectArith _),
    "filter_compound"       -> (filterCompound _),
    "filter_null_semantics" -> (filterNullSemantics _),
    "case_expr"             -> (caseExpr _),
    "subquery_correlated_scalar" -> (subqueryCorrelatedScalar _),
    "subquery_not_in_nulls"      -> (subqueryNotInNulls _),
  )

  val oracle: Map[String, String] = ListMap(
    "project_arith" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * CAST(1 - CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(4,2)) AS DECIMAL(24,4))
        |    * CAST(1 + CAST(l_tax AS DECIMAL(18,2)) AS DECIMAL(4,2)) AS DECIMAL(30,6))
        |    AS DOUBLE) AS gross_charge
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "filter_compound" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
        |FROM orders
        |WHERE o_orderstatus IN ('F','O')
        |  AND o_totalprice BETWEEN 50000 AND 200000
        |  AND (o_orderpriority LIKE '1%' OR o_orderpriority LIKE '2%')
        |  AND NOT (o_custkey % 10 = 0)
        |ORDER BY o_orderkey""".stripMargin,
    "filter_null_semantics" ->
      """SELECT c_custkey,
        |  nullif(c_mktsegment, 'BUILDING') AS seg_or_null,
        |  coalesce(nullif(c_mktsegment, 'BUILDING'), '(none)') AS seg_filled,
        |  nullif(c_mktsegment, 'BUILDING') IS NULL AS is_building,
        |  nullif(c_mktsegment, 'BUILDING') IS NOT DISTINCT FROM
        |    nullif(c_mktsegment, 'AUTOMOBILE') AS null_safe_eq
        |FROM customer WHERE c_acctbal < 0 ORDER BY c_custkey""".stripMargin,
    "case_expr" ->
      """SELECT CASE WHEN o_totalprice < 100000 THEN 'low'
        |            WHEN o_totalprice < 300000 THEN 'mid'
        |            ELSE 'high' END AS band,
        |  o_orderstatus, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY band, o_orderstatus
        |ORDER BY band, o_orderstatus""".stripMargin,
    "subquery_correlated_scalar" -> correlatedSql,
    "subquery_not_in_nulls"      -> notInNullsSql,
  )
}
