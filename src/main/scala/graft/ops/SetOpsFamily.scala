package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.Tables._

/** SURVEY §2.G — set operations (#39–#42).
  *
  * Scale posture: UNION ALL is a zero-shuffle concatenation of
  * children; the distinct variants (UNION / INTERSECT / EXCEPT) each
  * hash-partition by the full row once — Catalyst plans intersect and
  * except as left-semi / left-anti joins over distinct inputs, so the
  * same keyed-shuffle reasoning as the join family applies.
  */
object SetOpsFamily {

  private def fCust(spark: SparkSession, sf: String): DataFrame =
    orders(spark, sf).where(col("o_orderstatus") === "F").select(col("o_custkey"))
  private def oCust(spark: SparkSession, sf: String): DataFrame =
    orders(spark, sf).where(col("o_orderstatus") === "O").select(col("o_custkey"))

  /** #39 — UNION ALL (bag semantics, duplicates kept). */
  def setUnionAll(spark: SparkSession, sf: String): DataFrame =
    orders(spark, sf).where(col("o_orderstatus") === "F").select(col("o_orderkey"))
      .unionAll(
        orders(spark, sf).where(col("o_totalprice") > 300000).select(col("o_orderkey")))
      .orderBy(col("o_orderkey"))

  /** #40 — UNION (set semantics, distinct). */
  def setUnionDistinct(spark: SparkSession, sf: String): DataFrame =
    orders(spark, sf).where(col("o_orderstatus") === "F").select(col("o_orderkey"))
      .union(
        orders(spark, sf).where(col("o_totalprice") > 300000).select(col("o_orderkey")))
      .distinct()
      .orderBy(col("o_orderkey"))

  /** #41 — INTERSECT: customers holding both 'F' and 'O' orders. */
  def setIntersect(spark: SparkSession, sf: String): DataFrame =
    fCust(spark, sf).intersect(oCust(spark, sf)).orderBy(col("o_custkey"))

  /** #42 — EXCEPT: customers with 'F' orders but no 'O' orders. */
  def setExcept(spark: SparkSession, sf: String): DataFrame =
    fCust(spark, sf).except(oCust(spark, sf)).orderBy(col("o_custkey"))

  /** #104 — INTERSECT ALL (bag semantics): per-customer F-order rows
    * matched by multiplicity against O-order rows — min(countF,
    * countO) copies survive. Catalyst plans it as a single
    * count-compare aggregate join, not a distinct + semi join. */
  def setIntersectAll(spark: SparkSession, sf: String): DataFrame =
    fCust(spark, sf).intersectAll(oCust(spark, sf))
      .orderBy(col("o_custkey"))

  /** #105 — EXCEPT ALL (bag semantics): F-order rows minus O-order
    * rows by multiplicity — max(countF − countO, 0) copies survive. */
  def setExceptAll(spark: SparkSession, sf: String): DataFrame =
    fCust(spark, sf).exceptAll(oCust(spark, sf))
      .orderBy(col("o_custkey"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = ListMap(
    "set_union_all"      -> (setUnionAll _),
    "set_union_distinct" -> (setUnionDistinct _),
    "set_intersect"      -> (setIntersect _),
    "set_except"         -> (setExcept _),
    "set_intersect_all"  -> (setIntersectAll _),
    "set_except_all"     -> (setExceptAll _),
  )

  val oracle: Map[String, String] = ListMap(
    "set_union_all" ->
      """SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'
        |UNION ALL
        |SELECT o_orderkey FROM orders WHERE o_totalprice > 300000
        |ORDER BY o_orderkey""".stripMargin,
    "set_union_distinct" ->
      """SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'
        |UNION
        |SELECT o_orderkey FROM orders WHERE o_totalprice > 300000
        |ORDER BY o_orderkey""".stripMargin,
    "set_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_custkey""".stripMargin,
    "set_except" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_custkey""".stripMargin,
    "set_intersect_all" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT ALL
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_custkey""".stripMargin,
    "set_except_all" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |EXCEPT ALL
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_custkey""".stripMargin,
  )
}
