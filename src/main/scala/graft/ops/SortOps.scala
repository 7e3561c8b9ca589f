package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.Tables._

/** SURVEY §2.F — sort / limit / top-k (#37–#38).
  *
  * Scale posture: the global top-k compiles to TakeOrderedAndProject —
  * per-partition heaps of k rows merged on the driver, never a full
  * range-partitioned sort. The multi-column sort is the one operator
  * family that legitimately pays a global range exchange (the contract
  * requires totally ordered output).
  */
object SortOps {

  /** #37 — multi-column sort with explicit NULLS FIRST over a
    * synthesized nullable column (corpus has no NULLs; default null
    * ordering differs across engines, so it is always spelled out). */
  def sortMultiNulls(spark: SparkSession, sf: String): DataFrame =
    orders(spark, sf)
      .select(col("o_orderkey"),
        expr("nullif(o_orderstatus, 'O')").as("status_or_null"),
        col("o_totalprice"))
      .orderBy(col("status_or_null").asc_nulls_first,
               col("o_totalprice").desc, col("o_orderkey"))

  /** #38 — global top-100 by price (TakeOrderedAndProject: no full
    * sort shuffle; ties broken by the unique key). */
  def topkGlobal(spark: SparkSession, sf: String): DataFrame =
    orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)

  val queries: Map[String, (SparkSession, String) => DataFrame] = ListMap(
    "sort_multi_nulls" -> (sortMultiNulls _),
    "topk_global"      -> (topkGlobal _),
  )

  val oracle: Map[String, String] = ListMap(
    "sort_multi_nulls" ->
      """SELECT o_orderkey, nullif(o_orderstatus, 'O') AS status_or_null,
        |  o_totalprice
        |FROM orders
        |ORDER BY status_or_null ASC NULLS FIRST, o_totalprice DESC, o_orderkey""".stripMargin,
    "topk_global" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
  )
}
