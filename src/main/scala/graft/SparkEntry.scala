package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.immutable.ListMap
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §2 (operator inventory)
  * and §3.2 (entry points). `queries` holds one entry per implemented
  * operator; `oracleSql` the DuckDB-runnable equivalent for the
  * hash-match correctness gate. Keys and output column names must
  * match across the two maps (the driver sorts columns by name before
  * hashing values).
  */
object SparkEntry {

  /** Flagship query (SURVEY §2 #16, TPC-H Q5 shape) on sf0.001;
    * driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    JoinOps.joinMultiway5(spark, "/root/testdata/sf0.001")

  private val families: Seq[Map[String, (SparkSession, String) => DataFrame]] = Seq(
    ScanOps.queries,
    FilterOps.queries,
    JoinOps.queries,
    AggOps.queries,
    WindowOps.queries,
    SortOps.queries,
    SetOpsFamily.queries,
    ScalarOps.queries,
    StreamOps.queries,
    TextOps.queries,
    LlmOps.queries,
    CorpusOps.queries,
    GraphOps.queries,
    EtlOps.queries,
    VecOps.queries,
  )

  private val oracles: Seq[Map[String, String]] = Seq(
    ScanOps.oracle,
    FilterOps.oracle,
    JoinOps.oracle,
    AggOps.oracle,
    WindowOps.oracle,
    SortOps.oracle,
    SetOpsFamily.oracle,
    ScalarOps.oracle,
    StreamOps.oracle,
    TextOps.oracle,
    LlmOps.oracle,
    CorpusOps.oracle,
    GraphOps.oracle,
    EtlOps.oracle,
    VecOps.oracle,
  )

  // A duplicate operator key across families would silently shrink the
  // graded query set — fail fast instead (ADVICE r1).
  private def merged[V](ms: Seq[Map[String, V]]): Map[String, V] =
    ms.foldLeft(ListMap.empty[String, V]) { (acc, m) =>
      val dup = acc.keySet.intersect(m.keySet)
      require(dup.isEmpty, s"duplicate operator keys across families: $dup")
      acc ++ m
    }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = merged(families)

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB
    * on the same parquet tables. Omitted for non-SQL-expressible ops
    * (the driver then records a weaker rows-only check). */
  def oracleSql: Map[String, String] = merged(oracles)
}
