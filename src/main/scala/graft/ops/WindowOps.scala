package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.immutable.ListMap

object WindowOps {
  val queries: Map[String, (SparkSession, String) => DataFrame] = ListMap()
  val oracle: Map[String, String] = ListMap()
}
