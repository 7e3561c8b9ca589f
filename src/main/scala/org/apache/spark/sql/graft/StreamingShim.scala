package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.classic.{Dataset, SparkSession}
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** The one `private[sql]` doorway the DSv1 streaming-source contract
  * forces ([[graft.streaming.SnapshotCdcSource]]): `getBatch` must
  * hand the engine a plan whose leaves are marked `isStreaming=true`
  * (MicroBatchExecution splices it in place of the streaming relation
  * and asserts it), and the only constructor for "this batch plan,
  * but streaming" is `Dataset.ofRows` — exactly how Spark's own
  * FileStreamSource builds its per-batch frames. Kept to the minimal
  * surface: mark leaves, rewrap, nothing else. */
object StreamingShim {

  /** Re-wrap a BATCH DataFrame as a streaming-marked one, leaf-wise —
    * file relations and (empty-batch) local relations both. */
  def asStreamingBatch(df: DataFrame): DataFrame = {
    val marked = df.queryExecution.analyzed.transform {
      case lr: LogicalRelation => lr.copy(isStreaming = true)
      case lr: LocalRelation   => lr.copy(isStreaming = true)
    }
    Dataset.ofRows(df.sparkSession.asInstanceOf[SparkSession], marked)
  }
}
