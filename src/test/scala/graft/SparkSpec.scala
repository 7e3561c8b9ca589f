package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (built once per test JVM). */
object SparkSpec {
  lazy val session: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft_wh").toString)
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkSpec.session
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf001 = "/root/testdata/sf0.001"
  val sf01 = "/root/testdata/sf0.01"

  /** Heavyweight test sizing: full scale when GRAFT_FULL_TESTS=1 (the
    * once-a-round CI-equivalent run), a smaller default so plain
    * `sbt test` stays a pre-commit gate rather than a 20-minute event.
    * Every property still runs on every invocation — only the row
    * count shrinks. */
  def sized(full: Long, quick: Long): Long =
    if (sys.env.get("GRAFT_FULL_TESTS").contains("1")) full else quick
}
