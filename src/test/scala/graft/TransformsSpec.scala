package graft

import org.apache.spark.sql.functions._
import graft.api.Transforms
import graft.Tables._

/** graft.api.Transforms: generic combinators behave like the native
  * operators they generalize. */
class TransformsSpec extends SparkSpec {

  test("sessionize (gaps-and-islands) matches native session_window sessions") {
    val ev = events(spark, sf001)
    val viaApi = Transforms.sessionize(ev, col("user_id"), col("ts"),
        col("event_id"), gapSeconds = 1800)
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"), min(col("ts")).as("session_start"))
      .select(col("user_id"), col("session_start"), col("n_events"))
    val viaNative = ev
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
              col("n_events"))
    assert(viaApi.exceptAll(viaNative).isEmpty && viaNative.exceptAll(viaApi).isEmpty)
  }

  test("chunk assigns contiguous bounded batches") {
    val out = Transforms.chunk(
      orders(spark, sf001).select(col("o_orderkey")), col("o_orderkey"), 100)
    val sizes = out.groupBy(col("batch_id")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sizes.values.forall(_ <= 100))
    assert(sizes.values.sum == orders(spark, sf001).count())
    assert(sizes.keySet == (0 until sizes.size).toSet) // contiguous ids
  }

  test("asOfJoin picks the latest right row at or before left time") {
    import spark.implicits._
    val left = Seq((1L, 100L), (2L, 205L), (3L, 50L)).toDF("id", "t")
    val right = Seq((1L, 10L, "a"), (1L, 100L, "b"), (1L, 101L, "c"),
                    (2L, 200L, "d"), (2L, 205L, "e")).toDF("rid", "rt", "tag")
    val got = Transforms.asOfJoin(left, right,
        col("id"), col("rid"), col("t"), col("rt"), col("tag"))
      .select(col("id"), col("tag")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "b", 2L -> "e")) // id 3 has no match -> absent
  }
}
