package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** e23's native dropDuplicatesWithinWatermark: the three live behaviors
  * the batch degeneration cannot show — first-arrival emission,
  * in-window drop, and state EVICTION at the watermark (a late re-send
  * of an evicted key is re-admitted — the property that bounds state on
  * an unbounded stream, and the semantic difference from streaming
  * dropDuplicates).
  */
class DropDupWatermarkSpec extends SparkSpec {
  private def tsm(min: Long): Timestamp = new Timestamp(min * 60000L)

  test("live: dup within the delay drops; evicted key re-admits") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Timestamp, String, String)]
    val df = mem.toDF().toDF("ts", "event_type", "props")
    val query = EventStream.dedupWithinWatermark(df)
      .writeStream.format("memory").queryName("dedup23")
      .outputMode("append").start()
    try {
      // first arrival emits; the 10-min-later duplicate is in-window
      mem.addData((tsm(0), "click", "a"), (tsm(10), "click", "a"))
      query.processAllAvailable()
      assert(spark.table("dedup23").count() == 1,
        "exactly the first arrival of (click, a) must emit")
      // push the watermark far past first-arrival + 1h delay: state evicts
      mem.addData((tsm(180), "view", "x"))
      query.processAllAvailable()
      // the SAME key re-sent after eviction is re-admitted
      mem.addData((tsm(185), "click", "a"))
      query.processAllAvailable()
      val byKey = spark.table("dedup23")
        .groupBy("event_type", "props").count()
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(byKey(("click", "a")) == 2,
        s"evicted key must re-admit (emitted ${byKey(("click", "a"))} times)")
      assert(byKey(("view", "x")) == 1)
    } finally query.stop()
  }

  test("batch degeneration: the survivor KEY SET is the distinct key set") {
    import spark.implicits._
    val df = Seq(
      (tsm(0), "click", "a"), (tsm(10), "click", "a"),
      (tsm(500), "click", "a"), // beyond any window: still deduped in batch
      (tsm(5), "view", "b"))
      .toDF("ts", "event_type", "props")
    val out = EventStream.dedupWithinWatermark(df)
      .select("event_type", "props").orderBy("event_type")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(out.toSeq == Seq(("click", "a"), ("view", "b")),
      s"batch run must keep one row per key: ${out.toSeq}")
  }
}
