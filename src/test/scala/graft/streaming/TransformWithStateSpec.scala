package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** e24's transformWithState processor: the live behavior the batch
  * degeneration cannot show — typed ValueState persists ACROSS
  * micro-batches, each batch emitting the key's updated running
  * snapshot whose final value equals the batch replay. Streaming
  * transformWithState requires the RocksDB state store provider; the
  * spec scopes that conf and restores the prior provider.
  */
class TransformWithStateSpec extends SparkSpec {

  test("running snapshots accumulate across micro-batches; final equals batch") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[(Long, Double)]
    val query = EventStream.runningTotals(mem.toDS())
      .toDF()
      .writeStream.format("memory").queryName("totals24")
      .outputMode("append").start()
    try {
      mem.addData((1L, 1.50), (1L, 2.25), (2L, 10.00))
      query.processAllAvailable()
      mem.addData((1L, 0.25))
      query.processAllAvailable()
      val snaps = spark.table("totals24")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      // batch 1 snapshots
      assert(snaps.contains((1L, 2L, 3.75)), s"user 1 batch-1 snapshot: ${snaps.toSeq}")
      assert(snaps.contains((2L, 1L, 10.0)), s"user 2 batch-1 snapshot: ${snaps.toSeq}")
      // batch 2: user 1's state CARRIED — the snapshot continues, not restarts
      assert(snaps.contains((1L, 3L, 4.0)), s"user 1 batch-2 snapshot: ${snaps.toSeq}")
      assert(snaps.length == 3, s"one snapshot per touched key per batch: ${snaps.toSeq}")
      // the final snapshot equals the batch replay of the same rows
      val batch = EventStream.runningTotals(
        Seq((1L, 1.50), (1L, 2.25), (2L, 10.00), (1L, 0.25)).toDS())
        .collect().map(t => (t.user_id, t.n_events, t.total_value)).toSet
      assert(batch == Set((1L, 3L, 4.0), (2L, 1L, 10.0)),
        s"batch replay must equal the final snapshots: $batch")
    } finally {
      query.stop()
      prior match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("e26 live: hours emit their top-k when the watermark closes them") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    def ts(min: Long) = new java.sql.Timestamp(min * 60000L)
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val df = mem.toDF().toDF("ts", "event_type")
    val query = EventStream.trendingTopK(df, k = 2).toDF()
      .writeStream.format("memory").queryName("trend26")
      .outputMode("append").start()
    try {
      // hour 0: click x2, view x1, scroll x1 → top-2 = click, scroll? no:
      // counts click=2, scroll=1, view=1 → rk1 click, rk2 scroll (tie on
      // 1, type asc picks scroll < view)
      mem.addData((ts(1), "click"), (ts(2), "click"), (ts(3), "view"), (ts(4), "scroll"))
      query.processAllAvailable()
      assert(spark.table("trend26").count() == 0,
        "an open hour must not emit before the watermark closes it")
      // advance the watermark past hour 0's end (+2h delay): event at
      // minute 200 → watermark 80 > 60; one more batch applies it
      mem.addData((ts(200), "click"))
      query.processAllAvailable()
      query.processAllAvailable()
      val rows = spark.table("trend26")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3))).toSet
      assert(rows == Set((0L, "click", 2L, 1), (0L, "scroll", 1L, 2)),
        s"hour 0 must emit exactly its top-2 with e10's tie rule: $rows")
      // the emitting hour CLEARED its state: a (late-but-admissible)
      // replay of the whole stream in batch mode still yields the full
      // answer, but the live table gains nothing new without fresh hours
      query.processAllAvailable()
      assert(spark.table("trend26").count() == 2, "no re-emission after clear")
      // a STRAGGLER row for the already-closed hour 0: the grouping key
      // projected ts away, so the engine's late-record filter can't see
      // it — the processor's own watermark guard must drop it, or it
      // would rebuild MapState, re-register hour 0's past-due timer,
      // and emit a duplicate partial top-k on the next batch.
      mem.addData((ts(5), "straggler"))
      query.processAllAvailable()
      query.processAllAvailable()
      val after = spark.table("trend26")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3))).toSet
      assert(after == rows,
        s"a late row for a closed hour must never re-emit that hour: $after")
    } finally {
      query.stop()
      prior match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }
}
