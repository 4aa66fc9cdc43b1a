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
}
