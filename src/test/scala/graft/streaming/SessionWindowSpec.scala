package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** e22's native session_window operator: the strict-gap merge boundary
  * (the semantic the oracle replays), and the LIVE append-mode path —
  * sessions emit exactly when the watermark passes their end, and the
  * emitted set is a prefix of the batch replay.
  */
class SessionWindowSpec extends SparkSpec {
  private def tsm(min: Long): Timestamp = new Timestamp(min * 60000L)
  private val gapUs = 30L * 60 * 1000000

  test("batch boundary: a gap of exactly 30 min still merges; one ms more splits") {
    import spark.implicits._
    // an event exactly ON the session end extends it — the native
    // operator's merge is diff <= gap, NOT the half-open reading
    val merged = EventStream.sessionWindowAgg(
      Seq((tsm(0), 1L, 1.0), (tsm(30), 1L, 1.0)).toDF("ts", "user_id", "value"))
      .collect()
    assert(merged.length == 1,
      s"diff == gap must MERGE (boundary event extends the session): ${merged.toSeq}")
    assert(merged(0).getLong(2) == 30L * 60000000L + gapUs,
      "session end must be last event + gap")
    val split = EventStream.sessionWindowAgg(
      Seq((new Timestamp(0), 1L, 1.0),
        (new Timestamp(30L * 60000 + 1), 1L, 1.0)).toDF("ts", "user_id", "value"))
      .collect()
    assert(split.length == 2, s"diff > gap must split: ${split.toSeq}")
  }

  test("live append path: watermark finalizes sessions; output is a batch-replay prefix") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Timestamp, Long, Double)]
    val df = mem.toDF().toDF("ts", "user_id", "value")
    val query = EventStream.sessionWindowAgg(df)
      .writeStream.format("memory").queryName("sess22")
      .outputMode("append").start()
    try {
      // two sessions that will close, plus the event that closes them
      mem.addData((tsm(0), 1L, 1.0), (tsm(10), 1L, 2.0), (tsm(5), 2L, 4.0))
      query.processAllAvailable()
      assert(spark.table("sess22").count() == 0,
        "nothing finalizes while the watermark is behind the session ends")
      mem.addData((tsm(120), 1L, 8.0)) // watermark -> 90 min
      query.processAllAvailable()
      query.processAllAvailable()
      val emitted = spark.table("sess22").orderBy("user_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      assert(emitted.toSeq == Seq(
        (1L, 0L, 10L * 60000000L + gapUs, 2L, 3.0),
        (2L, 5L * 60000000L, 5L * 60000000L + gapUs, 1L, 4.0)),
        s"exactly the two closed sessions must emit: ${emitted.toSeq}")
      // prefix property: everything emitted so far appears identically
      // in the batch replay of the same input
      val batch = EventStream.sessionWindowAgg(
        Seq((tsm(0), 1L, 1.0), (tsm(10), 1L, 2.0), (tsm(5), 2L, 4.0),
          (tsm(120), 1L, 8.0)).toDF("ts", "user_id", "value"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSet
      assert(emitted.forall(batch.contains),
        s"live output must be a subset of the batch replay: $batch")
      assert(batch.size == 3, "batch replay also carries the still-open session")
    } finally query.stop()
  }
}
