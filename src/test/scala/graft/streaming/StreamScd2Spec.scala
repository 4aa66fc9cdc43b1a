package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** e20 SCD2 maintainer: (1) its batch run equals q61's one-pass window
  * ledger exactly; (2) live over a MemoryStream, feeding the change
  * batches in order, the upserted-by-(k, valid_from) view of its
  * update-mode emissions equals the same ledger.
  */
class StreamScd2Spec extends SparkSpec {
  import LakeStream._

  private val dir = "/root/testdata/sf0.001"

  private def ledger = graft.queries.Advanced.scd2History(spark, dir)
    .select("k", "valid_from", "valid_to", "o_orderstatus", "price", "is_current")

  test("batch run of the maintainer equals the q61 ledger") {
    val e20 = graft.SparkEntry.queries("e20_stream_scd2")(spark, dir)
      .select("k", "valid_from", "valid_to", "o_orderstatus", "price", "is_current")
    assert(e20.exceptAll(ledger).isEmpty && ledger.exceptAll(e20).isEmpty)
  }

  test("live stream, batches fed in order, upserted view equals the ledger") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // a bounded key slice keeps the MemoryStream feed small while still
    // covering all transition shapes (update, delete, delete-then-
    // nothing, insert of a fresh key, untouched)
    val keyCap = 3000L
    val feed = graft.queries.Advanced.scd2Input(spark, dir)
      .filter(col("k") < keyCap).as[Chg].collect()
    val mem = MemoryStream[Chg]
    val query = scd2Maintain(mem.toDS())
      .writeStream.format("memory").queryName("scd2_live")
      .outputMode("update").start()
    try {
      // batch 1 is fed TWICE (adjacent redelivery — the at-least-once
      // case the maintainer's equal-stamp skip absorbs): the upserted
      // view must still equal the ledger, with no zero-length [b, b)
      // intervals superseding genuine current rows
      for (b <- Seq(0, 1, 1, 2)) {
        mem.addData(feed.filter(_.b == b).toIndexedSeq)
        query.processAllAvailable()
      }
      // update-mode supersession, emit-order-free: a version closes at
      // most once, so per (k, valid_from) the closed row (valid_to not
      // null) supersedes any current-flagged emission of the same
      // version; identical re-emissions collapse under distinct()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("k"), col("valid_from"))
        .orderBy(col("valid_to").asc_nulls_last)
      val live = spark.table("scd2_live").distinct()
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("k", "valid_from", "valid_to", "o_orderstatus", "price", "is_current")
      val expect = ledger.filter(col("k") < keyCap)
      assert(live.exceptAll(expect).isEmpty && expect.exceptAll(live).isEmpty,
        "live upserted view diverges from the batch ledger")
    } finally query.stop()
  }
}
