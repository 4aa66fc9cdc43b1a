package graft.streaming

import graft.SparkSpec
import graft.pipeline.Similarity
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import VecStream.Vec

/** s10's live path: continuous vector ingestion through the frozen
  * index artifacts. The load-bearing contract is BATCH-SIZE INVARIANCE
  * — any micro-batching of the delta must produce exactly the rows of
  * s10's one-shot batch append — plus redelivery idempotence (a
  * re-arriving vector re-emits an identical row, never a different
  * routing or code).
  */
class VecStreamSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def deltaVecs(): Seq[Vec] = {
    val b = Similarity.s10Boundary(spark, dir)
    graft.Tables.t(spark, dir, "embeddings")
      .filter(col("vec_id") >= b)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .collect()
      .map(r => Vec(r.getLong(0), r.getSeq[Double](1)))
  }

  private def rowsOf(rs: Iterable[Row]): Set[(Long, Long, Long)] =
    rs.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("streamed micro-batches union to s10's batch index bit-for-bit; redelivery is idempotent") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val delta = deltaVecs()
    assert(delta.size >= 3, s"fixture needs a non-trivial delta, got ${delta.size}")
    val (first, rest) = delta.splitAt(delta.size / 3)

    val collected = scala.collection.mutable.ArrayBuffer.empty[Row]
    val mem = MemoryStream[Vec]
    val query = VecStream.indexAppend(spark, dir, mem.toDS()) { served =>
      collected.synchronized { collected ++= served.collect() }
    }
    try {
      mem.addData(first: _*)
      query.processAllAvailable()
      val afterFirst = collected.size
      assert(afterFirst == first.size, "each arriving vector emits exactly one serving row")

      mem.addData(rest: _*)
      query.processAllAvailable()
      assert(collected.size == delta.size)

      // the union over this (uneven) micro-batching equals the one-shot
      // batch assignment — s10's merge identity, live
      val batch = Similarity.annDeltaIndex(spark, dir).collect()
      assert(rowsOf(collected) == rowsOf(batch),
        "micro-batched append must equal the one-shot delta assignment bit-for-bit")

      // at-least-once redelivery: identical rows re-emitted, nothing moves
      mem.addData(first: _*)
      query.processAllAvailable()
      assert(rowsOf(collected) == rowsOf(batch),
        "redelivered vectors must re-emit identical rows (set-idempotent append)")
      assert(collected.size == delta.size + first.size,
        "redelivery emits duplicates for the sink's upsert to absorb — it must not drop or change them")
    } finally query.stop()
  }

  test("an empty micro-batch emits nothing and does not disturb the stream") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val collected = scala.collection.mutable.ArrayBuffer.empty[Row]
    val mem = MemoryStream[Vec]
    val query = VecStream.indexAppend(spark, dir, mem.toDS()) { served =>
      collected.synchronized { collected ++= served.collect() }
    }
    try {
      query.processAllAvailable() // no data at all
      assert(collected.isEmpty)
      val one = deltaVecs().take(1)
      mem.addData(one: _*)
      query.processAllAvailable()
      assert(collected.size == 1)
    } finally query.stop()
  }
}
