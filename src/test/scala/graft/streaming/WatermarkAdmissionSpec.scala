package graft.streaming

import graft.SparkSpec
import graft.pipeline.Events
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** e15's live contract: a REAL `withWatermark` windowed count, fed the
  * arrival-ordered events micro-batch by micro-batch, must emit per
  * window exactly the `n_admitted` that `Events.admissionAudit`
  * predicts — including the events Spark's watermark DROPS. The spec
  * uses count-based micro-batches (admissionAudit's bk is any
  * non-decreasing function of arrival order) so the subset replay stays
  * a few dozen batches; the e15 query entry runs the same prediction
  * with time-based batches under the DuckDB oracle.
  */
class WatermarkAdmissionSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.01"
  private val SubsetN = 600
  private val BatchRows = 20

  test("live watermarked window counts equal the audit's prediction, drops included") {
    implicit val sq = spark.sqlContext
    import spark.implicits._

    // First SubsetN events in modeled arrival order, grouped into
    // count-based micro-batches.
    val sub = Events.arrivalEvents(spark, dir)
      .orderBy(col("arr"), col("event_id"))
      .limit(SubsetN)
      .select(col("event_id"), col("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val batches = sub.grouped(BatchRows).toSeq

    // Prediction over the same subset with the same batch ids.
    val evDf = sub.zipWithIndex
      .map { case ((id, t), i) => (id, t, (i / BatchRows).toLong) }
      .toSeq.toDF("event_id", "t", "bk")
    val pred = Events.admissionAudit(evDf, Events.AdmWindowUs, Events.AdmDelayMs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val predAdmitted = pred.collect { case (w, adm, _) if adm > 0 => w -> adm }.toMap
    val totalDropped = pred.map(_._3).sum
    assert(totalDropped > 0,
      "the subset must exercise real watermark drops or the spec is vacuous")

    // Live replay: one addData + processAllAvailable per micro-batch,
    // then a far-future sentinel to close every real window.
    val mem = MemoryStream[(Long, Long)]
    val query = EventStream.watermarkedWindowCounts(
      mem.toDF().select(timestamp_micros(col("_2")).as("ts")))
      .writeStream.format("memory").queryName("admission")
      .outputMode("append").start()
    try {
      batches.foreach { b => mem.addData(b); query.processAllAvailable() }
      val sentinelT = sub.map(_._2).max + 86400000000L
      mem.addData(Seq((-1L, sentinelT)))
      query.processAllAvailable()
      val sentinelW = sentinelT / Events.AdmWindowUs * Events.AdmWindowUs
      val live = spark.table("admission").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap - sentinelW
      assert(live === predAdmitted,
        s"live emission must equal the prediction (pred dropped $totalDropped of ${sub.length})")
    } finally query.stop()
  }

  test("e15's only window is the batch-id prefix — never a corpus-sized global window") {
    val q = graft.queries.Registry.all.find(_.name == "e15_admission_audit").get
    val df = q.run(spark, "/root/testdata/sf0.001")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val specs = "windowspecdefinition\\(".r.findAllMatchIn(p).map(m =>
      p.substring(m.end, math.min(p.length, m.end + 24))).toSeq
    // round 14: the prefix window rides Portable.boundedW, whose
    // constant partition anchor projects as a `_wN#id` attribute ahead
    // of the bk ordering — strip it before pinning the bk prefix
    val stripped = specs.map(_.replaceFirst("^_w\\d+#\\d+, ", ""))
    assert(specs.nonEmpty && stripped.forall(_.startsWith("bk")),
      s"every window must be the bucket-table prefix (found specs over: $specs):\n${p.take(2500)}")
  }
}
