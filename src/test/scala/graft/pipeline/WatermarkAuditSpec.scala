package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** e14 watermark-lateness audit: the two-pass bucketed prefix-max must
  * equal the naive global-running-max spelling event-for-event; the
  * drop curve must be monotone, non-trivial at delay 0, and EXACTLY
  * zero at the max network delay (arrival inversion is bounded by the
  * jitter); and the corpus-sized window must stay bucket-partitioned —
  * no global single-partition window anywhere in the plan.
  */
class WatermarkAuditSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def q(name: String) = graft.queries.Registry.all.find(_.name == name).get

  private def arrivals = Events.arrivalEvents(spark, dir)

  test("two-pass hwm equals the naive global running max, per delay") {
    val naive = Window.orderBy(col("arr"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val late = arrivals
      .withColumn("late", max(col("t")).over(naive) - col("t"))
    val expected = Events.WatermarkDelaysSec.map { d =>
      d -> late.filter(col("late") > d * 1000000L).count()
    }.toMap
    val got = q("e14_watermark_audit").run(spark, dir).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got === expected,
      s"bucketed prefix-max drop curve must match the naive global window")
  }

  test("the curve is monotone, lossy at 0, and exactly zero at the max jitter") {
    val rows = q("e14_watermark_audit").run(spark, dir)
      .orderBy(col("delay_s")).collect()
    assert(rows.map(_.getInt(0)).toSeq === Events.WatermarkDelaysSec,
      "one row per candidate delay")
    val drops = rows.map(_.getLong(1)).toSeq
    assert(drops.head > 0L,
      "delay 0 must drop events — the jitter model produces real disorder")
    assert(drops.zip(drops.tail).forall { case (a, b) => a >= b },
      s"drop counts must be non-increasing in the delay: $drops")
    assert(drops.last === 0L,
      "a watermark >= the max network delay provably drops nothing")
    val n = arrivals.count()
    rows.foreach(r => assert(r.getLong(2) === r.getLong(1) * 1000000L / n,
      s"drop_ppm must be exact integer arithmetic over n=$n"))
  }

  test("no global single-partition window over the corpus in the plan") {
    val df = q("e14_watermark_audit").run(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("windowspecdefinition(arr"),
      s"the corpus-sized running max must be partitioned by arrival bucket:\n${p.take(3000)}")
  }
}
