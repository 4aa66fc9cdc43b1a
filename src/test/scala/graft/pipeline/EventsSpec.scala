package graft.pipeline

import graft.{SparkEntry, SparkSpec}
import java.sql.Timestamp

/** Behavior pins for the batch event analytics that have no streaming
  * twin (e6 retention): crafted fixture with a hand-computed triangle,
  * plus the structural invariants on real testdata.
  */
class EventsSpec extends SparkSpec {

  private val fixtureDir = "target/events-retention-fixture"

  // 2024-01-01 is a Monday — each week w starts exactly w*7 days later,
  // so date_trunc('week') lands precisely on these instants (UTC session)
  private def atWeek(w: Int, dayOff: Int = 0): Timestamp =
    Timestamp.valueOf(java.time.LocalDateTime.of(2024, 1, 1, 12, 0)
      .plusDays(w * 7L + dayOff).format(
        java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")))

  test("e6: retention triangle matches the hand-computed fixture") {
    import spark.implicits._
    // user 1: weeks 0,1,3 · user 2: week 0 · user 3: weeks 2,3
    val rows = Seq(
      (1L, atWeek(0), 1L), (2L, atWeek(0, 2), 1L), (3L, atWeek(1), 1L),
      (4L, atWeek(3), 1L),
      (5L, atWeek(0, 4), 2L),
      (6L, atWeek(2), 3L), (7L, atWeek(3, 5), 3L),
    )
    rows.toDF("event_id", "ts", "user_id")
      .selectExpr("event_id", "ts", "user_id",
        "'view' AS event_type", "1.0 AS value", "'{}' AS props")
      .write.mode("overwrite").parquet(s"$fixtureDir/events.parquet")

    val got = SparkEntry.queries("e6_retention")(spark, fixtureDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val w0 = java.time.LocalDateTime.of(2024, 1, 1, 0, 0)
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
    val wk = 7L * 86400L * 1000000L
    assert(got == Map(
      (w0, 0L) -> 2L, (w0, 1L) -> 1L, (w0, 3L) -> 1L,
      (w0 + 2 * wk, 0L) -> 1L, (w0 + 2 * wk, 1L) -> 1L))
  }

  test("e6: every cohort has an offset-0 row equal to its size (real data)") {
    val rows = SparkEntry.queries("e6_retention")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty && rows.forall(_._2 >= 0))
    val cohorts = rows.map(_._1).distinct
    val at0 = rows.filter(_._2 == 0L).map(r => r._1 -> r._3).toMap
    // a user is by definition active in their first week, so offset 0
    // exists for every cohort and dominates every later offset's count
    assert(cohorts.forall(at0.contains))
    rows.foreach { case (c, off, n) =>
      if (off > 0) assert(n <= at0(c), s"offset $off of cohort $c exceeds cohort size")
    }
  }
}
