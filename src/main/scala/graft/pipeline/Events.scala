package graft.pipeline

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Event-stream analytics over the `events` table (`event_id`, `ts`,
  * `user_id`, `event_type`, `value`, `props` JSON-text).
  *
  * These are the batch twins of the Structured Streaming module
  * (graft.streaming): identical window/sessionization semantics, which
  * is exactly how a Lambda-free Spark pipeline validates its streaming
  * jobs. Timestamps cross the oracle boundary as epoch-microsecond longs
  * to sidestep timestamp-rendering differences between engines.
  */
object Events {
  import Tables.t

  def all: Seq[Q] = Seq(
    // ---- e1: tumbling 1-hour windows per event type ----
    Q(
      "e1_hourly_window",
      (s, dir) =>
        t(s, dir, "events")
          .groupBy(
            unix_micros(date_trunc("HOUR", col("ts"))).as("hour_us"),
            col("event_type"))
          .agg(
            count(lit(1)).as("n"),
            graft.Agg.dsum(col("value")).as("sum_value")),
      Some("""
        SELECT epoch_us(date_trunc('hour', ts)) AS hour_us, event_type,
               count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1, 2"""),
    ),

    // ---- e2: JSON prop extraction + aggregation ----
    Q(
      "e2_json_props",
      (s, dir) =>
        t(s, dir, "events")
          .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
          // signed % (not pmod): DuckDB's % is signed, and the two only
          // agree when the bucketing matches for ALL ints, not just the
          // non-negative k the current fixtures happen to contain
          .groupBy((col("k") % lit(10)).as("k_bucket"))
          .agg(
            count(lit(1)).as("n"),
            graft.Agg.dsum(col("value")).as("sum_value")),
      Some("""
        SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_bucket,
               count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1"""),
    ),

    // ---- e3: sessionization — 30-min-gap sessions per user ----
    Q(
      "e3_sessionize",
      (s, dir) => {
        val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
        t(s, dir, "events")
          .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
          .withColumn("new_session",
            when(col("prev_us").isNull ||
              unix_micros(col("ts")) - col("prev_us") > 30L * 60 * 1000000, 1L).otherwise(0L))
          .withColumn("session_seq", sum(col("new_session")).over(
            Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("user_id"), col("session_seq"))
          .agg(
            count(lit(1)).as("n_events"),
            min(unix_micros(col("ts"))).as("start_us"),
            max(unix_micros(col("ts"))).as("end_us"),
            graft.Agg.dsum(col("value")).as("session_value"))
      },
      Some("""
        WITH g AS (
          -- ORDER BY epoch_us(ts): Spark reads this nanosecond column
          -- truncated to microseconds, so the oracle must tie-break on the
          -- same truncated value or same-µs events sessionize differently
          SELECT user_id, event_id, value, epoch_us(ts) AS ts_us,
                 lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts) ASC, event_id ASC) AS prev_us
          FROM events),
        m AS (
          SELECT *, CASE WHEN prev_us IS NULL OR ts_us - prev_us > 30 * 60 * 1000000
                         THEN 1 ELSE 0 END AS new_session
          FROM g),
        sess AS (
          -- CAST: DuckDB sum(int) yields HUGEINT; Spark's is BIGINT
          SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC
                                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
          FROM m)
        SELECT user_id, session_seq, count(*) AS n_events,
               min(ts_us) AS start_us, max(ts_us) AS end_us,
               CAST(sum(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS session_value
        FROM sess GROUP BY 1, 2"""),
    ),

    // ---- e4: purchase→click attribution — the batch run of the
    //      watermarked stream-stream interval join (the SAME function
    //      the streaming path runs; see EventStream.attributionJoin).
    //      Scale shape: both sides shuffle once on user_id and the
    //      event-time bound caps matched rows per key; in streaming the
    //      same bound is what lets Spark evict join state. Timestamps
    //      cross the oracle boundary as epoch-µs longs (e1/e3's
    //      convention). ----
    Q(
      "e4_attribution",
      (s, dir) =>
        graft.streaming.EventStream.attributionJoin(t(s, dir, "events"))
          .select(
            col("purchase_id"), col("p_user").as("user_id"),
            unix_micros(col("purchase_ts")).as("purchase_us"),
            col("click_id"), unix_micros(col("click_ts")).as("click_us"),
            col("value")),
      Some("""
        SELECT p.event_id AS purchase_id, p.user_id AS user_id,
               epoch_us(p.ts) AS purchase_us,
               c.event_id AS click_id, epoch_us(c.ts) AS click_us,
               p.value AS value
        FROM events p JOIN events c
          ON p.user_id = c.user_id
         AND epoch_us(c.ts) < epoch_us(p.ts)
         AND epoch_us(c.ts) >= epoch_us(p.ts) - 3600000000
        WHERE p.event_type = 'purchase' AND c.event_type = 'click'"""),
    ),
  )
}
