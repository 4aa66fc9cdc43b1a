package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Loader normalization contract for `events.ts`. The driver has shipped
  * the column as parquet TIMESTAMP(NANOS) (Spark 4 reads it only as a
  * raw long under `nanosAsLong`) and as TIMESTAMP(MICROS) with no
  * timezone (Spark reads TIMESTAMP_NTZ, which `unix_micros` rejects) —
  * the round-4 regeneration flipped encodings and silently crashed four
  * green queries at analysis time. This spec pins the contract that
  * protects against the NEXT flip: whatever of the three encodings the
  * fixture carries, `Tables.t` yields a session-zoned TIMESTAMP holding
  * the same epoch-microsecond values (the session tz is pinned UTC, so
  * every branch is a pure reinterpretation).
  */
class TablesSpec extends SparkSpec {

  private val us = 1700000000123456L // carries a sub-millisecond part

  private def writeFixture(dir: String, tsCol: org.apache.spark.sql.Column): Unit = {
    import spark.implicits._
    Seq((1L, 7L, "view", 1.0, "{}"))
      .toDF("event_id", "user_id", "event_type", "value", "props")
      .withColumn("ts", tsCol)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  private def loadedMicros(dir: String): Long = {
    val df = Tables.t(spark, dir, "events")
    assert(df.schema("ts").dataType == TimestampType,
      s"loader must yield session TIMESTAMP, got ${df.schema("ts").dataType}")
    df.select(unix_micros(col("ts"))).first().getLong(0)
  }

  test("events loader normalizes every shipped ts encoding to session TIMESTAMP") {
    val base = java.nio.file.Files.createTempDirectory("graft-ts-enc").toString

    // int64 nanos (the nanosAsLong compatibility read)
    writeFixture(s"$base/nanos", lit(us * 1000L))
    assert(loadedMicros(s"$base/nanos") == us)

    // TIMESTAMP_NTZ micros (the round-4 regeneration's encoding)
    writeFixture(s"$base/ntz", timestamp_micros(lit(us)).cast(TimestampNTZType))
    assert(loadedMicros(s"$base/ntz") == us)

    // session-zoned TIMESTAMP micros (passes through untouched)
    writeFixture(s"$base/tz", timestamp_micros(lit(us)))
    assert(loadedMicros(s"$base/tz") == us)
  }
}
