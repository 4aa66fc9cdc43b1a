package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

class EventStreamSpec extends SparkSpec {
  import EventStream._

  // UTC-anchored (Timestamp.valueOf would read the JVM DEFAULT zone: on
  // a half-hour-offset default like +05:30 the epoch lands mid-UTC-hour
  // and every hour-bucket assertion silently shifts)
  private val specEpochUs: Long =
    java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli * 1000L
  private def ts(minute: Int): Timestamp =
    Timestamp.from(java.time.Instant.ofEpochSecond(
      specEpochUs / 1000000L + minute * 60L))

  test("hourlyCounts over a memory stream matches batch semantics") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Timestamp, String, Double)]
    val df = mem.toDF().toDF("ts", "event_type", "value")
    val query = hourlyCounts(df)
      .writeStream.format("memory").queryName("hourly")
      .outputMode("complete").start()
    try {
      mem.addData(
        (ts(5), "click", 1.0), (ts(30), "click", 2.0),
        (ts(65), "click", 4.0), (ts(10), "view", 8.0))
      query.processAllAvailable()
      val out = spark.table("hourly")
        .orderBy("window_start", "event_type")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      assert(out.toSeq == Seq(
        (ts(0), "click", 2L, 3.0),
        (ts(0), "view", 1L, 8.0),
        (ts(60), "click", 1L, 4.0)))
    } finally query.stop()
  }

  test("segmentRevenue enriches micro-batches against the static dimension") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Timestamp, Long, String, Double)]
    val df = mem.toDF().toDF("ts", "user_id", "event_type", "value")
    val dim = Seq((1L, "BUILDING"), (2L, "MACHINERY"))
      .toDF("c_custkey", "c_mktsegment")
    val query = segmentRevenue(df, dim)
      .writeStream.format("memory").queryName("segrev")
      .outputMode("complete").start()
    try {
      mem.addData(
        (ts(5), 1L, "purchase", 10.0), (ts(6), 1L, "view", 99.0),
        (ts(10), 3L, "purchase", 5.0))
      query.processAllAvailable()
      mem.addData((ts(20), 2L, "purchase", 7.0)) // 2nd micro-batch re-joins the dim
      query.processAllAvailable()
      val out = spark.table("segrev").orderBy("segment").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      assert(out.toSeq == Seq(
        (specEpochUs, "<unknown>", 1L, 5.0), // dimension miss is a bucket, not a drop
        (specEpochUs, "BUILDING", 1L, 10.0), // the view row never enters the funnel
        (specEpochUs, "MACHINERY", 1L, 7.0)))
    } finally query.stop()
  }

  test("dedupStream drops repeats within the watermark, keeps first occurrence") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Timestamp, Long, String, Double)]
    val df = mem.toDF().toDF("ts", "user_id", "event_type", "value")
    val query = dedupStream(df, watermark = "1 hour")
      .writeStream.format("memory").queryName("deduped")
      .outputMode("append").start()
    try {
      mem.addData(
        (ts(0), 1L, "click", 1.0), (ts(5), 1L, "click", 1.0), // dup content
        (ts(10), 2L, "view", 3.0))
      query.processAllAvailable()
      mem.addData((ts(20), 1L, "click", 1.0)) // still inside watermark: dup
      query.processAllAvailable()
      val out = spark.table("deduped").collect()
      assert(out.length == 2, s"expected 2 distinct rows, got ${out.length}")
      val users = out.map(_.getLong(out.head.fieldIndex("user_id"))).toSet
      assert(users == Set(1L, 2L))
    } finally query.stop()
  }

  test("retentionIncrements: streamed triangle equals the batch e6 fixture") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    def wts(w: Int, d: Int = 0): Timestamp =
      Timestamp.valueOf(java.time.LocalDateTime.of(2024, 1, 1, 12, 0)
        .plusDays(w * 7L + d).format(
          java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")))
    val mem = MemoryStream[(Timestamp, Long)]
    val df = mem.toDF().toDF("ts", "user_id")
    val query = EventStream.retentionIncrements(df)
      .writeStream.format("memory").queryName("retention")
      .outputMode("append").start()
    try {
      // same fixture as EventsSpec e6: user 1 weeks 0,1,3 · user 2
      // week 0 · user 3 weeks 2,3 — split across two in-order batches,
      // with within-week repeats that must dedup
      mem.addData((wts(0), 1L), (wts(0, 2), 1L), (wts(1), 1L), (wts(0, 4), 2L))
      query.processAllAvailable()
      mem.addData((wts(3), 1L), (wts(2), 3L), (wts(3, 5), 3L))
      query.processAllAvailable()
      val w0 = java.time.LocalDateTime.of(2024, 1, 1, 0, 0)
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
      val wk = 7L * 86400L * 1000000L
      val triangle = spark.table("retention")
        .groupBy("cohort_us", "week_offset").count()
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(triangle == Map(
        (w0, 0L) -> 2L, (w0, 1L) -> 1L, (w0, 3L) -> 1L,
        (w0 + 2 * wk, 0L) -> 1L, (w0 + 2 * wk, 1L) -> 1L))
    } finally query.stop()
  }

  test("retentionIncrements batch run equals the e6 triangle on real data") {
    val dir = "/root/testdata/sf0.001"
    val batch = EventStream.retentionIncrements(graft.Tables.t(spark, dir, "events"))
      .groupBy("cohort_us", "week_offset").count()
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val e6 = graft.SparkEntry.queries("e6_retention")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(batch == e6 && batch.nonEmpty)
  }

  test("funnelStages: strict order rules, completed funnels evict state") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Timestamp, Long, Long, String)]
    val ds = mem.toDF().toDF("ts", "user_id", "event_id", "event_type")
      .as[FunnelEv]
    val query = funnelStages(ds)
      .writeStream.format("memory").queryName("funnel")
      .outputMode("append").start()
    try {
      mem.addData(
        // user 1: full ordered funnel
        (ts(0), 1L, 1L, "view"), (ts(5), 1L, 2L, "click"), (ts(9), 1L, 3L, "purchase"),
        // user 2: purchase with NO prior click — must stop at view
        (ts(0), 2L, 4L, "view"), (ts(6), 2L, 5L, "purchase"),
        // user 3: click BEFORE any view doesn't count; the later one does
        (ts(0), 3L, 6L, "click"), (ts(2), 3L, 7L, "view"), (ts(4), 3L, 8L, "click"))
      query.processAllAvailable()
      // user 1 completed: a SECOND purchase must be a no-op (state evicted,
      // fresh state stops it at the view rule — no duplicate stage hits)
      mem.addData((ts(20), 1L, 9L, "purchase"))
      query.processAllAvailable()
      val out = spark.table("funnel").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(out == Set(
        (1L, "view"), (1L, "click"), (1L, "purchase"),
        (2L, "view"),
        (3L, "view"), (3L, "click")), s"unexpected stage hits: $out")
    } finally query.stop()
  }

  test("funnelStages batch run equals the e5 funnel counts on real data") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val ev = graft.Tables.t(spark, dir, "events")
      .select(col("ts"), col("user_id"), col("event_id"), col("event_type"))
      .as[FunnelEv]
    val stages = funnelStages(ev).groupBy("stage").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val e5 = graft.SparkEntry.queries("e5_funnel")(spark, dir).collect().head
    val expected = Map(
      "view" -> e5.getLong(e5.fieldIndex("n_view")),
      "click" -> e5.getLong(e5.fieldIndex("n_click")),
      "purchase" -> e5.getLong(e5.fieldIndex("n_purchase")))
    assert(stages == expected, s"stream twin $stages != batch e5 $expected")
  }

  test("attributionJoin pairs purchases with same-user clicks in the preceding hour") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val df = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val query = attributionJoin(df)
      .writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, ts(0), 1L, "click", 0.0),  // 30 min before the purchase: joins
        (2L, ts(29), 1L, "click", 0.0), // 1 min before: joins
        (3L, ts(30), 1L, "purchase", 9.0),
        (4L, ts(35), 1L, "click", 0.0), // after the purchase: no match
        (5L, ts(25), 2L, "click", 0.0)) // other user: no match
      query.processAllAvailable()
      val out = spark.table("attrib").collect()
        .map(r => (r.getLong(r.fieldIndex("purchase_id")),
          r.getLong(r.fieldIndex("click_id")))).toSet
      assert(out == Set((3L, 1L), (3L, 2L)))
    } finally query.stop()
  }

  test("outer attributionJoin: unmatched purchase emits NULL-padded only after watermark expiry") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val df = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val query = attributionJoin(df, "left_outer")
      .writeStream.format("memory").queryName("attrib_outer")
      .outputMode("append").start()
    try {
      def rows = spark.table("attrib_outer").collect()
        .map(r => (r.getLong(r.fieldIndex("purchase_id")),
          if (r.isNullAt(r.fieldIndex("click_id"))) -1L
          else r.getLong(r.fieldIndex("click_id")))).toSet
      mem.addData(
        (1L, ts(0), 1L, "click", 0.0),       // attributable: inner row
        (2L, ts(30), 1L, "purchase", 9.0),   // matched purchase
        (3L, ts(40), 2L, "purchase", 5.0))   // user 2 has no click
      query.processAllAvailable()
      // the NULL-padded row must NOT have surfaced yet: a click for
      // user 2 could still arrive until the watermark passes ts(40)
      assert(rows == Set((2L, 1L)),
        s"unmatched purchase must be withheld before expiry: $rows")
      // push event time far past watermark(2h) + bound(1h) on BOTH
      // sides — the global watermark is the min over the two buffers,
      // so a click-only (or purchase-only) tail leaves the other side's
      // watermark, and with it the eviction clock, frozen — then one
      // more batch so the advanced watermark is applied to state
      mem.addData((4L, ts(600), 3L, "click", 0.0), (5L, ts(601), 3L, "click", 0.0))
      query.processAllAvailable()
      mem.addData((6L, ts(602), 3L, "purchase", 1.0)) // matches clicks 4+5
      query.processAllAvailable()
      mem.addData((7L, ts(603), 3L, "click", 0.0))
      query.processAllAvailable()
      assert(rows == Set((2L, 1L), (6L, 4L), (6L, 5L), (3L, -1L)),
        s"expired unmatched purchase must emit NULL-padded: $rows")
    } finally query.stop()
    // batch twin: same function, horizon spans the input — the
    // unmatched purchase emits immediately
    val batch = Seq(
      (1L, ts(0), 1L, "click", 0.0),
      (2L, ts(30), 1L, "purchase", 9.0),
      (3L, ts(40), 2L, "purchase", 5.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = attributionJoin(batch, "left_outer").collect()
      .map(r => (r.getLong(r.fieldIndex("purchase_id")),
        if (r.isNullAt(r.fieldIndex("click_id"))) -1L
        else r.getLong(r.fieldIndex("click_id")))).toSet
    assert(out == Set((2L, 1L), (3L, -1L)), s"batch twin mismatch: $out")
  }

  test("full attributionJoin: BOTH sides' unmatched rows emit NULL-padded after expiry") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val df = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val query = attributionJoin(df, "full_outer")
      .writeStream.format("memory").queryName("attrib_full")
      .outputMode("append").start()
    try {
      def rows = spark.table("attrib_full").collect()
        .map { r =>
          def idOr(f: String): Long =
            if (r.isNullAt(r.fieldIndex(f))) -1L else r.getLong(r.fieldIndex(f))
          (idOr("purchase_id"), idOr("click_id"))
        }.toSet
      mem.addData(
        (1L, ts(0), 1L, "click", 0.0),     // attributable: inner row
        (2L, ts(30), 1L, "purchase", 9.0), // matched purchase
        (3L, ts(40), 2L, "purchase", 5.0), // no click for user 2
        (4L, ts(50), 4L, "click", 0.0))    // converts nothing
      query.processAllAvailable()
      assert(rows == Set((2L, 1L)),
        s"unmatched rows must be withheld before expiry: $rows")
      // advance BOTH sides' watermarks past the bound, then one more
      // batch so the advanced watermark evicts state (e21's recipe)
      mem.addData((5L, ts(600), 3L, "click", 0.0))
      query.processAllAvailable()
      mem.addData((6L, ts(601), 3L, "purchase", 1.0))
      query.processAllAvailable()
      mem.addData((7L, ts(602), 3L, "click", 0.0))
      query.processAllAvailable()
      assert(rows.contains((3L, -1L)),
        s"expired unmatched PURCHASE must emit NULL-padded: $rows")
      assert(rows.contains((-1L, 4L)),
        s"expired unmatched CLICK must emit NULL-padded (the full-only rows): $rows")
      assert(rows.contains((6L, 5L)), s"cross-batch match must emit: $rows")
    } finally query.stop()
    // batch twin: both unmatched sides emit immediately
    val batch = Seq(
      (1L, ts(0), 1L, "click", 0.0),
      (2L, ts(30), 1L, "purchase", 9.0),
      (3L, ts(40), 2L, "purchase", 5.0),
      (4L, ts(50), 4L, "click", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = attributionJoin(batch, "full_outer").collect()
      .map { r =>
        def idOr(f: String): Long =
          if (r.isNullAt(r.fieldIndex(f))) -1L else r.getLong(r.fieldIndex(f))
        (idOr("purchase_id"), idOr("click_id"))
      }.toSet
    assert(out == Set((2L, 1L), (3L, -1L), (-1L, 4L)), s"batch twin mismatch: $out")
  }

  test("flatMapGroupsWithState sessionization emits closed sessions and keeps open state") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Ev]
    val query = sessionize(mem.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // user 1: two events 10 min apart (one session), then a 45-min gap
      // event that CLOSES it; user 2: single open session (never emitted)
      mem.addData(Ev(ts(0), 1L, 1.0), Ev(ts(10), 1L, 2.0), Ev(ts(5), 2L, 9.0))
      query.processAllAvailable()
      mem.addData(Ev(ts(55), 1L, 4.0))
      query.processAllAvailable()
      val out = spark.table("sessions").collect()
        .map(r => (r.getLong(0), r.getLong(3), r.getDouble(4))).toSeq
      assert(out == Seq((1L, 2L, 3.0))) // closed session: 2 events, value 3.0
    } finally query.stop()
  }

  test("late above-watermark event must not move the session end backwards") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Ev]
    val query = sessionize(mem.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("late_sessions")
      .outputMode("append").start()
    try {
      mem.addData(Ev(ts(0), 1L, 1.0), Ev(ts(20), 1L, 2.0))
      query.processAllAvailable()
      // LATE event at t=5 (watermark is 20-30 < 0, so it's admitted):
      // with an overwrite merge lastUs would regress to 5 and the t=40
      // event (40-5=35 > gap) would WRONGLY split the session the batch
      // twin keeps whole (40-20=20 <= gap)
      mem.addData(Ev(ts(5), 1L, 0.5))
      query.processAllAvailable()
      mem.addData(Ev(ts(40), 1L, 1.0))
      query.processAllAvailable()
      // close the session with a far-future event
      mem.addData(Ev(ts(120), 1L, 9.0))
      query.processAllAvailable()
      val out = spark.table("late_sessions").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSeq
      val us = (m: Int) => ts(m).getTime * 1000
      assert(out == Seq((1L, us(0), us(40), 4L, 4.5)),
        s"one whole session 0->40 with 4 events expected, got $out")
    } finally query.stop()
  }

  test("event-time timeout flushes and evicts idle users' open sessions") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Ev]
    val query = sessionize(mem.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("timeout_sessions")
      .outputMode("append").start()
    try {
      mem.addData(Ev(ts(0), 1L, 1.0))
      query.processAllAvailable()
      // another user's event 5h later pushes the watermark (4:30) far past
      // user 1's timeout (0:30) — the idle open session must be emitted
      mem.addData(Ev(ts(300), 2L, 5.0))
      query.processAllAvailable()
      mem.addData(Ev(ts(301), 2L, 5.0)) // nudge one more batch for the timeout pass
      query.processAllAvailable()
      val out = spark.table("timeout_sessions").collect()
        .map(r => (r.getLong(0), r.getLong(3), r.getDouble(4))).toSeq
      assert(out == Seq((1L, 1L, 1.0)),
        s"idle user's open session must flush via timeout, got $out")
    } finally query.stop()
  }

  test("gapFill live: contiguous prefix of the batch grid, gaps carried, no invented tail") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Timestamp, String, Option[Double])]
    val df = mem.toDF().toDF("ts", "event_type", "value")
    val query = EventStream.gapFill(df)
      .writeStream.format("memory").queryName("gapfill")
      .outputMode("append").start()
    try {
      // A: hours 0 and 3 (interior gap 1–2) · B: hour 1 only ·
      // D: one NULL-value event at hour 0 (n = 1, no LOCF value ever)
      val feed = Seq(
        (ts(10), "A", Some(2.5)), (ts(20), "A", Some(1.25)),
        (ts(185), "A", Some(4.0)),
        (ts(90), "B", Some(7.0)),
        (ts(30), "D", None: Option[Double]))
      mem.addData(feed: _*)
      query.processAllAvailable()
      // C at hour 20 pushes the watermark to 18:00 — far past A/B/D —
      // while its own hour stays open (no invented rows for C)
      mem.addData((ts(20 * 60), "C", Some(1.0)))
      query.processAllAvailable()
      val hr = (i: Int) => specEpochUs + i.toLong * 3600L * 1000000L
      val out = spark.table("gapfill").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSet
      assert(out == Set(
        ("A", hr(0), 2L, Some(3.75)),
        ("A", hr(1), 0L, Some(3.75)), // gap: LOCF carries hour 0's sum
        ("A", hr(2), 0L, Some(3.75)),
        ("A", hr(3), 1L, Some(4.0)),
        ("B", hr(1), 1L, Some(7.0)),
        ("D", hr(0), 1L, None)), // observed hour, no value ever: NULL, not 0
        s"live grid mismatch: $out")
      // prefix property: the live rows equal the batch replay of the
      // same feed restricted to each type's emitted range
      val batch = EventStream.gapFill(
        (feed :+ ((ts(20 * 60), "C", Some(1.0)): (Timestamp, String, Option[Double])))
          .toDF("ts", "event_type", "value"))
        .collect()
        .map(g => (g.event_type, g.hour_us, g.n, g.locf_value))
      val emittedMax = out.groupBy(_._1).map { case (t, rs) => t -> rs.map(_._2).max }
      val batchPrefix = batch.filter(r =>
        emittedMax.get(r._1).exists(r._2 <= _)).toSet
      assert(out == batchPrefix,
        "live emission must be exactly the batch series' per-type prefix")
    } finally query.stop()
  }

  test("file-source stream over the events parquet matches the batch aggregate") {
    val src = java.nio.file.Files.createTempDirectory("graft-stream-src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      src.resolve("events.parquet"))
    val stream = EventStream.readEventStream(spark, src.toString)
    assert(stream.isStreaming)
    val query = EventStream.hourlyCounts(stream)
      .writeStream.format("memory").queryName("file_hourly")
      .outputMode("complete").start()
    try {
      query.processAllAvailable()
      // full (window, type) -> count map, not just the total: a reader
      // that mis-decodes the ts encoding preserves counts while
      // compressing every timestamp into a handful of windows
      val streamed = spark.table("file_hourly")
        .select("window_start", "event_type", "n").collect()
        .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
      val batch = EventStream.hourlyCounts(
          graft.Tables.t(spark, "/root/testdata/sf0.001", "events"))
        .select("window_start", "event_type", "n").collect()
        .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(streamed.nonEmpty && streamed == batch,
        s"streamed hourly windows diverge from batch (${streamed.size} vs ${batch.size} cells)")
    } finally query.stop()
  }

  test("batch sessionize over the events table agrees with the SQL window version") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val batch = graft.Tables.t(spark, dir, "events")
      .select(col("ts"), col("user_id"), col("value")).as[Ev]
    // run the custom stateful logic in BATCH mode (same code path Spark
    // uses for flatMapGroupsWithState batch execution)
    val custom = sessionize(batch).collect()
      .map(s => (s.user_id, s.n_events, math.round(s.total_value * 100)))
      .toSet
    // oracle: the e3 windowed-SQL sessionization, minus its OPEN sessions
    // (flatMapGroupsWithState only emits closed ones)
    val sql = graft.SparkEntry.queries("e3_sessionize")(spark, dir)
    val lastPerUser = sql.groupBy("user_id").agg(max("session_seq").as("last_seq"))
    val closed = sql.join(lastPerUser, Seq("user_id"))
      .filter(col("session_seq") < col("last_seq"))
      .select(col("user_id"), col("n_events"), round(col("session_value") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(custom == closed)
  }

  test("rateAnomaly: streamed closed-hour scores equal the batch replay") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Timestamp, String)]
    val df = mem.toDF().toDF("ts", "event_type")
    val query = EventStream.rateAnomaly(df)
      .writeStream.format("memory").queryName("rate_anomaly")
      .outputMode("append").start()
    try {
      // type "a": 12 warm-up hours alternating 1/2 events, a 5-event
      // spike at hour 12, one event at hour 13
      def hourEvs(h: Int, n: Int): Seq[(Timestamp, String)] =
        (0 until n).map(i => (ts(h * 60 + 5 + i), "a"))
      val warm = (0 until 12).flatMap(h => hourEvs(h, 1 + h % 2))
      mem.addData(warm ++ hourEvs(12, 5) ++ hourEvs(13, 1): _*)
      query.processAllAvailable()
      // hours close when the WATERMARK passes their end (never by mere
      // succession — out-of-order arrival must not undercount). The
      // hour-17 trigger advances the watermark to 15:05, and the
      // hour-19 trigger's in-batch sweep then closes 11/12/13
      // deterministically; 17 and 19 stay open (watermark 17:05 is
      // before 17's end, so no timeout can race the assertion).
      mem.addData(hourEvs(17, 1): _*)
      query.processAllAvailable()
      mem.addData(hourEvs(19, 1): _*)
      query.processAllAvailable()

      val streamed = spark.table("rate_anomaly")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getBoolean(4))).toSet
      // batch replay over the same events scores hours 12 and 13 the
      // same way, plus the still-open hours (17, 19) its end-of-input
      // flush closes
      import spark.implicits._
      val all = warm ++ hourEvs(12, 5) ++ hourEvs(13, 1) ++
        hourEvs(17, 1) ++ hourEvs(19, 1)
      val batch = EventStream.rateAnomaly(all.toDF("ts", "event_type"))
        .collect().map(a => (a.event_type, a.hour_us, a.cnt, a.z, a.is_anomaly)).toSet
      def hourUs(h: Int): Long = specEpochUs + h * 3600L * 1000000L
      assert(streamed.nonEmpty, "expected scored hours from the stream")
      assert(streamed == batch.filterNot(r => r._2 == hourUs(17) || r._2 == hourUs(19)),
        s"stream/batch divergence:\nstream $streamed\nbatch  $batch")
      // the 5-event spike over an alternating-1/2 warm-up must flag
      assert(streamed.exists(r => r._3 == 5L && r._5), s"spike not flagged: $streamed")
    } finally query.stop()
  }

  test("rateAnomaly: ring state survives a checkpointed query restart") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val ckpt = java.nio.file.Files.createTempDirectory("rate-ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("rate-out").toString
    val mem = MemoryStream[(Timestamp, String)]
    // file sink, not memory: only fault-tolerant sinks support
    // checkpoint recovery — which is the property under test
    def startQuery() = EventStream.rateAnomaly(mem.toDF().toDF("ts", "event_type"))
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    def hourEvs(h: Int, n: Int): Seq[(Timestamp, String)] =
      (0 until n).map(i => (ts(h * 60 + 5 + i), "a"))
    // run 1: build the 12-hour warm-up ring, then STOP mid-stream
    val q1 = startQuery()
    try {
      mem.addData((0 until 12).flatMap(h => hourEvs(h, 1 + h % 2)): _*)
      q1.processAllAvailable()
    } finally q1.stop()
    // run 2: same checkpoint — the spike must be scored against the ring
    // built BEFORE the restart (a state loss would leave <12 samples and
    // emit nothing)
    val q2 = startQuery()
    try {
      mem.addData(hourEvs(12, 5) ++ hourEvs(13, 1): _*)
      q2.processAllAvailable()
      mem.addData(hourEvs(17, 1): _*)
      q2.processAllAvailable()
      mem.addData(hourEvs(19, 1): _*)
      q2.processAllAvailable()
      val scored = spark.read.parquet(outDir)
        .select("hour_us", "cnt", "is_anomaly")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      assert(scored.exists(r => r._1 == specEpochUs + 12L * 3600L * 1000000L
          && r._2 == 5L && r._3),
        s"hour-12 spike must score against the pre-restart ring: ${scored.mkString(", ")}")
    } finally q2.stop()
  }

  test("rateAnomaly: out-of-order events within the watermark never undercount an hour") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Timestamp, String)]
    val query = EventStream.rateAnomaly(mem.toDF().toDF("ts", "event_type"))
      .writeStream.format("memory").queryName("rate_ooo")
      .outputMode("append").start()
    try {
      def hourEvs(h: Int, n: Int): Seq[(Timestamp, String)] =
        (0 until n).map(i => (ts(h * 60 + 5 + i), "a"))
      mem.addData((0 until 12).flatMap(h => hourEvs(h, 1 + h % 2)): _*)
      query.processAllAvailable()
      mem.addData(hourEvs(12, 2) ++ hourEvs(13, 1): _*) // watermark → 11:05
      query.processAllAvailable()
      // 12:30 arrives AFTER hour 13's event but ABOVE the watermark — the
      // 2 h tolerance promises it still counts (a close-on-succession
      // design would have sealed hour 12 already and dropped it)
      mem.addData((ts(12 * 60 + 30), "a"))
      query.processAllAvailable()
      mem.addData(hourEvs(16, 1): _*) // watermark → 14:05: closes 12 and 13
      query.processAllAvailable()
      val hour12 = spark.table("rate_ooo")
        .collect().map(r => (r.getLong(1), r.getLong(2)))
        .find(_._1 == specEpochUs + 12L * 3600L * 1000000L)
      assert(hour12.exists(_._2 == 3L),
        s"hour 12 must close with all 3 events counted, got $hour12")
    } finally query.stop()
  }
}
