package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.sql.Timestamp

class DocStreamSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  private val longEn =
    (1 to 30).map(_ => "the table is of value").mkString(" ") // 150 words, en

  test("curationIngest gates short docs and dedups repeats within the watermark") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Timestamp, Long, String)]
    val df = mem.toDF().toDF("ingest_ts", "doc_id", "text")
    val query = DocStream.curationIngest(df, watermark = "1 hour")
      .writeStream.format("memory").queryName("curated")
      .outputMode("append").start()
    try {
      mem.addData(
        (ts(0), 1L, longEn),
        (ts(2), 2L, "too short"), // < MinWords: gated out
        (ts(5), 3L, "  " + longEn + " "), // same normalized content as 1: dup
        (ts(9), 4L, (1 to 40).map(_ => "der und ist die").mkString(" ")))
      query.processAllAvailable()
      mem.addData((ts(30), 5L, longEn)) // still inside watermark: dup
      query.processAllAvailable()
      val out = spark.table("curated").collect()
      val ids = out.map(_.getLong(out.head.fieldIndex("doc_id"))).toSet
      assert(ids == Set(1L, 4L), s"expected docs 1 and 4, got $ids")
      val langs = out.map(r =>
        r.getLong(r.fieldIndex("doc_id")) -> r.getString(r.fieldIndex("pred_lang"))).toMap
      assert(langs(1L) == "en" && langs(4L) == "de", s"bad lang predictions: $langs")
      val nWords = out.collectFirst {
        case r if r.getLong(r.fieldIndex("doc_id")) == 1L => r.getInt(r.fieldIndex("n_words"))
      }.get
      assert(nWords == 150)
    } finally query.stop()
  }

  test("deltaIngest rejects lake-held content at ingest, keeps fresh docs") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val mem = MemoryStream[(Timestamp, Long, String)]
    val df = mem.toDF().toDF("ingest_ts", "doc_id", "text")
    // the lake holds longEn's normalized fingerprint (leading/trailing
    // whitespace differs from the arriving doc — normalization must match)
    val lake = Seq("  " + longEn + "  ").toDF("text")
      .select(md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")).as("fingerprint"))
    val freshDe = (1 to 40).map(_ => "der und ist die").mkString(" ")
    val query = DocStream.deltaIngest(df, lake, watermark = "1 hour")
      .writeStream.format("memory").queryName("delta_ingest")
      .outputMode("append").start()
    try {
      mem.addData(
        (ts(0), 1L, longEn), // lake dup: rejected by the static anti-join
        (ts(2), 2L, freshDe), // fresh: survives
        (ts(5), 3L, freshDe)) // in-window repeat of 2: deduped
      query.processAllAvailable()
      val ids = spark.table("delta_ingest").collect()
        .map(r => r.getLong(r.fieldIndex("doc_id"))).toSet
      assert(ids == Set(2L), s"expected only the fresh doc 2, got $ids")
    } finally query.stop()
  }

  test("curationIngest fingerprint matches the batch d1/p1 fingerprint") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val mem = MemoryStream[(Timestamp, Long, String)]
    val df = mem.toDF().toDF("ingest_ts", "doc_id", "text")
    val query = DocStream.curationIngest(df)
      .writeStream.format("memory").queryName("curated_fp")
      .outputMode("append").start()
    try {
      mem.addData((ts(0), 1L, "  " + longEn.toUpperCase + "  "))
      query.processAllAvailable()
      val out = spark.table("curated_fp").collect()
      assert(out.length == 1)
      // the batch pipelines normalize identically (lower/trim/ws-collapse)
      val expected = Seq(longEn).toDF("text")
        .select(md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")))
        .head.getString(0)
      assert(out.head.getString(out.head.fieldIndex("fingerprint")) == expected,
        "streaming fingerprint must equal the batch normalization's")
    } finally query.stop()
  }
}
