package graft.queries

import graft.{SparkEntry, SparkSpec}
import graft.sources.Ingest
import org.apache.spark.sql.functions._

/** q40 JSONL ingest: the quarantine and round-trip contracts the SQL
  * oracle can't see (it reads the original parquet, which never saw
  * the injected corruption).
  */
class IngestSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("PERMISSIVE read quarantines exactly the injected corrupt lines") {
    // Spark disallows queries whose referenced columns are ONLY the
    // corrupt-record column on a raw JSON scan — cache the parsed
    // result first (the documented pattern, and what a real quarantine
    // job does anyway before splitting good/bad outputs)
    val df = Ingest.readJsonlDocs(spark, dir).cache()
    try {
    df.count()
    val bad = df.filter(col("_corrupt_record").isNotNull)
      .select("_corrupt_record").collect().map(_.getString(0)).sorted
    assert(bad.toSeq == Ingest.CorruptLines.sorted,
      s"quarantine must hold exactly the injected lines, got ${bad.mkString("|")}")
    // the type-mismatch line must NOT leak into the good rows as a
    // half-parsed record (doc_id null, lang 'en' would shift counts)
    val good = df.filter(col("_corrupt_record").isNull)
    assert(good.filter(col("doc_id").isNull).count() == 0)
    assert(good.count() ==
      graft.Tables.t(spark, dir, "documents").count())
    } finally df.unpersist(blocking = true)
  }

  test("JSONL round trip preserves every field bit-for-bit") {
    val orig = graft.Tables.t(spark, dir, "documents")
    val back = Ingest.readJsonlDocs(spark, dir)
      .filter(col("_corrupt_record").isNull)
      .select("doc_id", "text", "lang", "source", "n_chars")
    assert(back.except(orig).count() == 0)
    assert(orig.except(back).count() == 0)
  }

  test("streaming ingest twin: file-source stream over the JSONL dir matches batch, quarantine included") {
    // the live shape of q40: a readStream over the landing directory
    // with the SAME schema-first PERMISSIVE contract — new vendor
    // shards stream in as they arrive, corrupt lines still quarantine
    val path = Ingest.jsonlDocsPath(spark, dir)
    val stream = spark.readStream
      .schema(Ingest.DocJsonSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
    assert(stream.isStreaming)
    val agg = stream
      .groupBy(col("_corrupt_record").isNotNull.as("quarantined"), col("lang"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"))
    val query = agg.writeStream.format("memory").queryName("jsonl_ingest")
      .outputMode("complete").start()
    try {
      query.processAllAvailable()
      val streamed = spark.table("jsonl_ingest").collect()
        .map(r => (r.getBoolean(0), Option(r.getString(1)).getOrElse("")) ->
          (r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
      val batch = Ingest.readJsonlDocs(spark, dir)
        .groupBy(col("_corrupt_record").isNotNull.as("quarantined"), col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"))
        .collect()
        .map(r => (r.getBoolean(0), Option(r.getString(1)).getOrElse("")) ->
          (r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
      assert(streamed.nonEmpty && streamed == batch,
        s"streamed ingest diverges from batch: $streamed vs $batch")
      // corrupt lines are present as their own quarantine cell
      assert(streamed.keys.exists(_._1), "quarantine cell must appear in the stream")
    } finally query.stop()
  }

  test("q42 schema evolution: merged read nulls `source` exactly on the pre-evolution shard") {
    val df = spark.read.option("mergeSchema", "true")
      .parquet(Ingest.evolvedDocsPath(spark, dir))
    // the union schema resolves with `source` present
    assert(df.columns.contains("source"))
    val rows = df.select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, src) =>
      if (id % 2 == 0) assert(src.isEmpty, s"old-shard doc $id must read NULL source")
      else assert(src.nonEmpty, s"new-shard doc $id must keep its source")
    }
    // both shards present: the read covers the whole table
    assert(rows.length == graft.Tables.t(spark, dir, "documents").count())
  }

  test("q40 equals the same aggregate computed directly on the parquet table") {
    graft.functions.GraftFunctions.register(spark)
    val viaJsonl = SparkEntry.queries("q40_jsonl_ingest")(spark, dir)
      .collect().map(_.toString).toSet
    val direct = graft.Tables.t(spark, dir, "documents")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
        expr("bit_xor(md5_long(CAST(doc_id AS STRING)))").as("id_xor"))
      .collect().map(_.toString).toSet
    assert(viaJsonl == direct)
  }
}
