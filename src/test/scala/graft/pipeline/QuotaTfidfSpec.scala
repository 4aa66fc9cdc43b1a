package graft.pipeline

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Behavior pins for the round-6 trio p5 / t12 / e13 on crafted fixtures
  * with hand-computed expectations plus invariants on the real testdata.
  */
class QuotaTfidfSpec extends SparkSpec {

  private val realDir = "/root/testdata/sf0.001"
  private val fixtureDir = "target/quota-tfidf-fixture"

  test("p5: every source keeps exactly min(quota, n) docs with dense ranks") {
    val out = SparkEntry.queries("p5_domain_quota")(spark, realDir)
    val per = out.groupBy("source")
      .agg(count(lit(1)).as("n"), max("rk").as("mx"), min("rk").as("mn"),
        countDistinct("rk").as("nd"))
      .collect()
    assert(per.length == 20, "all 20 sources must survive the cap")
    per.foreach { r =>
      assert(r.getLong(1) == Curation.QuotaPerSource, s"quota not binding: $r")
      assert(r.getLong(2) == Curation.QuotaPerSource && r.getLong(3) == 1L
        && r.getLong(4) == Curation.QuotaPerSource, s"ranks not dense 1..quota: $r")
    }
  }

  test("p5: selection is deterministic and hash-ordered, not doc_id-ordered") {
    val a = SparkEntry.queries("p5_domain_quota")(spark, realDir).collect().toSet
    val b = SparkEntry.queries("p5_domain_quota")(spark, realDir).collect().toSet
    assert(a == b, "two runs must select the identical sample")
    // a doc_id-ordered cut would keep exactly the lowest ids per source;
    // the salted-hash order must not degenerate to that
    val firstByIds = graft.Tables.t(spark, realDir, "documents")
      .withColumn("rk0", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy("doc_id")))
      .filter(col("rk0") <= Curation.QuotaPerSource)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val kept = a.map(_.getLong(0))
    assert(kept != firstByIds, "hash order must differ from doc_id order")
  }

  test("t12: a doc's unique term outranks corpus-wide boilerplate") {
    import spark.implicits._
    Seq(
      (1L, "common common zebra"), // zebra: tf=1 df=1 → 1.0; common: tf=2 df=3 → 0.667
      (2L, "common filler filler"),
      (3L, "common filler noise"),
    ).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$fixtureDir/documents.parquet")
    val out = SparkEntry.queries("t12_tfidf")(spark, fixtureDir)
      .filter(col("doc_id") === 1L).orderBy("rk").collect()
    assert(out.map(_.getString(1)).toSeq == Seq("zebra", "common"),
      s"distinctive term must rank first: ${out.mkString(", ")}")
    assert(out(0).getDouble(4) == 1.0 && out(1).getDouble(4) == 0.666667)
  }

  test("t12: at most top-k rows per doc, ranks dense, scores non-increasing") {
    val out = SparkEntry.queries("t12_tfidf")(spark, realDir)
    val bad = out.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), max("rk").as("mx"), countDistinct("rk").as("nd"))
      .filter(col("n") > Text.TfidfTopK || col("mx") =!= col("n") || col("nd") =!= col("n"))
      .count()
    assert(bad == 0, "every doc must carry dense ranks 1..min(k, terms)")
    val inversions = out.as("a").join(out.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.rk") < col("b.rk")
          && col("a.score") < col("b.score"))
      .count()
    assert(inversions == 0, "score must be non-increasing in rank")
  }

  test("e13: batch twin equals the distinct content-key set, nulls distinct") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val in = Seq(
      (ts, Some(7L), "view", Some(42.0)),
      (ts, Some(7L), "view", Some(42.0)),   // exact repeat — must collapse
      (ts, Some(7L), "view", None),         // null value — distinct from 42.0
      (ts, None, "view", Some(42.0)),       // null user — distinct again
      (ts, Some(7L), "click", Some(42.0)),
    ).toDF("ts", "user_id", "event_type", "value")
    val out = graft.streaming.EventStream.dedupStream(in)
      .select("user_id", "event_type", "value").collect()
    assert(out.length == 4, s"4 distinct content keys expected, got ${out.length}")
    // the null-pattern pair must NOT have collided into one fingerprint
    assert(out.count(_.isNullAt(2)) == 1 && out.count(_.isNullAt(0)) == 1)
  }
}
