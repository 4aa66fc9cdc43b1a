package graft.pipeline

import graft.{SparkSpec, SparkEntry}
import org.apache.spark.sql.functions._

/** End-to-end invariants of the p1 curation pipeline — the properties a
  * training-set consumer relies on, checked on real testdata (the
  * DuckDB hash oracle pins exact values; these pin the SEMANTICS).
  */
class CurationSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private lazy val manifest =
    SparkEntry.queries("p1_curation")(spark, dir).cache()

  test("every manifest row satisfies the length gate") {
    val bad = manifest
      .filter(col("n_words") < Curation.MinWords || col("n_words") > Curation.MaxWords)
      .count()
    assert(bad == 0, s"$bad rows escaped the length gate")
  }

  test("no verified near-dup pair survives intact in the manifest") {
    val dups = Dedup.lshVerifiedPairs(spark, dir).filter(col("is_dup"))
    val ids = manifest.select("doc_id")
    val survivingPairs = dups
      .join(ids.withColumnRenamed("doc_id", "doc1"), "doc1")
      .join(ids.withColumnRenamed("doc_id", "doc2"), "doc2")
      .count()
    assert(survivingPairs == 0,
      s"$survivingPairs verified near-dup pairs fully survived curation")
  }

  test("manifest doc_ids are unique and drawn from the corpus") {
    val n = manifest.count()
    assert(manifest.select("doc_id").distinct().count() == n)
    val corpus = graft.Tables.t(spark, dir, "documents").select("doc_id")
    assert(manifest.select("doc_id").join(corpus, Seq("doc_id"), "left_anti").count() == 0)
  }

  test("the canonical (lowest-id) copy survives exact dedup, not an arbitrary one") {
    // every gated doc's fingerprint group keeps exactly its min doc_id;
    // equivalently: no manifest doc has a LOWER-id twin with the same
    // fingerprint in the gated corpus
    val gated = graft.Tables.t(spark, dir, "documents")
      .select(col("doc_id"), Portable.normFingerprint(col("text")).as("fingerprint"),
        Portable.nWords(col("text")).as("n_words"))
      .filter(col("n_words").between(Curation.MinWords, Curation.MaxWords))
    val minPerFp = gated.groupBy("fingerprint").agg(min("doc_id").as("min_id"))
    val nonCanonical = manifest
      .join(gated.select(col("doc_id"), col("fingerprint")), "doc_id")
      .join(minPerFp, "fingerprint")
      .filter(col("doc_id") =!= col("min_id"))
      .count()
    assert(nonCanonical == 0, s"$nonCanonical non-canonical copies survived")
  }
}
