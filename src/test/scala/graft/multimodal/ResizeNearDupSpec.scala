package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** m7 resize-invariant media near-dup: the contracts behind the
  * variant-match gate — (a) the canonical-composition identity
  * resize(resize(O, g×g), 8×8) == resize(O, 8×8) holds byte-for-byte
  * when 8 | g, so every re-encoded variant's canonical fingerprint
  * equals its source's; (b) every variant therefore matches its source
  * through the fingerprint join; (c) the raw-payload SimHash rule (m6)
  * MISSES those same pairs — resized copies land far apart in payload
  * hamming space — which is exactly why the canonicalize-then-
  * fingerprint shape exists.
  */
class ResizeNearDupSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("canonical thumbnail fingerprint is resize-invariant: variant fp == source fp") {
    val fp = Multimodal.thumbFpIndex(spark, dir)
    val v = fp.filter(col("is_var") === 1)
      .select(col("src"), col("fp").as("vfp"))
    val o = fp.filter(col("is_var") === 0)
      .select(col("mid").as("src"), col("fp").as("ofp"))
    val joined = v.join(o, "src").cache()
    try {
      val n = joined.count()
      assert(n > 0, "fixture must produce variants")
      assert(joined.filter(col("vfp") =!= col("ofp")).count() == 0L,
        "NN index-map composition must be exact for 8|g: variant and source " +
          "canonical thumbnails must fingerprint identically")
    } finally joined.unpersist(blocking = true)
  }

  test("m7 matches every variant to its source; both variant geometries exercised") {
    val out = graft.queries.Registry.all.find(_.name == "m7_resize_neardup").get
      .run(spark, dir).cache()
    try {
      val rows = out.collect()
      assert(rows.nonEmpty)
      assert(rows.forall(_.getAs[Int]("src_matched") == 1),
        "every re-encoded variant must match its source through the canonical fingerprint")
      assert(rows.forall(_.getAs[Long]("n_matches") >= 1L))
      // both re-encode geometries (24×24 for id%4=0, 16×16 otherwise) present
      val srcs = rows.map(_.getAs[Long]("src_id"))
      assert(srcs.exists(_ % 4 == 0) && srcs.exists(s => s % 2 == 0 && s % 4 != 0),
        "fixture must exercise both variant geometries")
    } finally out.unpersist(blocking = true)
  }

  test("raw-payload SimHash (m6's rule) misses resized pairs that m7 catches") {
    graft.functions.GraftFunctions.register(spark)
    val vPh = Multimodal.rasterVariants(spark, dir).select(col("src"),
      call_function("byte_simhash", col("payload"), lit(32)).as("vph"))
    val oPh = Multimodal.rasterBlobs(spark, dir).select(col("id").as("src"),
      call_function("byte_simhash", col("payload"), lit(32)).as("oph"))
    val hams = vPh.join(oPh, "src")
      .select(expr("bit_count(vph ^ oph)").as("hamming"))
      .collect().map(_.getAs[Int]("hamming"))
    assert(hams.nonEmpty)
    // m6 pairs at hamming <= 3; a geometry change rewrites the byte
    // stream, so (source, resized copy) pairs overwhelmingly exceed it
    assert(hams.count(_ > 3) > 0,
      "fixture must contain resized pairs the raw-payload SimHash rule misses")
    assert(hams.count(_ > 3).toDouble / hams.length > 0.5,
      s"most resized pairs should be invisible to payload SimHash, got ${hams.toSeq}")
  }

  test("fingerprint match plans as a hash join on fp, never a cartesian product") {
    val df = graft.queries.Registry.all.find(_.name == "m7_resize_neardup").get
      .run(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"m7 must meet candidates through the fp equi-join:\n${p.take(2500)}")
  }
}
