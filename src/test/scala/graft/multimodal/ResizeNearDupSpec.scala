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

  test("m8 carries m7's exact matches at hamming 0 and catches watermarked pairs m7 misses") {
    val mx = Multimodal.rasterBlobs(spark, dir).agg(max(col("id"))).collect()(0).getLong(0)
    val m8 = graft.queries.Registry.all.find(_.name == "m8_phash_neardup").get
      .run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Int]("hamming")))
    // every resize-variant pair (src, src + mx + 1) lands at hamming 0:
    // the canonical-composition identity carries into the SimHash space.
    // `a <= mx` pins a to the ORIGINAL id range — without it a
    // (variant-of-k, watermarked-of-k) pair also differs by mx + 1
    val resizePairs = m8.filter { case (a, b, _) => a <= mx && b == a + mx + 1 }
    assert(resizePairs.nonEmpty)
    assert(resizePairs.forall(_._3 == 0),
      s"resized copies must fingerprint identically: ${resizePairs.filter(_._3 != 0).take(5).toSeq}")
    // watermarked copies (src + 2(mx+1)): one edited pixel moves the
    // thumbnail a few hamming bits — some land within the pigeonhole
    // tolerance, and every one of those is invisible to m7's exact md5
    val wmPairs = m8.filter { case (a, b, _) => a <= mx && b == a + 2 * (mx + 1) }
    assert(wmPairs.nonEmpty,
      "fixture must catch watermarked pairs within hamming tolerance")
    assert(wmPairs.exists(_._3 >= 1),
      "a watermarked pair at hamming >= 1 is exactly what exact-fingerprint matching cannot see")
    val fp = Multimodal.thumbFpIndex(spark, dir)
    // m7's table does not even contain the watermarked class — and the
    // edited thumbnail's md5 differs from its source's, so an
    // exact-fingerprint join could never pair them
    val srcFp = fp.filter(col("is_var") === 0).select(col("mid"), col("fp")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    graft.functions.GraftFunctions.register(spark)
    val wmFp = Multimodal.watermarkedRasters(spark, dir)
      .select(col("src"),
        md5(lower(hex(call_function("resize_nn",
          col("payload"), col("w"), col("h"),
          lit(Multimodal.ThumbW), lit(Multimodal.ThumbH))))).as("wfp"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    // ids whose pixel (0,0) already equals the 0x2A stamp (id·31 ≡ 42
    // mod 256, i.e. id ≡ 150 mod 256) get a NO-OP watermark — their
    // thumbnails legitimately keep the source fingerprint; every
    // actually-edited copy must lose it
    val edited = wmFp.filter { case (src, _) => java.lang.Math.floorMod(src * 31, 256) != 42 }
    assert(edited.nonEmpty && edited.forall { case (src, wfp) => srcFp(src) != wfp },
      "every actually-edited watermarked thumbnail must differ from its source's exact fingerprint")
  }

  test("fingerprint match plans as a hash join on fp, never a cartesian product") {
    val df = graft.queries.Registry.all.find(_.name == "m7_resize_neardup").get
      .run(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"m7 must meet candidates through the fp equi-join:\n${p.take(2500)}")
  }

  test("m8's pigeonhole match plans as a piece equi-join, never a cartesian product") {
    val df = graft.queries.Registry.all.find(_.name == "m8_phash_neardup").get
      .run(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"m8 must meet candidates through the piece equi-join:\n${p.take(2500)}")
  }
}
