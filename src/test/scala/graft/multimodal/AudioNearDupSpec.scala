package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** m12 re-encode-invariant audio near-dup: pins the two sides of the
  * contract — the perceptual fingerprint is EXACTLY invariant under
  * pcm_requant (every variant finds its source), while the payload
  * hash m1 relies on misses every variant (every byte changed).
  */
class AudioNearDupSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def q(name: String) = graft.queries.Registry.all.find(_.name == name).get

  private def audioAssets = {
    graft.functions.GraftFunctions.register(spark)
    graft.Tables.t(spark, dir, "documents")
      .filter(pmod(col("doc_id"), lit(3)) === 1)
      .select(col("doc_id").as("id"),
        (pmod(col("doc_id"), lit(20)) + 4).cast("int").as("nf"))
      .withColumn("pcm", call_function("pcm_gen", col("id"), col("nf"),
        lit(Multimodal.FrameBytes)))
  }

  test("m12: every variant matches its true source; no variant is payload-identical") {
    val m12 = q("m12_audio_neardup").run(spark, dir).cache()
    try {
      assert(m12.count() > 0, "gate corpus must produce variants")
      assert(m12.filter(col("src_matched") =!= 1).count() == 0,
        "the fingerprint is exactly requant-invariant: every variant finds its source")
      // energy really changed ~4x down — the receipt that bytes differ
      assert(m12.filter(col("gain_ppm") < 200000 || col("gain_ppm") > 300000).count() == 0,
        "half-gain requant lands near 1/4 energy in ppm")
    } finally m12.unpersist(blocking = true)
  }

  test("pcm_requant preserves zero-crossings and silence EXACTLY, changes every byte") {
    val a = audioAssets
      .withColumn("vcm", call_function("pcm_requant", col("pcm")))
      .withColumn("so", call_function("audio_stats", col("pcm"),
        lit(Multimodal.FrameBytes), lit(Multimodal.SilenceEnergy)))
      .withColumn("sv", call_function("audio_stats", col("vcm"),
        lit(Multimodal.FrameBytes), lit(Multimodal.SilenceEnergy)))
    val bad = a.filter(
      element_at(col("so"), 1) =!= element_at(col("sv"), 1) ||   // n_frames
        element_at(col("so"), 2) =!= element_at(col("sv"), 2) || // n_silent
        element_at(col("so"), 5) =!= element_at(col("sv"), 5))   // zero_crossings
    assert(bad.count() == 0, "the three fingerprint fields are invariants of requant")
    assert(a.filter(md5(col("pcm")) === md5(col("vcm"))).count() == 0,
      "every asset's requant differs in payload — the m1 exact hash misses all of them")
    assert(a.filter(element_at(col("sv"), 6) * 3 > element_at(col("so"), 6)).count() == 0,
      "variant energy is at most ~1/4 of the source's (strictly under 1/3)")
  }
}
