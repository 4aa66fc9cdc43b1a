package graft.multimodal

import graft.SparkSpec
import graft.functions.AudioKernel
import org.apache.spark.sql.functions._

/** m11 audio kernels: row-level contracts behind the aggregate gate —
  * generator determinism and geometry, hand-computed feature values on
  * crafted payloads, loud failure on malformed geometry, and the
  * map-only (zero-Exchange) plan shape.
  */
class AudioSpec extends SparkSpec {

  test("pcm_gen is deterministic, correctly sized, and mixes silent and tone frames") {
    val a = AudioKernel.gen(7L, 8, 64)
    val b = AudioKernel.gen(7L, 8, 64)
    assert(a.length == 512 && java.util.Arrays.equals(a, b))
    // frame f silent iff (7*7 + f) % 4 == 0 -> f = 3, 7 for id 7
    val st = AudioKernel.stats(a, 64, Multimodal.SilenceEnergy)
    assert(st(0) == 8L, "n_frames")
    assert(st(1) == 2L, s"id 7 must have exactly frames 3 and 7 silent, got ${st(1)}")
  }

  test("stats are exact on a crafted payload") {
    // frame 0: all 128 (zero energy); frame 1: alternating 118/138
    val p = new Array[Byte](8)
    p(0) = 128.toByte; p(1) = 128.toByte; p(2) = 128.toByte; p(3) = 128.toByte
    p(4) = 118.toByte; p(5) = 138.toByte; p(6) = 118.toByte; p(7) = 138.toByte
    val st = AudioKernel.stats(p, 4, 100L)
    assert(st(0) == 2L, "two frames")
    assert(st(1) == 1L, "only the zero frame is below the 100 gate (frame 1 energy = 400)")
    assert(st(3) == 400L, s"peak energy 4*(10^2), got ${st(3)}")
    assert(st(2) == 1L, "peak is frame 1")
    // crossings: 128(at)->118(below) counts (128 is 'at-or-above'), then
    // 118->138, 138->118, 118->138: total 4
    assert(st(4) == 4L, s"zero crossings, got ${st(4)}")
    assert(st(5) == 400L, "total energy")
  }

  test("peak_frame is the FIRST frame attaining the max energy") {
    // two identical loud frames: argmax must return the first
    val p = Array.fill[Byte](8)(138.toByte)
    val st = AudioKernel.stats(p, 4, 1L)
    assert(st(2) == 0L && st(3) == 400L)
  }

  test("malformed geometry fails loudly") {
    intercept[IllegalArgumentException] {
      AudioKernel.stats(new Array[Byte](65), 64, 1000L)
    }
    intercept[IllegalArgumentException] {
      AudioKernel.gen(1L, 1 << 20, 64) // over the sample cap
    }
  }

  test("m11 plans map-only: zero Exchange, whole-stage codegen") {
    val df = Multimodal.all.find(_.name == "m11_audio_features").get
      .run(spark, "/root/testdata/sf0.001")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"audio features must not shuffle:\n${p.take(2000)}")
    // "*(n)" is the executedPlan rendering of a WholeStageCodegen span
    assert(p.contains("*(1)"), s"kernels must stay inside codegen:\n${p.take(2000)}")
  }

  test("silence gate sits far from both synthetic populations (not knife-edge)") {
    val rows = Multimodal.all.find(_.name == "m11_audio_features").get
      .run(spark, "/root/testdata/sf0.001")
      .select(col("n_frames"), col("n_silent"), col("peak_energy")).collect()
    assert(rows.nonEmpty)
    // every asset has nonsilent frames, and peaks are orders above the gate
    rows.foreach { r =>
      assert(r.getAs[Long]("n_silent") < r.getAs[Long]("n_frames"))
      assert(r.getAs[Long]("peak_energy") > 100L * Multimodal.SilenceEnergy)
    }
  }
}
