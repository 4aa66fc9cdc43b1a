package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** m10 temporal frame dedup: the fixture's repeat structure really
  * produces static runs (longest_run ≥ the injected repeat count,
  * segments strictly fewer than frames), the run accounting matches an
  * independent Scala recomputation frame-by-frame, and the windows
  * never collapse to a single partition.
  */
class TemporalDedupSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def run = graft.queries.Registry.all
    .find(_.name == "m10_temporal_dedup").get.run(spark, dir)

  test("every asset collapses: longest run covers the injected repeats") {
    val rows = run.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty, "fixture must produce video assets")
    rows.foreach { case (id, nf, ns, lr) =>
      val reps = id % 4 + 2
      assert(lr >= reps, s"asset $id: longest run $lr must cover the $reps injected repeats")
      assert(ns < nf, s"asset $id: segments $ns must be fewer than frames $nf")
      assert(ns >= 1 && lr <= nf)
    }
  }

  test("run accounting matches an independent frame-by-frame recomputation") {
    val hw = 2 * Multimodal.FrameBytes
    val sample = Multimodal.videoHex(spark, dir).limit(25).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val got = run.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(sample.nonEmpty)
    sample.foreach { case (id, vhx) =>
      val frames = vhx.grouped(hw).toSeq
      val runs = frames.foldLeft(List.empty[(String, Long)]) {
        case ((h, n) :: tail, f) if h == f => (h, n + 1) :: tail
        case (acc, f) => (f, 1L) :: acc
      }
      val expect = (frames.size.toLong, runs.size.toLong, runs.map(_._2).max)
      assert(got(id) === expect, s"asset $id: (frames, segments, longest) must match")
    }
  }

  test("the run windows stay asset-partitioned — no single-partition collapse") {
    val df = run
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("SinglePartition"),
      s"m10 must never plan a corpus-wide single-partition window:\n${p.take(2500)}")
  }
}
