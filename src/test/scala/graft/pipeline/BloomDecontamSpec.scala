package graft.pipeline

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** d11 bloom-prefiltered decontamination: the optimization contracts —
  * no false negatives (d11's final rows equal d9's exactly), real
  * selectivity (the bloom rejects the overwhelming share of clean
  * training spans map-side), and the scale plan shape (a 1-row
  * broadcast carries the bloom; the exact-verify join is a shuffled
  * hash join, NOT a broadcast — d11 models the regime where the raw
  * eval set is too big to broadcast).
  */
class BloomDecontamSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def rows(name: String) =
    SparkEntry.queries(name)(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("d11 equals d9 row-for-row: the bloom admits no false negatives") {
    assert(rows("d11_bloom_decontam") == rows("d9_decontam"),
      "bloom-prefiltered decontamination must reproduce the exact join")
  }

  test("the prefilter is selective: candidates are a small fraction of training spans") {
    val candidates = Dedup.bloomCandidates(spark, dir).count()
    val total = Dedup.spanIndex(spark, dir)
      .filter(col("doc_id") % Dedup.EvalModulus =!= 0).count()
    assert(candidates < total / 5,
      s"bloom passed $candidates of $total training spans — not selective " +
        "(either the bloom is saturated or the probe is broken)")
    // and it is not trivially empty either: true matches must survive
    assert(candidates > 0)
  }

  test("build/probe position consistency: every inserted key passes contains (no false negatives)") {
    // the no-false-negative contract holds ONLY if the distributed
    // build (SQL expressions in bloomOf) and the probe kernel
    // (BloomMaskKernel.contains) derive identical bit positions; this
    // pins that end-to-end over adversarial keys the corpus never
    // produces (0, 2^60-1 boundaries, 32-bit edges, seeded randoms)
    import spark.implicits._
    val rng = new scala.util.Random(42)
    val keys = (Seq(0L, 1L, (1L << 60) - 1, (1L << 32) - 1, 1L << 32) ++
      (0 until 500).map(_ => rng.nextLong() & ((1L << 60) - 1))).distinct
    val mask = Dedup.bloomOf(keys.toDF("h"))
    keys.foreach { k =>
      assert(graft.functions.BloomMaskKernel.contains(k, mask, Dedup.BloomK, Dedup.BloomBits),
        s"inserted key $k not found — build and probe disagree on bit positions")
    }
    // and the filter is not degenerately full: most absent keys miss
    val absent = (0 until 2000).map(_ => rng.nextLong() & ((1L << 60) - 1))
      .filterNot(keys.contains)
    val fp = absent.count(
      graft.functions.BloomMaskKernel.contains(_, mask, Dedup.BloomK, Dedup.BloomBits))
    assert(fp < absent.length / 10,
      s"$fp/${absent.length} false positives — the bloom is saturated or broken")
  }

  test("plan shape: joinless literal-bitmask probe; exact verify joins WITHOUT a broadcast") {
    // the probe stage is a pure map-side filter — no join of any kind
    // (the scalar-join spelling measured 14 s at sf0.1: every probe row
    // materialized a copy of the 128 KB array through the join output)
    val cand = Dedup.bloomCandidates(spark, dir)
    cand.collect()
    val cp = cand.queryExecution.executedPlan.toString
    assert(!cp.contains("Join"),
      s"the bloom probe must be a joinless map-side filter:\n${cp.take(2500)}")
    // executedPlan.toString renders whole-stage-codegen'd nodes with a
    // "*(n)" stage prefix; the probe filter must carry one
    assert(cp.contains("*(1) Filter"),
      s"the membership test must stay inside codegen:\n${cp.take(2500)}")
    assert(cp.contains("bloom_contains(h"),
      s"the probe must be the compact bloom_contains expression " +
        s"(not an element_at chain dumping the mask into the plan):\n${cp.take(2500)}")
    val df = SparkEntry.queries("d11_bloom_decontam")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ShuffledHashJoin"),
      s"the exact-verify join must be the non-broadcast spelling " +
        s"(the raw eval set does not fit as a hash table in d11's regime):\n${p.take(2500)}")
  }
}
