package graft.pipeline

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** d16 (edit-distance verified near-dup) pins: the pair space is exactly
  * the LSH candidate table, the Levenshtein stats match an independent
  * DP, and the lev = 0 diagonal coincides with d1's normalization
  * fingerprint — the cross-operator contract that both dedup verifiers
  * agree on what "identical" means.
  */
class EditNearDupSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  /** Independent reference edit distance (classic full-matrix DP, no
    * banding) — deliberately a different implementation shape from both
    * engines' kernels.
    */
  private def refLev(a: String, b: String): Int = {
    val dp = Array.tabulate(b.length + 1)(identity)
    for (i <- 1 to a.length) {
      var prev = dp(0)
      dp(0) = i
      for (j <- 1 to b.length) {
        val cur = dp(j)
        dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(b.length)
  }

  test("d16 verifies exactly the LSH candidate pairs with exact edit stats") {
    val out = SparkEntry.queries("d16_edit_neardup")(spark, dir).collect()
    val cand = SparkEntry.queries("d3b_lsh_pairs")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet == cand,
      "d16 must verify exactly the LSH candidate pair space")
    val norm = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        Portable.normText(Portable.asciiText(col("text"))).as("nt"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.take(8).foreach { r =>
      val (d1, d2) = (r.getLong(0), r.getLong(1))
      assert(r.getLong(r.fieldIndex("lev")) == refLev(norm(d1), norm(d2)),
        s"lev mismatch vs independent DP on ($d1,$d2)")
    }
    out.foreach { r =>
      val sim = r.getLong(r.fieldIndex("sim_ppm"))
      val maxlen = math.max(norm(r.getLong(0)).length, norm(r.getLong(1)).length)
      assert(sim >= 0L && sim <= 1000000L, s"sim_ppm out of range: $sim")
      if (maxlen > 0)
        assert(sim == (maxlen - r.getLong(r.fieldIndex("lev"))) * 1000000L / maxlen)
      assert(r.getBoolean(r.fieldIndex("is_dup")) == (sim >= Dedup.D16SimPpm))
    }
    // the verdict floor genuinely splits the candidate population
    assert(out.map(_.getBoolean(4)).toSet == Set(true, false),
      "threshold must split the candidates into dup and non-dup")
  }

  // fixture fact: this corpus is all-ASCII, so the ASCII projection d16
  // measures over is the identity and the fingerprint (computed on the
  // UNprojected norm text) coincides with lev = 0. A corpus with
  // multibyte characters could have lev = 0 with distinct fingerprints.
  test("d16's lev=0 diagonal equals d1's normalization fingerprint") {
    val out = SparkEntry.queries("d16_edit_neardup")(spark, dir).collect()
    val fp = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), Portable.normFingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { r =>
      val zero = r.getLong(r.fieldIndex("lev")) == 0L
      val same = fp(r.getLong(0)) == fp(r.getLong(1))
      assert(zero == same,
        s"lev=0 and fingerprint equality disagree on (${r.getLong(0)},${r.getLong(1)})")
    }
  }
}
