package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Contracts for the round-10 additions: q66 KMV set algebra, t16
  * language-ID confusion matrix, s18 IVF range search. Each is
  * hash-oracled end-to-end by the driver gate; these specs pin the
  * PROPERTIES the oracle replay alone cannot express.
  */
class SetOpsRangeSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.01"

  test("q66: sketch set-algebra invariants hold for every source pair") {
    val q66 = SparkEntry.queries("q66_kmv_setops")(spark, dir).collect()
    val q65 = SparkEntry.queries("q65_kmv_ndv")(spark, dir)
      .filter(col("source") =!= "ALL")
      .collect()
      .map(r => r.getString(r.fieldIndex("source")) ->
        (r.getDouble(r.fieldIndex("est_ndv")), r.getLong(r.fieldIndex("exact_ndv"))))
      .toMap
    assert(q66.length == q65.size * (q65.size - 1) / 2,
      s"one row per unordered source pair: ${q66.length} vs ${q65.size} sources")
    q66.foreach { r =>
      val a = r.getString(r.fieldIndex("src_a"))
      val b = r.getString(r.fieldIndex("src_b"))
      val estU = r.getDouble(r.fieldIndex("est_union"))
      val estI = r.getDouble(r.fieldIndex("est_inter"))
      val nBoth = r.getLong(r.fieldIndex("n_both"))
      assert(nBoth >= 0 && nBoth <= 64, s"($a,$b): n_both $nBoth outside [0,k]")
      assert(estI >= 0 && estI <= estU + 1e-6,
        s"($a,$b): est_inter $estI exceeds est_union $estU")
      // union estimate must cover the larger side's estimate up to
      // sketch error (~1/sqrt(k) ≈ 12.5%; allow 4 sigma = 50%)
      val maxSide = math.max(q65(a)._1, q65(b)._1)
      assert(estU >= maxSide * 0.5,
        s"($a,$b): est_union $estU implausibly below max side $maxSide")
      // and must not exceed the sum of the exact sides (set algebra)
      val sumExact = q65(a)._2 + q65(b)._2
      assert(estU <= sumExact * 1.5,
        s"($a,$b): est_union $estU implausibly above exact-side sum $sumExact")
    }
  }

  test("t16: confusion rows partition each true language; shares sum to ~1e6") {
    val rows = SparkEntry.queries("t16_langid_confusion")(spark, dir).collect()
    assert(rows.nonEmpty)
    val byLang = rows.groupBy(_.getString(0))
    // every document is in exactly one confusion cell: totals match corpus
    val corpus = graft.Tables.t(spark, dir, "documents")
      .groupBy(col("lang")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    byLang.foreach { case (lang, cells) =>
      val n = cells.map(_.getLong(cells.head.fieldIndex("n"))).sum
      assert(n == corpus(lang), s"$lang: confusion cells sum $n != corpus ${corpus(lang)}")
      val ppm = cells.map(_.getLong(cells.head.fieldIndex("share_ppm"))).sum
      // integer floor division loses < |cells| ppm
      assert(ppm > 1000000L - cells.length && ppm <= 1000000L,
        s"$lang: shares sum $ppm not within floor-division slack of 1e6")
    }
  }

  test("s18: range hits are exactly the probed-cell candidates at cos >= tau") {
    val out = SparkEntry.queries("s18_range_search")(spark, dir).collect()
    assert(out.nonEmpty, "range census must be nonempty at the gate SF")
    out.foreach { r =>
      val cs = r.getDouble(r.fieldIndex("cos_sim"))
      assert(cs >= graft.pipeline.Similarity.RangeTau, s"hit below tau: $cs")
    }
    // consistency with s4: any s4 top-10 neighbor at cos >= tau must be a
    // range hit (same probes, same candidate cells, weaker cut)
    val s4 = SparkEntry.queries("s4_knn_ivf")(spark, dir)
      .filter(col("cos_sim") >= graft.pipeline.Similarity.RangeTau)
      .select(col("qid"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = out.map(r => (r.getLong(r.fieldIndex("qid")),
      r.getLong(r.fieldIndex("vec_id")))).toSet
    assert(s4.subsetOf(hits),
      s"s4 neighbors above tau missing from range output: ${s4.diff(hits)}")
  }
}
