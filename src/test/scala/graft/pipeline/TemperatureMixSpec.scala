package graft.pipeline

import graft.SparkSpec

/** p7 temperature mixture: the budget conserves exactly, every quota is
  * its base-or-base-plus-one largest-remainder value (pinned against an
  * independent BigInt re-derivation from the raw counts), and the
  * α = 0.5 smoothing actually flattens the mix — small domains get a
  * strictly larger per-document share than large ones.
  */
class TemperatureMixSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def run = graft.queries.Registry.all
    .find(_.name == "p7_temperature_mix").get.run(spark, dir)

  test("budget conserves exactly and matches an independent largest-remainder derivation") {
    val rows = run.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._4).sum === Curation.MixBudget, "Σ quota must equal the budget exactly")
    // independent reference: BigInt largest-remainder over the same counts
    val w = rows.map { case (src, n, _, _) =>
      src -> BigInt(math.floor(math.sqrt(n.toDouble) * 1e6 + 0.5).toLong)
    }.toMap
    val tw = w.values.sum
    val b = BigInt(Curation.MixBudget)
    val base = w.map { case (src, ww) => src -> (b * ww / tw) }
    val rem = w.map { case (src, ww) => src -> (b * ww % tw) }
    val deficit = (b - base.values.sum).toInt
    val bumped = rem.toSeq.sortBy { case (src, r) => (-r, src) }.take(deficit).map(_._1).toSet
    rows.foreach { case (src, _, wppm, quota) =>
      assert(BigInt(wppm) === w(src), s"$src: integer micro-weight must match")
      val expect = base(src) + (if (bumped(src)) 1 else 0)
      assert(BigInt(quota) === expect, s"$src: quota must be the largest-remainder value")
    }
  }

  test("uniform fixture allocates uniformly (±1 from remainder bumps)") {
    val quotas = run.collect().map(_.getLong(3))
    assert(quotas.max - quotas.min <= 1,
      "equal-sized domains must receive equal quotas up to the remainder ±1")
  }

  test("p10 epoch plan conserves each language's quota exactly, both repeat regimes") {
    import org.apache.spark.sql.functions._
    val plan = Curation.epochPlan(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    val quotas = Curation.temperatureAlloc(
      spark.read.parquet(s"$dir/documents.parquet")
        .groupBy(col("lang").as("source")).agg(count(lit(1)).as("n_docs")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    // Σ repeats per language == that language's quota, exactly
    plan.groupBy(_._1).foreach { case (lang, rows) =>
      assert(rows.map(_._4).sum === quotas(lang)._2,
        s"$lang: epoch plan must conserve the allocated quota exactly")
      // repeats take at most two adjacent values (full and full+1), and
      // the bumped docs are exactly the hash-order prefix
      val (n, q) = quotas(lang)
      val full = q / n
      val rem = q % n
      rows.foreach { case (_, _, rk, rep) =>
        val expect = full + (if (rk <= rem) 1L else 0L)
        assert(rep === expect, s"$lang rk=$rk: repeats must be $expect, got $rep")
      }
    }
    // both regimes present across the corpus SFs: here (oversample SF)
    // every language's quota exceeds its inventory, so every doc appears
    val langs = quotas.keySet
    assert(plan.map(_._1).toSet === langs)
    assert(quotas.forall { case (_, (n, q)) => q > n },
      "fixture expectation: sf0.001 is the oversampling regime")
    assert(plan.length === quotas.values.map(_._1).sum,
      "oversampling must include every document at least once")
  }

  test("α = 0.5 flattens the mix: small domains get a larger per-doc share") {
    // the testdata sources are uniform, so the flattening contract runs
    // on crafted unequal counts through the same kernel the Q uses
    import spark.implicits._
    val counts = Seq(("tiny", 100L), ("mid", 400L), ("huge", 2500L))
      .toDF("source", "n_docs")
    val out = Curation.temperatureAlloc(counts).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(out.values.map(_._2).sum === Curation.MixBudget)
    // sqrt weights 10:20:50 → quotas 125/250/625
    assert(out("tiny")._2 === 125L && out("mid")._2 === 250L && out("huge")._2 === 625L,
      s"exact sqrt-weight split expected, got $out")
    val share = out.map { case (k, (n, q)) => k -> q.toDouble / n }
    assert(share("tiny") > share("mid") && share("mid") > share("huge"),
      s"per-doc share must fall with domain size, got $share")
  }
}
