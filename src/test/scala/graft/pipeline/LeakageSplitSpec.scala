package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** p6 leakage-safe split + d13 canonical pick: the two consumers of the
  * corpus-wide cluster-root map. Pins p6's atomicity (no near-dup
  * cluster straddles splits), its singleton degeneration to p4, the
  * existence of the leakage p4 alone cannot prevent, and d13's
  * keeper contract (one keeper per cluster, max-words rule, total
  * per-doc survivorship map).
  */
class LeakageSplitSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def q(name: String) = graft.queries.Registry.all.find(_.name == name).get

  test("p6: no cluster straddles splits; singletons degenerate to p4 exactly") {
    val p6 = q("p6_leakage_split").run(spark, dir).cache()
    try {
      val straddle = p6.groupBy("root").agg(countDistinct("split").as("n"))
        .filter(col("n") > 1).count()
      assert(straddle == 0, s"$straddle clusters straddle splits — the leakage p6 exists to prevent")
      val p4 = q("p4_split_assign").run(spark, dir)
        .select(col("doc_id"), col("split").as("p4_split"))
      val diverged = p6.filter(col("root") === col("doc_id"))
        .join(p4, "doc_id")
        .filter(col("split") =!= col("p4_split")).count()
      assert(diverged == 0,
        "outside clusters p6 must be bit-identical to p4 (same salt, root = doc_id)")
    } finally p6.unpersist(blocking = true)
  }

  test("the per-doc hash split WOULD straddle a cluster the root hash keeps whole") {
    val cc = q("d6_dup_clusters").run(spark, dir)
    val p4 = q("p4_split_assign").run(spark, dir).select("doc_id", "split")
    val straddled = cc.join(p4, "doc_id").groupBy("root")
      .agg(countDistinct("split").as("n")).filter(col("n") > 1).count()
    assert(straddled > 0,
      "gate corpus must exhibit the train/eval leakage a per-doc hash cannot prevent")
  }

  test("d13: total survivorship map, one max-words keeper per cluster") {
    val d13 = q("d13_canonical_pick").run(spark, dir).cache()
    try {
      val nDocs = graft.Tables.t(spark, dir, "documents").count()
      assert(d13.count() == nDocs, "one row per document")
      assert(d13.select("doc_id").distinct().count() == nDocs, "doc_id is unique")
      // exactly one keeper per root, and the keeper is a member of its root
      val keepers = d13.filter(col("kept"))
      assert(keepers.groupBy("root").count().filter(col("count") =!= 1).count() == 0,
        "every cluster must keep exactly one member")
      assert(d13.filter(col("kept") =!= (col("doc_id") === col("keep_id"))).count() == 0,
        "kept must mean doc_id == keep_id")
      assert(d13.join(keepers.select(col("root"), col("doc_id").as("k")), "root")
        .filter(col("keep_id") =!= col("k")).count() == 0,
        "every member must resolve to its own cluster's keeper")
      // the keeper rule: no member of a cluster has more words than its keeper
      val nw = graft.Tables.t(spark, dir, "documents")
        .select(col("doc_id"), Portable.nWords(col("text")).as("n_words"))
      val withW = d13.join(nw, "doc_id")
      val keeperW = withW.filter(col("kept"))
        .select(col("root"), col("n_words").as("kw"))
      assert(withW.join(keeperW, "root").filter(col("n_words") > col("kw")).count() == 0,
        "a keeper must have the maximum word count in its cluster")
    } finally d13.unpersist(blocking = true)
  }

  test("p6/d13 plan over the cluster artifact — no cartesian, no nested-loop join") {
    for (name <- Seq("p6_leakage_split", "d13_canonical_pick")) {
      val df = q(name).run(spark, dir)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$name must stay equi-join shaped:\n${p.take(2500)}")
    }
  }
}
