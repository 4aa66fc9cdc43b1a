package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** p9 shard order: the dataloader contract (disjoint, balanced,
  * reproducible) plus the scale shape — the corpus-sized rank runs
  * bucket-parallel, never through a single-partition global sort.
  */
class ShardOrderSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("p9: positions are a permutation, workers balanced within one doc") {
    val so = Curation.shardOrder(spark, dir).cache()
    try {
      val n = graft.Tables.t(spark, dir, "documents").count()
      assert(so.count() == n, "every document gets exactly one position")
      val posAgg = so.agg(min("pos"), max("pos"), countDistinct("pos")).head()
      assert(posAgg.getLong(0) == 0L && posAgg.getLong(1) == n - 1
        && posAgg.getLong(2) == n,
        "positions are exactly 0..n-1 — the two-phase rank is a true total order")
      val w = so.groupBy("worker").agg(count(lit(1)).as("c"))
        .agg(min("c"), max("c"), count(lit(1))).head()
      assert(w.getLong(2) == Curation.ShardWorkers.toLong, "all workers populated")
      assert(w.getLong(1) - w.getLong(0) <= 1, "worker loads balanced within one doc")
    } finally so.unpersist(blocking = true)
  }

  test("p9 plan: the corpus rank is bucket-partitioned, not a global sort") {
    val p = graft.SparkEntry.queries("p9_shard_order")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p.contains("hashpartitioning(b#"),
      s"the corpus-sized window must shuffle on the bucket key:\n${p.take(1500)}")
  }
}
