package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q41 CDC upsert: the row-level MERGE contracts behind the aggregate
  * gate — updates replace, inserts append, untouched rows survive
  * unchanged, keys stay unique, and the merge plans as a broadcast
  * anti-join (the lake side never shuffles for the delta).
  */
class UpsertSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("merge semantics: replace, delete (winning over update), append, keep the rest, no dup keys") {
    val lake = graft.Tables.t(spark, dir, "orders")
      .select(col("o_orderkey").as("k"), col("o_totalprice").as("price"))
    val merged = Advanced.cdcMerged(spark, dir).cache()
    try {
      val mx = lake.agg(max("k")).collect()(0).getLong(0)
      val lakeMap = lake.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val mergedRows = merged.select("k", "price").collect()
        .map(r => r.getLong(0) -> r.getDouble(1))
      // keys unique
      assert(mergedRows.map(_._1).distinct.length == mergedRows.length)
      val mergedMap = mergedRows.toMap
      // tombstoned keys are GONE — including key 0, which matches both
      // the update (0 % 20) and delete (0 % 47) rules: delete must win
      val deleted = lakeMap.keys.filter(_ % 47 == 0)
      assert(deleted.nonEmpty)
      deleted.foreach(k => assert(!mergedMap.contains(k), s"tombstoned key $k survived"))
      assert(deleted.exists(_ % 20 == 0), "fixture must exercise the delete-beats-update overlap")
      // updates replaced: every 20th non-tombstoned key carries price + 100
      val updated = lakeMap.keys.filter(k => k % 20 == 0 && k % 47 != 0)
      assert(updated.nonEmpty)
      updated.foreach(k => assert(mergedMap(k) == lakeMap(k) + 100.0, s"key $k"))
      // inserts appended past the max key, same price as their template
      val inserted = lakeMap.keys.filter(_ % 31 == 0)
      assert(inserted.nonEmpty)
      inserted.foreach(k => assert(mergedMap(k + mx + 1) == lakeMap(k), s"insert $k"))
      // everything else untouched
      lakeMap.keys.filterNot(k => k % 20 == 0 || k % 47 == 0)
        .foreach(k => assert(mergedMap(k) == lakeMap(k), s"key $k must survive"))
      assert(mergedMap.size == lakeMap.size - deleted.size + inserted.size)
    } finally merged.unpersist(blocking = true)
  }

  test("merge plans as a broadcast anti-join: the lake never shuffles for the delta") {
    val df = Advanced.cdcMerged(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"expected a broadcast anti-join:\n${p.take(2500)}")
    assert(!p.contains("SortMergeJoin"),
      s"the 100 TB lake side must not sort-merge for a day's delta:\n${p.take(2500)}")
  }
}
