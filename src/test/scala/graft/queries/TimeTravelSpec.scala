package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q43 merge-on-read time travel: the row-level contracts behind the
  * versioned aggregate gate — v=0 is the frozen lake, v=1 equals q41's
  * copy-on-write merge exactly (two layouts, one table), and v=2 pins
  * every cross-batch precedence case: batch-2-wins row images,
  * tombstones deleting previously-updated keys, a later upsert
  * resurrecting a tombstoned key, batch-1 inserts surviving batch 2.
  * Plus the plan shape: an as-of read is one lake scan with a
  * broadcast anti-join — never a lake-side sort-merge.
  */
class TimeTravelSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Map[Long, (String, Double)] =
    df.select("k", "o_orderstatus", "price").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap

  test("v=0 is the lake; v=1 equals q41's copy-on-write merge row-for-row") {
    val base = rowsOf(Advanced.cdcLake(spark, dir))
    assert(rowsOf(Advanced.asOfState(spark, dir, 0)) == base)
    val v1 = Advanced.asOfState(spark, dir, 1).cache()
    val cow = Advanced.cdcMerged(spark, dir).cache()
    try assert(rowsOf(v1) == rowsOf(cow),
      "merge-on-read at v=1 must serve exactly the copy-on-write state")
    finally { v1.unpersist(blocking = true); cow.unpersist(blocking = true) }
  }

  test("v=2 cross-batch precedence: row images win, tombstones span batches, upserts resurrect") {
    val base = rowsOf(Advanced.cdcLake(spark, dir))
    val mx = base.keys.max
    val v2 = Advanced.asOfState(spark, dir, 2).cache()
    try {
      val rows = v2.select("k", "o_orderstatus", "price").collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2)))
      assert(rows.map(_._1).distinct.length == rows.length, "dup keys in a version read")
      val m = rows.toMap
      // batch-2 tombstones delete regardless of batch-1 action
      val d2 = base.keys.filter(_ % 59 == 0)
      assert(d2.nonEmpty)
      d2.foreach(k => assert(!m.contains(k), s"b2-tombstoned key $k survived"))
      assert(d2.exists(k => k % 20 == 0 && k % 47 != 0),
        "fixture must exercise b1-update-then-b2-delete")
      // batch-2 upserts carry the +7 ROW IMAGE — even on keys batch 1
      // updated (+100 must NOT accumulate) or tombstoned (resurrection)
      val u2 = base.keys.filter(k => k % 13 == 0 && k % 59 != 0)
      assert(u2.nonEmpty)
      u2.foreach(k => assert(m(k)._2 == base(k)._2 + 7.0, s"b2 upsert image on key $k"))
      assert(u2.exists(k => k % 20 == 0 && k % 47 != 0),
        "fixture must exercise twice-updated keys (b2 image wins)")
      val resurrected = u2.filter(_ % 47 == 0)
      assert(resurrected.nonEmpty, "fixture must exercise tombstone-then-upsert resurrection")
      resurrected.foreach(k =>
        assert(m.contains(k), s"key $k tombstoned in b1 must be resurrected by b2's upsert"))
      // batch-1 inserts live past the max key; batch 2 never touches them
      val inserted = base.keys.filter(_ % 31 == 0)
      assert(inserted.nonEmpty)
      inserted.foreach(k => assert(m(k + mx + 1) == base(k), s"b1 insert $k lost at v=2"))
      // untouched by both batches: unchanged
      base.keys.filterNot(k => k % 20 == 0 || k % 47 == 0 || k % 13 == 0 || k % 59 == 0)
        .foreach(k => assert(m(k) == base(k), s"key $k must stream through untouched"))
    } finally v2.unpersist(blocking = true)
  }

  test("as-of read plans as one lake scan + broadcast anti-join, never a lake-side sort-merge") {
    val df = Advanced.asOfState(spark, dir, 2)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"expected a broadcast anti-join:\n${p.take(2500)}")
    assert(!p.contains("SortMergeJoin"),
      s"the 100 TB lake side must not sort-merge for a day-scale log:\n${p.take(2500)}")
  }
}
