package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q47 CDC log checkpoint/retention: the row-level contracts behind the
  * path-labeled aggregate gate — folding batches ≤ cp into a compacted
  * base and truncating the log MUST NOT change any as-of read at
  * versions ≥ cp (the retention contract), the retained log is exactly
  * the post-cp suffix, versions before the checkpoint are rejected
  * loudly, and a post-checkpoint read keeps q43's plan shape (one base
  * scan + broadcast anti-join, never a lake-side sort-merge).
  */
class CheckpointSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Map[Long, (String, Double)] =
    df.select("k", "o_orderstatus", "price").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap

  test("as-of reads at versions >= cp are identical pre/post checkpoint (cp=1)") {
    // v = 2: resolved through the truncated log against the folded base
    assert(rowsOf(Advanced.asOfCheckpointed(spark, dir, cp = 1, v = 2))
      == rowsOf(Advanced.asOfState(spark, dir, 2).drop("v")),
      "v=2 read must be identical through (lake, full log) and (compacted base, truncated log)")
    // v = cp: the compacted base itself, no log consulted
    assert(rowsOf(Advanced.asOfCheckpointed(spark, dir, cp = 1, v = 1))
      == rowsOf(Advanced.asOfState(spark, dir, 1).drop("v")),
      "v=cp read must equal the pre-checkpoint v=cp state")
  }

  test("compacted base is exactly the as-of-cp state; truncated log is the post-cp suffix") {
    assert(rowsOf(Advanced.checkpointBase(spark, dir, cp = 1))
      == rowsOf(Advanced.asOfState(spark, dir, 1).drop("v")))
    val full = Advanced.cdcLogs(spark, dir)
    val trunc = Advanced.truncatedLog(spark, dir, cp = 1)
    val batches = trunc.select("b").distinct().collect().map(_.getInt(0)).toSet
    assert(batches == Set(2), s"retained log must hold only post-cp batches, got $batches")
    val (nFull, nTrunc) = (full.count(), trunc.count())
    assert(nTrunc < nFull, "retention must actually shrink the log")
    assert(nTrunc == full.filter(col("b") === 2).count(),
      "the retained suffix must keep every post-cp entry")
  }

  test("checkpoint at the log head (cp=2): read is the compacted base alone, still exact") {
    assert(rowsOf(Advanced.asOfCheckpointed(spark, dir, cp = 2, v = 2))
      == rowsOf(Advanced.asOfState(spark, dir, 2).drop("v")),
      "cp at the latest batch must serve the latest state with an empty retained log")
    assert(Advanced.truncatedLog(spark, dir, cp = 2).count() == 0L,
      "nothing remains after folding every batch")
  }

  test("versions before the checkpoint are retired loudly") {
    val e = intercept[IllegalArgumentException](
      Advanced.asOfCheckpointed(spark, dir, cp = 1, v = 0))
    assert(e.getMessage.contains("retention"))
  }

  test("compacted base is a physical lake artifact: served by the graft-lake source") {
    // round 14: the fold must not be re-derived per session (the old
    // Materialized + localCheckpoint spelling) — the plan must read the
    // as-of-cp snapshot's copy-on-write files through the DSv2 source
    val p = Advanced.checkpointBase(spark, dir, cp = 1)
      .queryExecution.executedPlan.toString
    assert(p.contains("graft_lake"),
      s"compacted base must scan the graft-lake layout, not replay the fold:\n${p.take(2000)}")
  }

  test("post-checkpoint read plans as base scan + broadcast anti-join, no sort-merge") {
    val df = Advanced.asOfCheckpointed(spark, dir, cp = 1, v = 2)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"expected a broadcast anti-join:\n${p.take(2500)}")
    assert(!p.contains("SortMergeJoin"),
      s"the compacted-base side must not sort-merge for a window-scale log:\n${p.take(2500)}")
  }
}
