package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q50 net change feed: the classification contract on crafted
  * resolved/pre frames (every branch, including the two suppression
  * rules the %-rule fixture cannot reach), the fixture-level
  * resurrection and shadowed-delete cases, and the broadcast plan
  * shape that keeps the lake side shuffle-free.
  */
class ChangeFeedSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("classification: I / U / D emitted, D-of-absent and identical upsert suppressed") {
    import spark.implicits._
    // final in-range actions for five keys, one per contract branch
    val rng = Seq(
      (1L, "U", "O", 10.0), // absent at v1            -> I
      (2L, "U", "O", 20.0), // pre differs in price    -> U
      (3L, "U", "F", 30.0), // pre differs in status   -> U
      (4L, "D", "O", 40.0), // existed at v1           -> D
      (5L, "D", "O", 50.0), // absent at v1 (created+destroyed in range) -> suppressed
      (6L, "U", "O", 60.0), // identical to pre-image  -> suppressed
      (7L, "U", "O", 70.0), // pre EXISTS with NULL price -> U, not I
      (8L, "D", "O", 80.0)  // pre EXISTS with NULL price -> D, not suppressed
    ).toDF("k", "act", "o_orderstatus", "price")
    val pre = Seq(
      (2L, "O", Some(19.0)),
      (3L, "O", Some(30.0)),
      (4L, "O", Some(40.0)),
      (6L, "O", Some(60.0)),
      // existence must be a join-presence fact, never price nullness:
      // a live row with a NULL price is still a live row
      (7L, "O", None: Option[Double]),
      (8L, "O", None: Option[Double])
    ).toDF("k", "pre_status", "pre_price")
    val out = Advanced.changeFeedOf(rng, pre).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "I", 2L -> "U", 3L -> "U", 4L -> "D", 7L -> "U", 8L -> "D"),
      "exactly the six net changes, nothing for keys 5 (D-of-absent) and 6 (no-op upsert)")
  }

  test("fixture: resurrection emits I, shadowed delete emits nothing") {
    val feed = Advanced.changeFeed(spark, dir, v1 = 1, v2 = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val mx = graft.BoundedCollect.rows(
      Advanced.cdcLake(spark, dir).agg(max(col("k"))), 1, "spec max key")(0).getLong(0)
    // a %47-tombstoned key that batch 2 re-upserts (%13) was absent at
    // v1: the feed must report it as an INSERT, not an update
    val resurrected = (1L to mx).filter(k => k % 47 == 0 && k % 13 == 0 && k % 59 != 0)
      .filter(feed.contains)
    assert(resurrected.nonEmpty, "fixture must contain resurrected keys")
    assert(resurrected.forall(feed(_) == "I"), "resurrection must classify as I")
    // a %59 batch-2 tombstone of a key already %47-deleted at v1 is
    // invisible to the consumer: suppressed entirely
    assert((1L to mx).filter(k => k % 59 == 0 && k % 47 == 0)
      .forall(!feed.contains(_)), "delete of a v1-absent key must be suppressed")
    // plain batch-2 updates classify as U with the v1 pre-image
    val plainU = Advanced.changeFeed(spark, dir, v1 = 1, v2 = 2)
      .filter(col("op") === "U").collect()
    assert(plainU.nonEmpty && plainU.forall(r => !r.isNullAt(5)),
      "every U must carry its pre-image")
  }

  test("the lake side never shuffles: broadcast joins only, no cartesian") {
    val df = Advanced.changeFeed(spark, dir, v1 = 1, v2 = 2)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"feed must stay a broadcast-join plan:\n${p.take(2500)}")
    assert(!p.contains("SortMergeJoin"),
      s"the day-scale feed must never sort-merge the lake:\n${p.take(2500)}")
  }
}
