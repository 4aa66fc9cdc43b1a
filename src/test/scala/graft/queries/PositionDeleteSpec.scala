package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q48 position-delete read: the row-level contracts behind the
  * aggregate gate — positions are dense per synthetic file, the
  * deletion vector stays day-scale metadata, the read removes EXACTLY
  * the marked positions (survivors = lake − |dv|, and no surviving row
  * sits on a marked position), and the plan is one broadcast anti-join
  * against the never-reshuffled lake.
  */
class PositionDeleteSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("positions are dense 1..n within each file; keys stay unique") {
    val wp = Advanced.lakeWithPositions(spark, dir).cache()
    try {
      val perFile = wp.groupBy("fid")
        .agg(count(lit(1)).as("n"), max("pos").as("mx"), min("pos").as("mn"),
          countDistinct("pos").as("nd"))
        .collect()
      assert(perFile.length == 8)
      perFile.foreach { r =>
        assert(r.getAs[Int]("mn") == 1 && r.getAs[Int]("mx").toLong == r.getAs[Long]("n")
          && r.getAs[Long]("nd") == r.getAs[Long]("n"),
          s"positions must be dense 1..n in file ${r.get(0)}: $r")
      }
    } finally wp.unpersist(blocking = true)
  }

  test("the read removes exactly the marked positions; the DV is metadata-scale") {
    val wp = Advanced.lakeWithPositions(spark, dir).cache()
    val dv = Advanced.deletionVector(wp).cache()
    try {
      val (nLake, nDv) = (wp.count(), dv.count())
      assert(nDv > 5, "fixture must mark scattered positions beyond the head range")
      assert(nDv < nLake / 50, s"the DV must stay metadata-scale: $nDv of $nLake")
      val survivors = wp.join(broadcast(dv), Seq("fid", "pos"), "left_anti").cache()
      try {
        assert(survivors.count() == nLake - nDv,
          "survivor count must be exactly lake minus marked positions")
        assert(survivors.join(dv, Seq("fid", "pos"), "left_semi").count() == 0L,
          "no surviving row may sit on a marked position")
      } finally survivors.unpersist(blocking = true)
    } finally { wp.unpersist(blocking = true); dv.unpersist(blocking = true) }
  }

  test("read plans as a broadcast anti-join — the lake side never reshuffles for deletes") {
    val wp = Advanced.lakeWithPositions(spark, dir)
    val df = wp.join(broadcast(Advanced.deletionVector(wp)), Seq("fid", "pos"), "left_anti")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"expected a broadcast anti-join:\n${p.take(2500)}")
    assert(!p.contains("SortMergeJoin"),
      s"a day-scale DV must not drag the lake through a sort-merge:\n${p.take(2500)}")
  }
}
