package graft.pipeline

import graft.{SparkSpec, SparkEntry}
import org.apache.spark.sql.functions._

/** Pins the connected-components semantics p1's retention rule and d6
  * are built on. The shapes below (star, chain) are exactly the cases
  * the round-3 per-pair rule got wrong: a doc was dropped because its
  * direct keeper was in `uniq` at evaluation time even though that
  * keeper was itself removed as a loser of another pair.
  */
class ClusterSpec extends SparkSpec {
  import spark.implicits._

  private def roots(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Cluster.minLabelComponents(pairs.toDF("doc1", "doc2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("star: both satellites collapse onto the component min through the hub") {
    // 1~5 and 3~5 verified, 1~3 never verified: 3 reaches 1 only through
    // 5 — per-pair logic can't see that; components must
    assert(roots(Seq((1L, 5L), (3L, 5L))) == Map(1L -> 1L, 3L -> 1L, 5L -> 1L))
  }

  test("chain: the global min propagates across every hop") {
    val r = roots(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    assert(r == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("independent components keep independent roots") {
    val r = roots(Seq((1L, 2L), (10L, 11L), (11L, 12L)))
    assert(r == Map(1L -> 1L, 2L -> 1L, 10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("empty pair set yields empty labels") {
    assert(roots(Seq.empty).isEmpty)
  }

  test("d6 on real testdata: roots are fixpoints and pair endpoints agree") {
    val dir = "/root/testdata/sf0.001"
    val labels = SparkEntry.queries("d6_dup_clusters")(spark, dir)
    val m = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m.nonEmpty, "sf0.001 must contain verified near-dups")
    // root is the component MIN: never above the member, and a fixpoint
    assert(m.forall { case (d, r) => r <= d }, s"root above member: $m")
    assert(m.forall { case (_, r) => m(r) == r }, s"root not a fixpoint: $m")
    // every verified-dup pair is intra-cluster by construction
    val pairs = Dedup.lshVerifiedPairs(spark, dir).filter(col("is_dup"))
      .select("doc1", "doc2").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    assert(pairs.forall { case (a, b) => m(a) == m(b) },
      "verified pair endpoints must share a component root")
  }
}
