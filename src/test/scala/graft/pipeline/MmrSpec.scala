package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** s14 MMR diversity re-rank: greedy-selection invariants plus the
  * behavioral pin that diversification actually changes the serving
  * set relative to plain relevance order.
  */
class MmrSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def q(name: String) = graft.queries.Registry.all.find(_.name == name).get

  test("s14: five distinct picks per query from the top-10, head pick is the relevance argmax") {
    val m = q("s14_mmr_diversify").run(spark, dir).cache()
    try {
      val perQ = m.groupBy("qid").agg(
        count(lit(1)).as("n"),
        countDistinct("vec_id").as("nd"),
        min("pick").as("mn"), max("pick").as("mx"))
      assert(perQ.filter(col("n") =!= Similarity.MmrK || col("nd") =!= Similarity.MmrK
        || col("mn") =!= 1 || col("mx") =!= Similarity.MmrK).count() == 0,
        s"every query selects exactly ${Similarity.MmrK} distinct candidates, picks 1..${Similarity.MmrK}")
      val top = Similarity.knnBrute(spark, dir)
      assert(m.join(top, Seq("qid", "vec_id"), "left_anti").count() == 0,
        "picks come only from the s1 top-10 candidate pool")
      val firstWrong = m.filter(col("pick") === 1)
        .join(top.filter(col("rn") === 1), Seq("qid", "vec_id"), "left_anti")
      assert(firstWrong.count() == 0, "pick 1 is the plain relevance argmax")
    } finally m.unpersist(blocking = true)
  }

  test("s14: greedy scores are non-increasing after the head, and diversification reorders") {
    val m = q("s14_mmr_diversify").run(spark, dir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy("pick")
    val viol = m.filter(col("pick") >= 2)
      .withColumn("prev", lag(col("mmr_score"), 1).over(w))
      .filter(col("prev").isNotNull && col("mmr_score") > col("prev"))
    assert(viol.count() == 0,
      "the greedy MMR objective is monotone: each pick scores no higher than the one before")
    // MMR must not just alias plain top-MmrK relevance order somewhere
    val top = Similarity.knnBrute(spark, dir)
      .filter(col("rn") <= Similarity.MmrK)
      .select(col("qid"), col("vec_id").as("top_vid"), col("rn").as("pick"))
    val differing = m.select(col("qid"), col("vec_id"), col("pick"))
      .join(top, Seq("qid", "pick"))
      .filter(col("vec_id") =!= col("top_vid")).count()
    assert(differing > 0,
      "diversification must change at least one serving position vs plain relevance order")
  }
}
