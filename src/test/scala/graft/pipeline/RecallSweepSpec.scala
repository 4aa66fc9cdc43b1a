package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** s16 recall-vs-nprobe sweep: rung NProbe (the serving default) must
  * measure exactly what the s4 serving path delivers, and the measured
  * curve must behave like a probe-budget sweep (complete grid, recall
  * within bounds, non-decreasing per query on this corpus).
  */
class RecallSweepSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("rung NProbe equals the s4 serving path's recall") {
    val sweep = graft.SparkEntry.queries("s16_nprobe_recall")(spark, dir)
      .filter(col("np") === Similarity.NProbe)
      .select(col("qid"), col("n_hit"))
    val exact = Similarity.knnBrute(spark, dir).select("qid", "vec_id")
    val serving = Similarity.knnIvf(spark, dir).select("qid", "vec_id")
      .join(exact, Seq("qid", "vec_id"))
      .groupBy("qid").agg(count(lit(1)).as("n_hit"))
    // left join on the full qid set: a query with zero hits must agree too
    val qids = sweep.select("qid")
    val servingFull = qids.join(serving, Seq("qid"), "left_outer")
      .select(col("qid"), coalesce(col("n_hit"), lit(0L)).as("n_hit"))
    assert(sweep.exceptAll(servingFull).isEmpty &&
      servingFull.exceptAll(sweep).isEmpty)
  }

  test("grid is complete and recall bounded") {
    val rows = graft.SparkEntry.queries("s16_nprobe_recall")(spark, dir).collect()
    assert(rows.length == Similarity.NProbeLadder.size * Similarity.AuditQueries)
    assert(rows.forall(r => r.getAs[Long]("n_hit") >= 0 && r.getAs[Long]("n_hit") <= 10))
  }

  test("recall is non-decreasing in the probe budget on this corpus") {
    val rows = graft.SparkEntry.queries("s16_nprobe_recall")(spark, dir)
      .collect().map(r => (r.getAs[Int]("np"), r.getAs[Long]("qid"), r.getAs[Long]("n_hit")))
    for (q <- rows.map(_._2).distinct) {
      val curve = rows.filter(_._2 == q).sortBy(_._1).map(_._3)
      assert(curve.zip(curve.tail).forall { case (a, b) => a <= b },
        s"qid $q recall curve not monotone: ${curve.mkString(",")}")
    }
  }
}
