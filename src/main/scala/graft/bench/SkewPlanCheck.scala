package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: pins the MECHANISM behind the SkewMatrix decision table.
  * Executes the plain join under the AQE skew-join session on the
  * harsh fixture with BOTH downstream shapes and prints whether the
  * final adaptive plan actually split the skewed partition
  * (`skew=true` on the SortMergeJoin) — the claim the decision guide
  * makes: AQE splits freely when the downstream aggregate needs its
  * own exchange (status_agg) and declines when the aggregate reuses
  * the join's partitioning (key_agg), because the split would break
  * that partitioning.
  */
object SkewPlanCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", graft.Scratch.dir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val aqe = spark.newSession()
    aqe.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    aqe.conf.set("spark.sql.adaptive.enabled", "true")
    aqe.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    aqe.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    aqe.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "512k")
    aqe.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "256k")

    val harsh = SkewBench.prepareHarsh(spark, sfDir)
    def joined = {
      val li = graft.Tables.t(aqe, harsh, "lineitem")
        .select(col("l_orderkey"), col("l_extendedprice"))
      val ord = graft.Tables.t(aqe, harsh, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("o_orderstatus"), col("l_extendedprice"))
    }
    val shapes = Seq(
      "status_agg" -> joined.groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), graft.Agg.dsum(col("l_extendedprice")).as("s")),
      "key_agg" -> joined.groupBy(col("l_orderkey"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), graft.Agg.dsum(col("l_extendedprice")).as("s")))
    shapes.foreach { case (name, df) =>
      // collect() — NOT a noop write: the write path builds its own
      // QueryExecution, leaving df.queryExecution's adaptive plan
      // un-finalized (isFinalPlan=false, no skew markers ever)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      val skewSplit = plan.contains("skew=true")
      val finalized = plan.contains("isFinalPlan=true")
      println(s"""{"shape":"$name","final_plan":$finalized,"aqe_skew_split_fired":$skewSplit}""")
      System.err.println(s"===== $name final plan =====")
      plan.linesIterator.filter(l =>
        l.contains("SortMergeJoin") || l.contains("AQEShuffleRead") ||
          l.contains("HashAggregate") || l.contains("Exchange"))
        .foreach(l => System.err.println(l.take(200)))
    }
    spark.stop()
  }
}
