package graft.bench

import org.apache.spark.sql.SparkSession

/** Dev-only: dissect d6 cache behavior. */
object CCProbe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val q = graft.SparkEntry.inventory.find(_.name == "d6_dup_clusters").get
    val df1 = time("plan 1")(q.run(spark, dir))
    time("write 1")(df1.write.format("noop").mode("overwrite").save())
    val df2 = time("plan 2")(q.run(spark, dir))
    println(s"same object: ${df1 eq df2}")
    time("write 2")(df2.write.format("noop").mode("overwrite").save())
    time("count 2")(println(df2.count()))
    println(df2.queryExecution.executedPlan.toString.take(3000))
    spark.stop()
  }
}
