package graft.bench

import org.apache.spark.sql.SparkSession

/** Dev-only: stage-by-stage timing of the s4 probe path. */
object S4Probe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", graft.Scratch.dir)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def phase[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[s4probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    import graft.pipeline.Similarity
    // warm: build the index + JIT
    phase("first knnIvf (index build)") {
      Similarity.knnIvf(spark, dir).write.format("noop").mode("overwrite").save()
    }
    for (i <- 1 to 3) {
      val df = phase(s"iter $i: plan construction")(Similarity.knnIvf(spark, dir))
      phase(s"iter $i: analysis")(df.queryExecution.analyzed)
      phase(s"iter $i: optimize+physical")(df.queryExecution.executedPlan)
      phase(s"iter $i: execute")(df.write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
