package graft.bench

import org.apache.spark.sql.SparkSession

/** Dev-only: split d5_lsh_verified re-run cost into plan-construction
  * (driver-side: rebuild + Materialized sameResult analysis) vs
  * execution (noop write over the cached result).
  */
object D5Probe {
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
      println(f"[d5probe] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    // cold: build everything (d3b runs first in the real bench)
    val q3b = graft.SparkEntry.queries("d3b_lsh_pairs")
    phase("d3b cold")(q3b(spark, dir).write.format("noop").mode("overwrite").save())
    val q = graft.SparkEntry.queries("d5_lsh_verified")
    phase("d5 cold")(q(spark, dir).write.format("noop").mode("overwrite").save())
    for (i <- 1 to 3) {
      val df = phase(s"d5 plan $i")(q(spark, dir))
      phase(s"d5 exec $i")(df.write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
