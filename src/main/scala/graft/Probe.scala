package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc schema/plan probe used during development; not part of the
  * driver contract.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    for (t <- Seq("events", "orders", "embeddings")) {
      println(s"== $t ==")
      try {
        val df = spark.read.parquet(s"$dir/$t.parquet")
        df.printSchema()
        df.show(3, 60)
      } catch { case e: Throwable => println(s"READ FAILED: ${e.getMessage.take(500)}") }
    }
    spark.stop()
  }
}
