package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: phase-by-phase cold timing of the d2 pipeline. */
object DProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", graft.Scratch.dir) // RAM scratch; see Scratch
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    dirs.foreach { d => println(s"[dprobe] == $d =="); runOne(spark, d) }
    spark.stop()
  }

  private def runOne(spark: SparkSession, dir: String): Unit = {
    import graft.pipeline.Portable._

    def phase[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[dprobe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = graft.Tables.t(spark, dir, "documents")
      .select(col("doc_id"), shingles3(words(col("text"))).as("sh"))
    val allSh = docs
      .select(col("doc_id"), explode(col("sh")).as("shingle"))
      .select(col("doc_id"), md5Long(col("shingle")).as("h"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    phase("allSh build+cache")(allSh.count())
    val tau = graft.pipeline.Dedup.ShingleDfCap
    val hot = allSh.groupBy("h").agg(count(lit(1)).as("df"))
      .filter(col("df") > tau).select("h")
    phase("hot agg")(hot.count())
    val exploded = allSh.join(broadcast(hot), Seq("h"), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    phase("anti-join cache")(exploded.count())
    val sizes = exploded.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val pairs = exploded.as("x")
      .join(exploded.as("y"),
        col("x.h") === col("y.h") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc1"), col("y.doc_id").as("doc2"))
      .agg(count(lit(1)).as("n_common"))
    val out = pairs
      .join(broadcast(sizes.withColumnRenamed("doc_id", "doc1").withColumnRenamed("n_sh", "n1")), "doc1")
      .join(broadcast(sizes.withColumnRenamed("doc_id", "doc2").withColumnRenamed("n_sh", "n2")), "doc2")
      .withColumn("jac_raw",
        col("n_common").cast("double") / (col("n1") + col("n2") - col("n_common")))
      .filter(col("jac_raw") >= 0.2)
      .select(col("doc1"), col("doc2"), round(col("jac_raw"), 6).as("jaccard"))
    phase("self-join + jaccard")(out.write.format("noop").mode("overwrite").save())
  }
}
