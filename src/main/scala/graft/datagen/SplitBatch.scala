package graft.datagen

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's dormant stream-splitting helpers (`split_batch`,
  * `src/data.rs:245-261`; `take_columns`, `src/data.rs:266-294`):
  * randomly scatter a sorted batch's rows into N streams — the setup for
  * a sort-merge experiment. Spark-native: a seeded `rand`-derived stream
  * id + a stream-identity partitioner, the shuffle-scatter a distributed
  * merge would start from (SURVEY §2 #12).
  */
object SplitBatch {

  /** Assign each row a deterministic pseudo-random stream in [0, n)
    * (reference seed 1337, `src/data.rs:247`) and partition so partition
    * i holds EXACTLY stream i. `repartition(n, col)` cannot express
    * this — it places by murmur3(stream) % n, so streams collide into
    * shared partitions (and a merge consumer would see two interleaved
    * streams as one unsorted input); an identity `Partitioner` is the
    * one Spark construct that pins partition ids. The RDD hop is
    * confined to this dormant experiment helper — nothing downstream of
    * it needs codegen.
    */
  def splitBatch(df: DataFrame, n: Int, seed: Long = 1337L): DataFrame = {
    val tagged = df.withColumn("stream", floor(rand(seed) * n).cast("int"))
    val schema = tagged.schema
    val parted = tagged.rdd
      .keyBy(_.getAs[Int]("stream"))
      .partitionBy(new org.apache.spark.Partitioner {
        def numPartitions: Int = n
        def getPartition(key: Any): Int = key.asInstanceOf[Int]
      })
      .values
    tagged.sparkSession.createDataFrame(parted, schema)
  }

  /** Collect the per-stream frames (driver-side convenience mirroring the
    * reference's `Vec<Vec<RecordBatch>>` return shape; large-scale code
    * keeps the single partitioned frame instead).
    */
  def streams(df: DataFrame, n: Int, seed: Long = 1337L): Seq[DataFrame] = {
    val tagged = splitBatch(df, n, seed)
    (0 until n).map(i => tagged.filter(col("stream") === i).drop("stream"))
  }
}
