package graft.datagen

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's dormant stream-splitting helpers (`split_batch`,
  * `src/data.rs:245-261`; `take_columns`, `src/data.rs:266-294`):
  * randomly scatter a sorted batch's rows into N streams — the setup for
  * a sort-merge experiment. Spark-native: a seeded `rand`-derived stream
  * id + `repartition(n, col)`, which is exactly the shuffle-scatter a
  * distributed merge would start from (SURVEY §2 #12).
  */
object SplitBatch {

  /** Assign each row a deterministic pseudo-random stream in [0, n)
    * (reference seed 1337, `src/data.rs:247`) and hash-partition by it,
    * so each output partition holds exactly one stream.
    */
  def splitBatch(df: DataFrame, n: Int, seed: Long = 1337L): DataFrame =
    df.withColumn("stream", floor(rand(seed) * n).cast("int"))
      .repartition(n, col("stream"))

  /** Collect the per-stream frames (driver-side convenience mirroring the
    * reference's `Vec<Vec<RecordBatch>>` return shape; large-scale code
    * keeps the single partitioned frame instead).
    */
  def streams(df: DataFrame, n: Int, seed: Long = 1337L): Seq[DataFrame] = {
    val tagged = splitBatch(df, n, seed)
    (0 until n).map(i => tagged.filter(col("stream") === i).drop("stream"))
  }
}
