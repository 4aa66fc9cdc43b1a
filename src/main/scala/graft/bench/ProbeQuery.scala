package graft.bench

import org.apache.spark.sql.SparkSession

/** Dev-loop single-query timer: runs one `SparkEntry.queries` entry N
  * times at a given SF dir under the Bench session geometry (local[32],
  * 32 shuffle partitions, RAM scratch) and prints per-iteration wall
  * times. Iteration 1 includes session-materialized index builds;
  * the warm iterations are what `Bench` records. Not part of the
  * driver contract.
  *
  * Usage: `runMain graft.bench.ProbeQuery <name> [sfDir] [iters] [--explain]`
  */
object ProbeQuery {
  def main(args: Array[String]): Unit = {
    // flags are position-independent: `<name> --explain` and
    // `<name> <sfDir> --explain` are both legal per the usage line
    val (flags, pos) = args.partition(_.startsWith("--"))
    val name = pos(0)
    val dir = pos.lift(1).getOrElse("/root/testdata/sf0.1")
    val iters = pos.lift(2).map(_.toInt).getOrElse(3)
    val explain = flags.contains("--explain")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", graft.Scratch.dir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = graft.SparkEntry.queries(name)
    for (i <- 1 to iters) {
      val t0 = System.nanoTime()
      val n = q(spark, dir).collect().length
      println(f"[$name] iter $i: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    if (explain) q(spark, dir).explain("formatted")
    spark.stop()
  }
}
