package graft.queries

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Differential pins for the storage-layout queries: the bucketed /
  * partitioned rewrite must be a pure LAYOUT change — identical results
  * to the same logic over the original parquet, on every invocation
  * (the memoized rewrite serves later calls).
  */
class LayoutSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("q33: bucketed join result equals the direct join, twice (memo reuse)") {
    val direct = Tables.t(spark, dir, "lineitem")
      .join(Tables.t(spark, dir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        graft.Agg.dsum(col("l_extendedprice")).as("sum_price"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    for (_ <- 1 to 2) {
      val got = SparkEntry.queries("q33_bucketed_join")(spark, dir)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(got == direct)
    }
  }

  test("q34: partition-pruned scan returns exactly the purchase slice") {
    val direct = Tables.t(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(unix_micros(date_trunc("DAY", col("ts"))).as("day_us"))
      .agg(count(lit(1)).as("n"),
        graft.Agg.dsum(col("value")).as("sum_value"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val got = SparkEntry.queries("q34_partition_prune")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got == direct && got.nonEmpty)
  }
}
