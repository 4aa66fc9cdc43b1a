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

  test("q37: result equals the direct rectangle filter; layout covers exactly the corpus") {
    // the layout + bucket cover + residual must be invisible semantics-
    // wise: same rows as filtering the raw table with the rectangle
    val zq = SparkEntry.queries("q37_zorder")(spark, dir)
    val got = zq.select("o_orderkey").collect().map(_.getLong(0)).toSet
    val mm = Tables.t(spark, dir, "orders")
      .agg(min("o_custkey"), max("o_custkey")).collect()(0)
    val (ckMin, ckSpan) = (mm.getLong(0), mm.getLong(1) - mm.getLong(0) + 1)
    val dayNo = expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000")
    val dm = Tables.t(spark, dir, "orders").select(dayNo.as("d"))
      .agg(min("d"), max("d")).collect()(0)
    val (dMin, dSpan) = (dm.getLong(0), dm.getLong(1) - dm.getLong(0) + 1)
    val direct = Tables.t(spark, dir, "orders")
      .withColumn("xb", expr(s"((o_custkey - ${ckMin}L) * 16) div ${ckSpan}L"))
      .withColumn("yb", expr(
        s"(((unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000) - ${dMin}L) * 16) div ${dSpan}L"))
      .filter(col("xb").between(4, 7) && col("yb").between(8, 11))
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(got == direct && got.nonEmpty,
      s"z-layout query must equal the raw rectangle filter (${got.size} vs ${direct.size})")
    // grid sanity: every row lands in a cell coordinate inside [0, 16)
    val cells = Tables.t(spark, dir, "orders")
      .select(expr(s"((o_custkey - ${ckMin}L) * 16) div ${ckSpan}L").as("xb"))
      .agg(min("xb"), max("xb")).collect()(0)
    assert(cells.getLong(0) >= 0 && cells.getLong(1) <= 15,
      s"x cells out of the 16-cell grid: $cells")
  }
}
