package graft.queries

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SketchSpec extends SparkSpec {
  test("q26: HLL approx distinct within its 2% rsd envelope (5 sigma)") {
    // raw estimator vs exact, independent of the query's boolean output
    val rows = Tables.t(spark, "/root/testdata/sf0.01", "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getLong(r.fieldIndex("approx_parts"))
      val exact = r.getLong(r.fieldIndex("exact_parts"))
      val err = math.abs(approx - exact).toDouble / exact
      assert(err < 0.1, s"HLL error $err too large (approx=$approx exact=$exact)")
    }
  }

  test("q26 query emits within_5pct=true for every group (oracle contract)") {
    val out = SparkEntry.queries("q26_approx_distinct")(spark, "/root/testdata/sf0.01")
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getBoolean(r.fieldIndex("within_5pct")),
        s"approx distinct out of the 5% envelope for ${r.get(0)}")
    }
  }
}
