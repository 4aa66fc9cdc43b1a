package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q62 sketch-percentile contract: each emitted bucket lower bound must
  * bracket the TRUE type-1 order statistic at position ceil(q·n) within
  * one bucket width ($100) — recomputed here by actually sorting the
  * column, the thing the sketch exists to avoid at scale.
  */
class SketchPercentileSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("q62 bucket lower bounds bracket the true type-1 order statistics") {
    val out = SparkEntry.queries("q62_sketch_percentiles")(spark, dir)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val byStatus = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderstatus"), col("o_totalprice"))
      .collect().groupBy(_.getString(0))
      .map { case (st, rows) => st -> rows.map(_.getDouble(1)).sorted }
    assert(byStatus.keySet == out.keySet, "status census mismatch")
    byStatus.foreach { case (st, v) =>
      val (p50, p90, p99, n) = out(st)
      assert(n == v.length.toLong, s"$st: count mismatch: $n vs ${v.length}")
      def typ1(num: Long, den: Long): Double =
        v(((n * num + den - 1) / den - 1).toInt)
      Seq(("p50", p50, 1L, 2L), ("p90", p90, 9L, 10L), ("p99", p99, 99L, 100L))
        .foreach { case (lbl, lb, num, den) =>
          val exact = typ1(num, den)
          assert(lb <= exact && exact < lb + 100,
            f"$st $lbl: type-1 value $exact%.2f outside [$lb, ${lb + 100})")
        }
    }
  }
}
