package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VecOpsSpec extends SparkSpec {

  private def builtinDot = expr(
    "aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, c) -> acc + c)")

  test("vec_dot matches aggregate(zip_with(...)) incl. null/length-mismatch semantics") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      (Seq[java.lang.Double](1.0, 2.0, 3.0), Seq[java.lang.Double](4.0, 5.0, 6.0)),
      (Seq[java.lang.Double](0.1, 0.2), Seq[java.lang.Double](0.3, 0.4)),
      (Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](2.0, 3.0)), // null element
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](9.0)), // length mismatch
      (Seq.empty[java.lang.Double], Seq.empty[java.lang.Double]),
    ).toDF("a", "b")
    val out = df.select(
      expr("vec_dot(a, b)").as("fused"),
      builtinDot.as("builtin")).collect()
    out.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1),
        s"null disagreement: fused=${r.get(0)} builtin=${r.get(1)}")
      if (!r.isNullAt(0))
        assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(1)), "must be bitwise equal")
    }
    assert(out.count(_.isNullAt(0)) == 2)
  }

  test("vec_dot on the embeddings table is bitwise-equal to the builtin spelling") {
    GraftFunctions.register(spark)
    val e = graft.Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("embedding").cast("array<double>").as("a"),
        reverse(col("embedding").cast("array<double>")).as("b"))
    val diff = e.select(
        expr("vec_dot(a, b)").as("fused"), builtinDot.as("builtin"))
      .filter("fused IS DISTINCT FROM builtin")
      .count()
    assert(diff == 0)
  }
}
