package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** kmv_kth custom aggregate: insert/merge/eval contracts the q68 oracle
  * equality can't isolate (the oracle sees only the final kth per
  * source).
  */
class KmvAggSpec extends SparkSpec {

  test("kmv_kth equals the sorted-distinct kth; merge is partition-count-invariant") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // duplicates on purpose: distinctness must be inherent to the sketch
    val vals = Seq.fill(5000)(rnd.nextLong(1000000L))
    val expected = vals.distinct.sorted.apply(63)
    for (parts <- Seq(1, 7, 32)) {
      val got = vals.toDF("h").repartition(parts)
        .agg(call_function("kmv_kth", col("h"), lit(64)).as("kth"))
        .head().getLong(0)
      assert(got == expected,
        s"kth at $parts partitions: $got != $expected (merge must be exact)")
    }
  }

  test("kmv_kth returns NULL below k distinct values and plans as ObjectHashAggregate") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val thin = Seq(1L, 2L, 3L, 2L, 1L).toDF("h")
      .agg(call_function("kmv_kth", col("h"), lit(4)))
      .head()
    assert(thin.isNullAt(0), "3 distinct values with k=4 must yield NULL")
    val df = graft.Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .groupBy(col("source"))
      .agg(call_function("kmv_kth", col("doc_id"), lit(8)).as("kth"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      s"TypedImperativeAggregate must plan as ObjectHashAggregate (map-side partials):\n$plan")
  }

  test("kmv_kth types its input at analysis: int widens, string fails typed") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // an int column used to pass analysis and ClassCastException in the
    // executor (ADVICE r10); ImplicitCastInputTypes now widens it
    val got = Seq(5, 1, 3, 2, 4, 3).toDF("h")
      .agg(call_function("kmv_kth", col("h"), lit(3)))
      .head().getLong(0)
    assert(got == 3L, s"int column must widen to long: got $got")
    // a non-castable column fails AT ANALYSIS with a typed message
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(Array(1L)).toDF("h")
        .agg(call_function("kmv_kth", col("h"), lit(3))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("kmv_kth"), s"got: ${e.getMessage}")
    // a STRING column also fails at analysis (ADVICE r11): the implicit
    // string→long cast would silently turn unparseable values into nulls
    // the sketch skips — garbage estimates instead of a wiring error
    val es = intercept[org.apache.spark.sql.AnalysisException] {
      Seq("42", "oops").toDF("h")
        .agg(call_function("kmv_kth", col("h"), lit(3))).collect()
    }
    assert(es.getMessage.contains("integral hash column"), s"got: ${es.getMessage}")
  }

  test("kmv_kth registration rejects a non-literal or non-positive k") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(1L).toDF("h")
    val e = intercept[Exception] {
      df.agg(call_function("kmv_kth", col("h"), col("h"))).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("k must be a literal integer")), s"got: $e")
    val e2 = intercept[Exception] {
      df.agg(call_function("kmv_kth", col("h"), lit(0))).collect()
    }
    assert(messages(e2).exists(_.contains("k must be positive")), s"got: $e2")
  }
}
