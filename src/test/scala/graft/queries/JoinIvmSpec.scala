package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q59 join-view incremental maintenance: the three delta-join terms
  * must all be live on the gate corpus (else the query silently tests
  * a weaker rule), and the merged state must equal the direct full
  * recompute inside Spark itself (the oracle already checks it
  * cross-engine).
  */
class JoinIvmSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("q59: merged incremental state equals the full recompute; all three delta terms fire") {
    val got = graft.SparkEntry.queries("q59_join_ivm")(spark, dir)
    val o = graft.Tables.t(spark, dir, "orders")
    val c = graft.Tables.t(spark, dir, "customer")
    val full = o.join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(30, 2)))
          .cast("double").as("sum_total"))
    assert(got.unionByName(full).distinct().count() == full.count(),
      "incremental merge must be row-identical to the full join recompute")

    val cutoff = lit(graft.queries.Advanced.IncAggCutoff).cast("timestamp_ntz")
    val dO = o.filter(col("o_orderdate") >= cutoff)
    val dC = c.filter(pmod(col("c_custkey"), lit(10)) === 9)
    val o0 = o.filter(col("o_orderdate") < cutoff)
    val c0 = c.filter(pmod(col("c_custkey"), lit(10)) =!= 9)
    def hits(of: org.apache.spark.sql.DataFrame, cf: org.apache.spark.sql.DataFrame) =
      of.join(cf, col("o_custkey") === col("c_custkey")).count()
    assert(hits(dO, c0) > 0, "ΔO⋈C0 must be live on the gate corpus")
    assert(hits(o0, dC) > 0, "O0⋈ΔC must be live on the gate corpus")
    assert(hits(dO, dC) > 0, "ΔO⋈ΔC must be live on the gate corpus")
  }

  test("q59 plan: the lake-touching delta term broadcasts the dimension delta") {
    val p = graft.SparkEntry.queries("q59_join_ivm")(spark, dir)
      .queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 1,
      s"the O0⋈ΔC term must broadcast ΔC so the fact lake never shuffles:\n${p.take(1500)}")
  }
}
