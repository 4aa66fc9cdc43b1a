package graft.pipeline

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** s10 incremental ANN index maintenance: the contracts that make an
  * APPEND to the serving layout safe.
  *
  *  - merge identity: per-vector assignment against FROZEN artifacts is
  *    pure, so union(assign(base), assign(delta)) must equal
  *    assign(base ∪ delta) bit-for-bit — the lake-immutable-partials
  *    property (q38's monoid argument applied to index rows). A future
  *    "improvement" that sneaks corpus-dependent state into the
  *    assignment path breaks this loudly.
  *  - the delta cell touches ONLY the delta: its scan carries the
  *    vec_id >= boundary predicate down to parquet.
  *  - geometry is frozen: the boundary and K derive from the base
  *    corpus deterministically at both gate SFs.
  */
class IncrementalAnnSpec extends SparkSpec {

  private def key(r: org.apache.spark.sql.Row): (Long, Long, Long) =
    (r.getLong(0), r.getLong(1), r.getLong(2))

  test("merge identity: frozen-artifact assignment of base ∪ delta equals full pass") {
    val dir = "/root/testdata/sf0.001"
    val b = Similarity.s10Boundary(spark, dir)
    val base = Similarity.annAssignFrozen(spark, dir, col("vec_id") < b)
      .collect().map(key).toSet
    val delta = Similarity.annAssignFrozen(spark, dir, col("vec_id") >= b)
      .collect().map(key).toSet
    val full = Similarity.annAssignFrozen(spark, dir, lit(true))
      .collect().map(key).toSet
    assert(base.nonEmpty && delta.nonEmpty)
    assert(base.intersect(delta).isEmpty, "partitions must not overlap")
    assert(base.union(delta) == full,
      "append partials must reproduce the full frozen-artifact pass exactly")
  }

  test("s10 output is exactly the frozen delta assignment; ids at/above the boundary") {
    val dir = "/root/testdata/sf0.001"
    val b = Similarity.s10Boundary(spark, dir)
    val out = SparkEntry.queries("s10_ann_delta")(spark, dir).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getLong(0) >= b), s"delta rows must sit at/above boundary $b")
    val frozen = Similarity.annAssignFrozen(spark, dir, col("vec_id") >= b)
      .collect().map(key).toSet
    assert(out.map(key).toSet == frozen)
    // packed codes must vary AND at least one must land in the sign-bit
    // nibble range (cid >= 8 at sub 15 -> negative code) so the
    // oracle's two's-complement packing branch is exercised every run,
    // not only when a corpus happens to produce one (measured: 20/50
    // delta codes negative at sf0.001)
    assert(out.map(_.getLong(2)).distinct.length > 1, "codes must vary")
    assert(out.exists(_.getLong(2) < 0),
      "no negative packed code — the signed top-nibble packing parity is untested")
  }

  test("boundary and K derive from the base corpus at both gate SFs") {
    for (sf <- Seq("sf0.001", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val maxId = graft.Tables.t(spark, dir, "embeddings")
        .agg(max("vec_id")).collect()(0).getLong(0)
      val b = Similarity.s10Boundary(spark, dir)
      assert(b == (maxId + 1) * 9 / 10, s"$sf boundary")
      // the cell completes and stays delta-sized at both SFs
      val n = SparkEntry.queries("s10_ann_delta")(spark, dir).count()
      val nDelta = graft.Tables.t(spark, dir, "embeddings")
        .filter(col("vec_id") >= b).count()
      assert(n == nDelta, s"$sf: one serving row per delta vector")
    }
  }

  test("delta assignment pushes the boundary predicate into the embeddings scan") {
    val dir = "/root/testdata/sf0.001"
    val p = SparkEntry.queries("s10_ann_delta")(spark, dir)
      .queryExecution.executedPlan.toString
    assert("PushedFilters: \\[[^\\]]*GreaterThanOrEqual\\(vec_id".r.findFirstIn(p).isDefined,
      s"expected vec_id >= boundary pushed to the parquet scan:\n${p.take(4000)}")
  }
}
