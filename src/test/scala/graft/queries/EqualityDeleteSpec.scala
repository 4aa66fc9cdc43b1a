package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q51 equality-delete read: the row-level contracts behind the
  * aggregate gate — Iceberg v2 sequence scoping (a delete applies only
  * to data files with a LOWER sequence number), the resurrection path
  * (seq-3 appends survive the seq-2 key delete), the customer-erase
  * fan-out (the seq-4 delete reaches appended rows too), delete files
  * staying metadata-scale, and the plan being two broadcast anti-joins
  * with the lake never reshuffled.
  */
class EqualityDeleteSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("seq-1 rows matching the key delete all vanish; others survive") {
    val surv = Advanced.eqDeleteRead(spark, dir).cache()
    try {
      assert(surv.filter(col("seq") === 1 && pmod(col("k"), lit(23)) === 0).count() == 0L,
        "every base row whose key is in the seq-2 equality delete must die (1 < 2)")
      val base = Advanced.eqDataFiles(spark, dir).filter(col("seq") === 1)
      val expected = base
        .filter(pmod(col("k"), lit(23)) =!= 0 && pmod(col("c"), lit(97)) =!= 0)
        .count()
      assert(surv.filter(col("seq") === 1).count() == expected,
        "seq-1 survivors must be exactly the rows matching neither delete")
    } finally surv.unpersist(blocking = true)
  }

  test("sequence scoping: seq-3 appends survive the seq-2 key delete") {
    val app = Advanced.eqDataFiles(spark, dir).filter(col("seq") === 3).cache()
    val surv = Advanced.eqDeleteRead(spark, dir).filter(col("seq") === 3).cache()
    try {
      val nApp = app.count()
      assert(nApp > 0, "fixture must produce appended rows at this SF")
      // every appended key IS in the seq-2 delete set (%46 ⊂ %23) — an
      // unscoped anti-join would kill all of them
      assert(app.filter(pmod(col("k"), lit(23)) =!= 0).count() == 0L)
      val erased = app.filter(pmod(col("c"), lit(97)) === 0).count()
      assert(surv.count() == nApp - erased,
        "appended rows must survive the key delete (2 < 3) and die only to the customer erase (3 < 4)")
    } finally { app.unpersist(blocking = true); surv.unpersist(blocking = true) }
  }

  test("customer erase reaches every sequence: no survivor has an erased custkey") {
    val surv = Advanced.eqDeleteRead(spark, dir)
    assert(surv.filter(pmod(col("c"), lit(97)) === 0).count() == 0L,
      "the seq-4 equality delete on o_custkey must erase the customer everywhere")
  }

  test("delete files are metadata-scale against the lake") {
    val nLake = Advanced.eqDataFiles(spark, dir).count()
    val nK = Advanced.eqDeleteKeys(spark, dir).count()
    val nC = Advanced.eqDeleteCusts(spark, dir).count()
    assert(nK > 0 && nC > 0, "both delete files must be non-empty at this SF")
    assert(nK < nLake / 10 && nC < nLake / 10,
      s"delete files must stay day-scale metadata: $nK keys + $nC custs vs $nLake rows")
  }

  test("the read plans as two broadcast anti-joins; the lake never sort-merges") {
    val df = Advanced.eqDeleteRead(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert("BroadcastHashJoin.*LeftAnti".r.findAllIn(p).size >= 1
      && p.contains("LeftAnti"),
      s"expected broadcast anti-joins:\n${p.take(2500)}")
    assert(!p.contains("SortMergeJoin"),
      s"metadata-scale deletes must not drag the lake through a sort-merge:\n${p.take(2500)}")
  }
}
