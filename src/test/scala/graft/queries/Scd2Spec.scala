package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q61 SCD2 ledger: the property that makes it a history and not a
  * window trick — slicing the ledger at any version must reproduce the
  * CDC family's as-of read EXACTLY (same resolution convention, so the
  * ledger and q43's time travel can never disagree about the past).
  */
class Scd2Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("slicing the ledger at v = 0, 1, 2 equals asOfState(v)") {
    val ledger = Advanced.scd2History(spark, dir).cache()
    for (v <- 0 to 2) {
      val sliced = ledger
        .filter(col("valid_from") <= v &&
          (col("valid_to").isNull || col("valid_to") > v))
        .select(col("k"), col("o_orderstatus"), col("price"))
      val asOf = Advanced.asOfState(spark, dir, v)
        .select(col("k"), col("o_orderstatus"), col("price"))
      assert(sliced.exceptAll(asOf).isEmpty && asOf.exceptAll(sliced).isEmpty,
        s"ledger slice at v=$v diverges from asOfState($v)")
    }
    ledger.unpersist()
  }

  test("tombstoned keys have a closed final interval, current rows an open one") {
    val ledger = Advanced.scd2History(spark, dir).cache()
    // is_current <=> valid_to is null, by construction AND by data
    assert(ledger.filter(col("is_current") =!= col("valid_to").isNull).isEmpty)
    // every key has at most one current version
    val dupCurrent = ledger.filter(col("is_current"))
      .groupBy("k").count().filter(col("count") > 1)
    assert(dupCurrent.isEmpty, "a key with two open versions")
    ledger.unpersist()
  }

  test("intervals per key are disjoint and contiguous in batch order") {
    val ledger = Advanced.scd2History(spark, dir)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("k")).orderBy(col("valid_from"))
    // for consecutive versions of a key, the earlier interval's end is
    // AT MOST the next interval's start (a 'D' between them leaves a gap
    // - the key simply doesn't exist in that span; overlap is the bug)
    val bad = ledger
      .withColumn("next_from", lead(col("valid_from"), 1).over(w))
      .filter(col("next_from").isNotNull &&
        (col("valid_to").isNull || col("valid_to") > col("next_from")))
    assert(bad.isEmpty, "overlapping SCD2 intervals")
  }
}
