package graft.queries

import graft.{SparkEntry, SparkSpec}

class SketchSpec extends SparkSpec {
  test("q26: HLL approx distinct within its 2% rsd envelope (5 sigma)") {
    val rows = SparkEntry.queries("q26_approx_distinct")(spark, "/root/testdata/sf0.01")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getLong(r.fieldIndex("approx_parts"))
      val exact = r.getLong(r.fieldIndex("exact_parts"))
      val err = math.abs(approx - exact).toDouble / exact
      assert(err < 0.1, s"HLL error $err too large (approx=$approx exact=$exact)")
    }
  }
}
