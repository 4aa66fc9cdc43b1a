package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** e16 gap-fill + LOCF: the grid is exactly |types| × |corpus hours|,
  * gaps are explicit n = 0 rows whose locf_value equals the last
  * OBSERVED hour's sum, hours before a type's first observation stay
  * NULL (no invented values), and observed hours carry their own sum.
  */
class GapFillSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def run = graft.queries.Registry.all
    .find(_.name == "e16_gap_fill").get.run(spark, dir)

  test("the grid is dense, keyed, and exactly types x hours") {
    val rows = run.collect()
    val types = rows.map(_.getString(0)).distinct.length
    val hours = rows.map(_.getLong(1)).distinct.sorted
    assert(rows.length === types * hours.length, "grid must be the full cross product")
    assert(hours.zip(hours.tail).forall { case (a, b) => b - a == 3600000000L },
      "the hour calendar must have no holes")
    assert(rows.count(_.getLong(2) == 0L) > 0, "the fixture must contain real gaps")
  }

  test("LOCF carries the last observed sum across gaps and stays null before first obs") {
    val byType = run.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .groupBy(_._1)
    byType.values.foreach { series =>
      var lastObserved: Option[Double] = None
      series.sortBy(_._2).foreach { case (ty, h, n, locf) =>
        if (n > 0L) {
          assert(locf.isDefined, s"$ty@$h: observed hour must carry a value")
          lastObserved = locf
        } else {
          assert(locf === lastObserved,
            s"$ty@$h: gap row must carry forward exactly the last observed sum")
        }
      }
    }
    assert(run.filter(col("locf_value").isNull).count() > 0,
      "hours before a type's first observation must stay NULL, not invent a value")
  }

  test("the corpus never enters the grid cross product") {
    val df = run
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the grid must come from the windowed bounds + sequence explode, never a cross product:\n${p.take(2500)}")
  }

  // ---- e17: linear interpolation over the same grid ----

  private def runInterp = graft.queries.Registry.all
    .find(_.name == "e17_interp").get.run(spark, dir)

  test("e17 interpolates interior gaps, keeps observed sums, never extrapolates") {
    val locf = run.collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    val byType = runInterp.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .groupBy(_._1)
    var interiorGaps = 0
    byType.values.foreach { series =>
      val s = series.sortBy(_._2)
      val obs = s.filter(_._3 > 0L)
      val (firstObs, lastObs) = (obs.head._2, obs.last._2)
      s.foreach { case (ty, h, n, v) =>
        if (n > 0L) {
          assert(v === locf((ty, h)), s"$ty@$h: observed hour must carry its own sum")
        } else if (h < firstObs || h > lastObs) {
          assert(v.isEmpty, s"$ty@$h: outside the observed envelope must stay NULL")
        } else {
          interiorGaps += 1
          val (ph, pv) = obs.filter(_._2 < h).last match { case (_, hh, _, vv) => (hh, vv.get) }
          val (nh, nv) = obs.find(_._2 > h).get match { case (_, hh, _, vv) => (hh, vv.get) }
          val expect = pv + (nv - pv) * ((h - ph).toDouble / (nh - ph).toDouble)
          assert(v.contains(expect),
            s"$ty@$h: interior gap must be the exact time-weighted blend")
        }
      }
    }
    assert(interiorGaps > 0, "the fixture must exercise interior gaps")
  }

  test("e17 shares e16's no-cross-product plan shape") {
    val df = runInterp
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"e17 must keep the calendar-sized grid plan:\n${p.take(2500)}")
  }
}
