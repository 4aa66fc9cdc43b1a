package graft.queries

import graft.SparkSpec
import graft.sources.Layout
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** q63 Hilbert clustering: the curve's mathematical contracts (bijection,
  * full adjacency, fewer cover runs than Morton — exhaustively, over
  * every rectangle of the grid), the layout's on-disk contract (files
  * own disjoint Hilbert-index ranges and carry the whole table), the
  * query's semantic contract (equals the raw rectangle filter), and the
  * MEASURED skipping the run-range filter buys (the clustered scan
  * emits a fraction of the table's rows, q45's metric).
  */
class HilbertSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private val n = 16

  private def runs(vals: Seq[Long]): Int =
    Layout.contiguousRuns(vals).length

  test("LUT is a bijection onto [0, 256)") {
    assert(Layout.HilbertLut.sorted == (0L until 256L))
  }

  test("every consecutive Hilbert step is grid-adjacent; Morton is not") {
    val pos = (for { x <- 0 until n; y <- 0 until n }
      yield Layout.HilbertLut(x * n + y) -> (x, y)).toMap
    val mpos = (for { x <- 0 until n; y <- 0 until n }
      yield Layout.mortonD(x, y) -> (x, y)).toMap
    def adjacentSteps(p: Map[Long, (Int, Int)]): Int =
      (0L until 255L).count { d =>
        val (x0, y0) = p(d); val (x1, y1) = p(d + 1)
        math.abs(x0 - x1) + math.abs(y0 - y1) == 1
      }
    assert(adjacentSteps(pos) == 255, "Hilbert must be fully adjacent")
    assert(adjacentSteps(mpos) < 255,
      "Morton must NOT be fully adjacent (or the second curve is pointless)")
  }

  test("rectangle covers: Hilbert needs no more runs than Morton, everywhere") {
    var hTotal = 0L; var mTotal = 0L
    for {
      x0 <- 0 until n; x1 <- x0 until n
      y0 <- 0 until n; y1 <- y0 until n
    } {
      val cells = for { x <- x0 to x1; y <- y0 to y1 } yield (x, y)
      hTotal += runs(cells.map { case (x, y) => Layout.HilbertLut(x * n + y) })
      mTotal += runs(cells.map { case (x, y) => Layout.mortonD(x, y) })
    }
    assert(hTotal < mTotal,
      s"Hilbert must cover rectangles in fewer total runs (h=$hTotal m=$mTotal)")
    // the gate rectangle specifically: 5 runs vs 7 (retuning the
    // rectangle in Layout retunes this pin)
    val gate = for { x <- Layout.HQueryXCells; y <- Layout.HQueryYCells }
      yield (x, y)
    val h = runs(gate.map { case (x, y) => Layout.HilbertLut(x * n + y) })
    val m = runs(gate.map { case (x, y) => Layout.mortonD(x, y) })
    assert(h < m, s"gate rectangle must separate the curves (h=$h m=$m)")
  }

  test("contiguousRuns collapses exactly to maximal runs") {
    assert(Layout.contiguousRuns(Seq(5L, 1L, 2L, 3L, 7L, 8L)) ==
      Seq(1L -> 3L, 5L -> 5L, 7L -> 8L))
    assert(Layout.contiguousRuns(Seq.empty[Long]).isEmpty)
    assert(Layout.contiguousRuns(Seq(4L, 4L, 5L)) == Seq(4L -> 5L))
  }

  test("q63 equals the raw rectangle filter; hd matches the LUT") {
    val got = graft.SparkEntry.queries("q63_hilbert")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(4))).toMap
    val mm = graft.Tables.t(spark, dir, "orders")
      .agg(min("o_custkey"), max("o_custkey")).collect()(0)
    val (ckMin, ckSpan) = (mm.getLong(0), mm.getLong(1) - mm.getLong(0) + 1)
    val dayNo = expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000")
    val dm = graft.Tables.t(spark, dir, "orders").select(dayNo.as("d"))
      .agg(min("d"), max("d")).collect()(0)
    val (dMin, dSpan) = (dm.getLong(0), dm.getLong(1) - dm.getLong(0) + 1)
    val direct = graft.Tables.t(spark, dir, "orders")
      .withColumn("xb", expr(s"((o_custkey - ${ckMin}L) * 16) div ${ckSpan}L"))
      .withColumn("yb", expr(
        s"(((unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000) - ${dMin}L) * 16) div ${dSpan}L"))
      .filter(col("xb").between(Layout.HQueryXCells.head, Layout.HQueryXCells.last)
        && col("yb").between(Layout.HQueryYCells.head, Layout.HQueryYCells.last))
      .select(col("o_orderkey"), col("xb"), col("yb"))
      .collect()
      .map(r => r.getLong(0) ->
        Layout.HilbertLut(r.getLong(1).toInt * n + r.getLong(2).toInt))
      .toMap
    assert(got == direct && got.nonEmpty,
      s"hilbert query must equal the raw rectangle filter (${got.size} vs ${direct.size})")
  }

  test("run-range filter skips: clustered scan emits a fraction of the table") {
    val prior = spark.conf.getOption("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", false)
    try {
      val d = graft.SparkEntry.queries("q63_hilbert")(spark, dir)
      val matching = d.collect().length.toLong
      val scanned = d.queryExecution.executedPlan.collect {
        case f: FileSourceScanExec => f.metrics("numOutputRows").value
      }
      assert(scanned.nonEmpty, s"no FileSourceScan in:\n${d.queryExecution.executedPlan}")
      val total = graft.Tables.t(spark, dir, "orders").count()
      assert(matching > 0, "gate rectangle must be non-empty")
      // ~12% of cells intersect the cover; row groups are coarse, so
      // just pin a real fraction — the unsorted table could never skip
      assert(scanned.sum < total,
        s"clustered scan must skip row groups (scanned ${scanned.sum} of $total)")
    } finally prior match {
      case Some(v) => spark.conf.set("spark.sql.adaptive.enabled", v)
      case None => spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }

  test("clustered files own disjoint hd ranges and carry the whole table") {
    // read the layout through the query's own builder (memoized)
    val lay = graft.SparkEntry.queries("q63_hilbert")(spark, dir)
    // reach the files via input_file_name over the unfiltered layout:
    // rebuild the path the same way the operator does
    val full = {
      // the cover filter narrows files; instead scan the layout dir
      // from any one matching file's parent
      val f = lay.select(input_file_name()).limit(1).collect()(0).getString(0)
      spark.read.parquet(new java.io.File(new java.net.URI(f)).getParent)
    }
    val files = full.select(input_file_name().as("f"), col("hd"))
      .groupBy("f")
      .agg(min("hd").as("lo"), max("hd").as("hi"), count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(files.length > 1, "multi-file regime must be real at gate SF")
    val sorted = files.sortBy(_._2)
    sorted.sliding(2).foreach {
      case Array((fa, _, hiA, _), (fb, loB, _, _)) =>
        assert(hiA <= loB, s"file hd ranges overlap: $fa ends $hiA after $fb starts $loB")
      case _ =>
    }
    val total = graft.Tables.t(spark, dir, "orders").count()
    assert(sorted.map(_._4).sum == total, "clustered copy must carry every row")
  }
}
