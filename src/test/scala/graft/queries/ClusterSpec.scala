package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** q45 linear clustering: the on-disk contracts that make zone-map
  * skipping work — every clustered file owns a disjoint o_date range
  * and together they carry the whole table — plus MEASURED skipping:
  * the same narrow range scan emits a fraction of the rows from the
  * clustered layout that it emits from the unsorted original (whose
  * single row group spans the full history and can never be skipped).
  * Scan-emitted rows are read from the FileSourceScan metric, i.e.
  * rows surviving parquet row-group pruning BEFORE the residual
  * filter. History note: the clustering key is a derived DATE because
  * the raw TIMESTAMP_NTZ column's pushed filters do NOT prune row
  * groups (measured: the NTZ spelling emitted all 1500 rows with the
  * predicate visibly in PushedFilters).
  */
class ClusterSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  // the query's OWN gate window — retuning it in Layout retunes the pins
  private val lo = graft.sources.Layout.ClusterQueryLo
  private val hi = graft.sources.Layout.ClusterQueryHi

  private def rangeFilter(df: org.apache.spark.sql.DataFrame) =
    df.filter(col("o_date") >= lit(lo).cast("date")
      && col("o_date") < lit(hi).cast("date"))

  /** (scan-emitted rows, result rows) of one execution: rows emitted by
    * the parquet scan itself (post row-group pruning, pre residual
    * filter) and the rows surviving the full filter — one run, so both
    * numbers describe the SAME execution. AQE off so the executed plan
    * is a plain tree the scan node can be collected from; the prior
    * setting is restored, not assumed (shared test session).
    */
  private def scanVsResultRows(df: => org.apache.spark.sql.DataFrame): (Long, Long) = {
    val prior = spark.conf.getOption("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", false)
    try {
      val d = df
      val n = d.collect().length.toLong
      val scans = d.queryExecution.executedPlan.collect {
        case f: FileSourceScanExec => f.metrics("numOutputRows").value
      }
      assert(scans.nonEmpty, s"no FileSourceScan in:\n${d.queryExecution.executedPlan}")
      (scans.sum, n)
    } finally prior match {
      case Some(v) => spark.conf.set("spark.sql.adaptive.enabled", v)
      case None => spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }

  test("clustered files own disjoint o_date ranges and cover the table") {
    val clustered = graft.sources.Layout.clusteredOrders(spark, dir)
    val files = clustered.select(input_file_name().as("f"), col("o_date"))
      .groupBy("f")
      .agg(min("o_date").as("lo"), max("o_date").as("hi"), count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1), r.getDate(2), r.getLong(3)))
    assert(files.length > 1, "the multi-file skipping regime must be real at gate SF")
    // disjoint: sorted by lo, each file's hi <= the next file's lo
    // (range partitioning may place a boundary day's rows in either
    // neighbor, but ranges must never properly overlap)
    val sorted = files.sortBy(_._2.getTime)
    sorted.sliding(2).foreach {
      case Array((fa, _, hiA, _), (fb, loB, _, _)) =>
        assert(hiA.getTime <= loB.getTime,
          s"file ranges overlap: $fa ends $hiA after $fb starts $loB")
      case _ =>
    }
    val total = graft.Tables.t(spark, dir, "orders").count()
    assert(sorted.map(_._4).sum == total, "clustered copy must carry every row")
  }

  test("zone maps skip: clustered scan emits a fraction of the full table") {
    val total = graft.Tables.t(spark, dir, "orders").count()
    val (scanned, matching) = scanVsResultRows(
      rangeFilter(graft.sources.Layout.clusteredOrders(spark, dir)))
    // the clustered scan emits only the intersecting row groups: at
    // least the true matches, at most a fraction of the history
    assert(matching > 0, "gate window must be non-empty at this SF")
    assert(scanned >= matching && scanned < total / 2,
      s"clustered scan emitted $scanned of $total rows " +
        s"($matching truly match $lo..$hi) — zone-map pruning did not engage")
  }

  test("q45's predicates reach the parquet reader (PushedFilters)") {
    val df = rangeFilter(graft.sources.Layout.clusteredOrders(spark, dir))
    // read the scan's metadata map, not the rendered plan string — the
    // string truncates metadata entries at spark.sql.maxMetadataStringLength
    // (default 100 chars), one filter away from a false failure here
    val pushed = df.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec => f.metadata("PushedFilters")
    }
    assert(pushed.nonEmpty, "no FileSourceScan in the plan")
    assert(pushed.exists(p =>
      p.contains("GreaterThanOrEqual(o_date") && p.contains("LessThan(o_date")),
      s"date bounds must push into the scan: $pushed")
  }
}
