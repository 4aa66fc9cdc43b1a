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
  private val lo = "1998-03-01"
  private val hi = "1998-06-01"

  private def rangeFilter(df: org.apache.spark.sql.DataFrame) =
    df.filter(col("o_date") >= lit(lo).cast("date")
      && col("o_date") < lit(hi).cast("date"))

  /** Rows emitted by the parquet scan itself (post row-group pruning,
    * pre residual filter). AQE off so the executed plan is a plain
    * tree the scan node can be collected from.
    */
  private def scanEmittedRows(df: => org.apache.spark.sql.DataFrame): Long = {
    spark.conf.set("spark.sql.adaptive.enabled", false)
    try {
      val d = df
      d.collect()
      val scans = d.queryExecution.executedPlan.collect {
        case f: FileSourceScanExec => f.metrics("numOutputRows").value
      }
      assert(scans.nonEmpty, s"no FileSourceScan in:\n${d.queryExecution.executedPlan}")
      scans.sum
    } finally spark.conf.set("spark.sql.adaptive.enabled", true)
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
    val clustered = scanEmittedRows(
      rangeFilter(graft.sources.Layout.clusteredOrders(spark, dir)))
    val matching = rangeFilter(graft.sources.Layout.clusteredOrders(spark, dir)).count()
    // the clustered scan emits only the intersecting row groups: at
    // least the true matches, at most a fraction of the history
    assert(matching > 0, "gate window must be non-empty at this SF")
    assert(clustered >= matching && clustered < total / 2,
      s"clustered scan emitted $clustered of $total rows " +
        s"($matching truly match $lo..$hi) — zone-map pruning did not engage")
  }

  test("q45's predicates reach the parquet reader (PushedFilters)") {
    val df = rangeFilter(graft.sources.Layout.clusteredOrders(spark, dir))
    val plan = df.queryExecution.sparkPlan.toString
    assert(plan.contains("GreaterThanOrEqual(o_date") && plan.contains("LessThan(o_date"),
      s"date bounds must push into the scan:\n${plan.take(2000)}")
  }
}
