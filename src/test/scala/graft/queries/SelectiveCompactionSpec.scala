package graft.queries

import graft.SparkSpec
import graft.sources.Layout

/** q46 selective compaction: the on-disk physics the SQL oracle cannot
  * see — the mixed-health fixture really has both regimes, the planner
  * rewrites exactly the over-threshold partitions to q39's ⌈n/target⌉
  * bound, and healthy partitions' files come through BYTE-IDENTICAL
  * (same names, same lengths — the incremental-maintenance guarantee:
  * work proportional to debris, not table size).
  */
class SelectiveCompactionSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def partDirs(root: String): Map[String, java.io.File] =
    new java.io.File(root).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("event_type="))
      .map(f => f.getName -> f).toMap

  private def files(d: java.io.File): Map[String, Long] =
    d.listFiles().filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.length()).toMap

  test("planner rewrites exactly the debris partitions; healthy files stay byte-identical") {
    val before = partDirs(Layout.mixedHealthEventsPath(spark, dir))
    val after = partDirs(Layout.selectivelyCompactedPath(spark, dir))
    assert(before.keySet == after.keySet, "partition set must survive")
    val (debris, healthy) = before.keys.partition(
      p => files(before(p)).size > Layout.CompactFileThreshold)
    assert(debris.nonEmpty && healthy.nonEmpty,
      s"fixture must exercise BOTH regimes, got debris=$debris healthy=$healthy")
    healthy.foreach { p =>
      assert(files(after(p)) == files(before(p)),
        s"healthy partition $p must keep its files byte-identical")
    }
    debris.foreach { p =>
      val n = spark.read.parquet(after(p).getAbsolutePath).count()
      val expect = ((n + Layout.TargetRowsPerFile - 1) / Layout.TargetRowsPerFile).toInt
      assert(files(after(p)).size == expect,
        s"debris partition $p: expected ⌈$n/${Layout.TargetRowsPerFile}⌉=$expect files, " +
          s"got ${files(after(p)).size}")
      assert(files(after(p)) != files(before(p)),
        s"debris partition $p must actually have been rewritten")
    }
  }

  test("multi-file regime at sf0.01: an over-target debris partition splits, bounded") {
    // sf0.001's partitions all fit one target file; this is the regime
    // where the bin-packing bound inside the SELECTIVE rewrite is real
    // (the same coverage CompactionSpec carries for q39's full rewrite)
    val big = "/root/testdata/sf0.01"
    val counted = partDirs(Layout.selectivelyCompactedPath(spark, big)).map {
      case (p, d) => p -> (d, spark.read.parquet(d.getAbsolutePath).count())
    }
    val before = partDirs(Layout.mixedHealthEventsPath(spark, big))
    // only rewritten (debris) partitions carry the bound; the fixture
    // must provide at least one that is BOTH debris and over-target
    val rewrittenOver = counted.filter { case (p, (_, n)) =>
      n > Layout.TargetRowsPerFile && files(before(p)).size > Layout.CompactFileThreshold
    }
    assert(rewrittenOver.nonEmpty,
      s"fixture must have an over-target DEBRIS partition at sf0.01, saw=${counted.keySet}")
    rewrittenOver.foreach { case (p, (d, n)) =>
      val expect = ((n + Layout.TargetRowsPerFile - 1) / Layout.TargetRowsPerFile).toInt
      assert(files(d).size == expect && expect > 1,
        s"$p: expected the multi-file bound $expect, got ${files(d).size}")
    }
  }

  test("selective and full compaction serve identical content") {
    import org.apache.spark.sql.functions.col
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("event_id"), col("event_type")).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(
      rows(spark.read.parquet(Layout.selectivelyCompactedPath(spark, dir))) ==
        rows(graft.Tables.t(spark, dir, "events")),
      "selective compaction must preserve the exact row set")
  }
}
