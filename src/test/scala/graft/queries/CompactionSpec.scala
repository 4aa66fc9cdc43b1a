package graft.queries

import graft.{SparkEntry, SparkSpec}
import graft.sources.Layout
import org.apache.spark.sql.functions._

/** q39 compaction: the on-disk properties the SQL oracle can't see.
  * The fixture fragments `events` into ~16 files per partition (a
  * micro-batch ingest's debris); compaction must bin-pack each
  * partition to exactly ⌈n/TargetRowsPerFile⌉ bounded files (one file
  * in the tiny regime, several at sf0.01+) while preserving content
  * bit-for-bit.
  */
class CompactionSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def parquetFilesPerPartition(root: String): Map[String, Int] = {
    val d = new java.io.File(root)
    d.listFiles().filter(f => f.isDirectory && f.getName.startsWith("event_type="))
      .map(p => p.getName ->
        p.listFiles().count(f => f.getName.endsWith(".parquet")))
      .toMap
  }

  private def compactedFiles(d: String): (Map[String, Int], Map[String, Int], Map[String, Long]) = {
    val frag = parquetFilesPerPartition(Layout.fragmentedEventsPath(spark, d))
    val compacted = Layout.compactedEvents(spark, d)
    // the compacted root is the input's sibling rewrite; recover it
    // from the scan's file listing rather than duplicating path logic
    val compactRoot = compacted.inputFiles.head
      .replaceFirst("/event_type=.*$", "").replaceFirst("^file:", "")
    val rowsPerType = compacted.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    (frag, parquetFilesPerPartition(compactRoot), rowsPerType)
  }

  /** ceil(n/target) per partition, shared by both regimes' tests. */
  private def assertPacked(
      frag: Map[String, Int], comp: Map[String, Int], rows: Map[String, Long]): Unit = {
    assert(comp.keySet == frag.keySet, "compaction must preserve the partition set")
    comp.foreach { case (part, nFiles) =>
      val n = rows(part.stripPrefix("event_type="))
      val expect = ((n + Layout.TargetRowsPerFile - 1) / Layout.TargetRowsPerFile).toInt
      assert(nFiles == expect, s"$part: $n rows must pack to $expect files, got $nFiles")
      assert(nFiles < frag(part), s"$part must end with fewer files than the debris")
    }
  }

  test("fixture is fragmented; compaction bin-packs each partition to ceil(n/target) files") {
    val (frag, comp, rows) = compactedFiles(dir)
    assert(frag.nonEmpty)
    assert(frag.values.forall(_ > 1),
      s"fixture must have the small-files problem, got $frag")
    assertPacked(frag, comp, rows)
    // at sf0.001 every type fits one target file — the single-file regime
    assert(comp.values.forall(_ == 1), s"tiny corpus should compact to 1 file/partition: $comp")
  }

  test("bin-packing regime: a partition larger than the target splits into multiple bounded files") {
    // sf0.01: ~2k rows/type -> exactly 2 files of <= target rows each;
    // partition-set preservation asserted HERE too — the multi-file
    // rolling path must not silently drop a partition
    val (frag, comp, rows) = compactedFiles("/root/testdata/sf0.01")
    assert(comp.values.forall(_ > 1),
      s"sf0.01 partitions exceed one target file and must split: $comp")
    assertPacked(frag, comp, rows)
    // content preserved in the multi-file regime as well: the compacted
    // rows equal the original table (the sf0.001 content test never
    // exercises mid-partition file rolling)
    val orig = graft.Tables.t(spark, "/root/testdata/sf0.01", "events")
    val compacted = Layout.compactedEvents(spark, "/root/testdata/sf0.01")
    assert(compacted.count() == orig.count())
    assert(compacted.select("event_id").except(orig.select("event_id")).count() == 0)
  }

  test("compaction preserves content exactly: ids, rows, and values") {
    val original = graft.Tables.t(spark, dir, "events")
    val compacted = Layout.compactedEvents(spark, dir)
    assert(compacted.count() == original.count())
    // identity set equality via anti-joins both ways (event_id unique)
    assert(compacted.select("event_id")
      .except(original.select("event_id")).count() == 0)
    assert(original.select("event_id")
      .except(compacted.select("event_id")).count() == 0)
    // and the gate aggregate equals the same aggregate over the original
    val q = SparkEntry.queries("q39_compaction")(spark, dir).collect()
      .map(_.toString).toSet
    graft.functions.GraftFunctions.register(spark)
    val direct = original.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        graft.Agg.dsum(col("value")).as("sum_value"),
        expr("bit_xor(md5_long(CAST(event_id AS STRING)))").as("id_xor"))
      .collect().map(_.toString).toSet
    assert(q == direct)
  }
}
