package graft.queries

import graft.SparkSpec
import graft.sources.Layout
import org.apache.spark.sql.functions._

/** q49 file-level bloom skipping: the planning-metadata contracts
  * behind the gate query — pruning is real (a point-lookup batch reads
  * a strict minority of the clustered files), blooms have no false
  * negatives (every file truly holding a probe key is selected), the
  * min/max zone map genuinely cannot help (each file's key range spans
  * the domain — the case this index exists for), and the pruned read
  * returns exactly the full-scan result.
  */
class BloomSkipSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("pruning is real and has no false negatives; pruned read equals full scan") {
    val sel = Layout.bloomSelectedFiles(spark, dir).toSet
    val blooms = Layout.fileBlooms(spark, dir)
    val probes = Layout.probeKeyHashes(spark, dir).map(_._1)
    assert(blooms.size > 1, "the clustered layout must shard into multiple files")
    assert(sel.nonEmpty && sel.size < blooms.size / 2,
      s"a ${probes.size}-key lookup must prune most files: selected ${sel.size} of ${blooms.size}")
    // no false negatives: the files that truly hold a probe key
    val truly = Layout.clusteredOrders(spark, dir)
      .filter(col("o_orderkey").isin(probes: _*))
      .select(input_file_name()).distinct()
      .collect().map(_.getString(0)).toSet
    assert(truly.subsetOf(sel),
      s"bloom selection lost files that hold probe keys: ${truly.diff(sel)}")
    // pruned read = full scan, row for row
    val pruned = spark.read.parquet(sel.toSeq: _*)
      .filter(col("o_orderkey").isin(probes: _*))
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .collect().map(_.toString).sorted
    val full = Layout.clusteredOrders(spark, dir)
      .filter(col("o_orderkey").isin(probes: _*))
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .collect().map(_.toString).sorted
    assert(pruned.sameElements(full), "pruned read must equal the full scan exactly")
  }

  test("the min/max zone map cannot prune this lookup — every file spans the key domain") {
    val probes = Layout.probeKeyHashes(spark, dir).map(_._1)
    val ranges = Layout.clusteredOrders(spark, dir)
      .groupBy(input_file_name().as("f"))
      .agg(min("o_orderkey").as("mn"), max("o_orderkey").as("mx"))
      .collect()
    // a min/max index keeps a file iff any probe lies inside its range;
    // on the date-clustered layout that is (nearly) every file
    val minMaxKept = ranges.count(r =>
      probes.exists(p => p >= r.getLong(1) && p <= r.getLong(2)))
    assert(minMaxKept > ranges.length / 2,
      s"fixture must exhibit the zone-map blind spot: min/max keeps $minMaxKept of ${ranges.length}")
    val bloomKept = Layout.bloomSelectedFiles(spark, dir).size
    assert(bloomKept < minMaxKept,
      s"blooms must out-prune min/max here: bloom $bloomKept vs min/max $minMaxKept")
  }
}
