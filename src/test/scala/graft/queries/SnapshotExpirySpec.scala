package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q52 snapshot expiry + vacuum: the file-layer contracts behind the
  * aggregate gate — the orphan set is exactly the v0 files batch 1
  * rewrote, file-layer reads at retained snapshots equal the resolved
  * states pre AND post vacuum, deleting a live file (an over-eager
  * vacuum) visibly breaks the read, the expired snapshot really becomes
  * unreadable, and the whole file inventory stays metadata-scale.
  */
class SnapshotExpirySpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def af = Advanced.snapAllFiles(spark, dir)

  test("orphans are exactly the v0 files whose fid batch 1 rewrote") {
    val touched1 = Advanced.cdcLogs(spark, dir).filter(col("b") === 1)
      .select(pmod(col("k"), lit(Advanced.SnapFidMod)).as("fid")).distinct()
    // select a fixed column order on both sides: exceptAll is
    // positional, and a using-column join moves `fid` first
    val expected = af.filter(col("b") === 0)
      .join(touched1, Seq("fid"), "left_semi").select("b", "fid")
    val orphans = Advanced.snapOrphans(af).select("b", "fid")
    assert(orphans.count() > 0, "batch 1 must orphan at least one v0 file at this SF")
    assert(orphans.exceptAll(expected).count() == 0L
      && expected.exceptAll(orphans).count() == 0L,
      "orphan set must equal {(0, f) : f ∈ touched(1)} exactly")
  }

  test("file-layer reads at retained snapshots equal the resolved states, pre and post vacuum") {
    val live = Advanced.snapLive(af)
    for (v <- Seq(1, 2); (label, present) <- Seq("pre" -> af, "post" -> live)) {
      val viaFiles = Advanced.snapRead(spark, dir, v, present)
      val state = Advanced.asOfState(spark, dir, v).drop("v")
      assert(viaFiles.exceptAll(state).count() == 0L
        && state.exceptAll(viaFiles).count() == 0L,
        s"$label-vacuum read at v=$v must equal the resolved state")
    }
  }

  test("an over-eager vacuum that deletes a live file visibly breaks the read") {
    val live = Advanced.snapLive(af)
    // drop one file that snapshot 2's manifest references
    val victim = Advanced.snapManifest(af, 2).limit(1)
    val damaged = live.join(victim, Seq("b", "fid"), "left_anti")
    val whole = Advanced.snapRead(spark, dir, 2, live).count()
    val broken = Advanced.snapRead(spark, dir, 2, damaged).count()
    assert(broken < whole,
      s"deleting a manifest-referenced file must lose rows: $broken vs $whole")
  }

  test("the expired snapshot becomes unreadable: post-vacuum v0 loses exactly the orphaned shards") {
    val live = Advanced.snapLive(af)
    val full = Advanced.snapRead(spark, dir, 0, af)
    val post = Advanced.snapRead(spark, dir, 0, live)
    val orphanFids = Advanced.snapOrphans(af).select(col("fid"))
    val expectedLost = full
      .withColumn("fid", pmod(col("k"), lit(Advanced.SnapFidMod)))
      .join(orphanFids, Seq("fid"), "left_semi").count()
    assert(expectedLost > 0)
    assert(post.count() == full.count() - expectedLost,
      "the v0 read after vacuum must lose exactly the rows of orphaned files")
  }

  test("the file inventory and manifests stay metadata-scale; manifests reference only live files") {
    val n = af.count()
    assert(n <= 3L * Advanced.SnapFidMod,
      s"inventory must stay file-count-scale: $n")
    val live = Advanced.snapLive(af)
    for (v <- Seq(1, 2)) {
      val dangling = Advanced.snapManifest(af, v)
        .join(live, Seq("b", "fid"), "left_anti").count()
      assert(dangling == 0L, s"manifest($v) must be fully inside the live set")
    }
  }
}
