package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** m9 clip containment: every synthetic clip must be found inside its
  * own source at exactly the cut offset; the whole-payload fingerprint
  * (m1's md5) structurally cannot pair a clip with its source; and the
  * alignment join stays equi-join shaped.
  */
class ClipContainmentSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def q(name: String) = graft.queries.Registry.all.find(_.name == name).get

  test("every clip is found inside its source at the cut offset") {
    val clips = Multimodal.clipBlobs(spark, dir)
      .select("clip_id", "src_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clips.nonEmpty, "fixture must produce clips at sf0.001")
    val hits = q("m9_clip_containment").run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    clips.foreach { case (cid, src) =>
      assert(hits.contains((cid, src, Multimodal.ClipOff.toLong)),
        s"clip $cid must align inside source $src at frame_off ${Multimodal.ClipOff}")
    }
  }

  test("whole-payload fingerprints cannot see the containment m9 finds") {
    val srcMd5 = Multimodal.blobs(spark, dir)
      .select(col("id"), md5(lower(hex(col("payload")))).as("m"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val clipMd5 = Multimodal.clipBlobs(spark, dir)
      .select(col("src_id"), md5(lower(hex(col("payload")))).as("m"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(clipMd5.nonEmpty && clipMd5.forall { case (src, m) => srcMd5(src) != m },
      "a clip's whole-payload hash must differ from its source's — that is why m9 exists")
  }

  test("the alignment join is a frame-hash equi-join, never a cartesian") {
    val df = q("m9_clip_containment").run(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"m9 must meet frames through the hash equi-join:\n${p.take(2500)}")
  }
}
