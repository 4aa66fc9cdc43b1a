package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** e27's live behavior — the properties the batch degeneration cannot
  * show: bottom-k state CARRIES across micro-batches, each batch's
  * snapshot is the k-th order statistic of everything seen so far (so
  * the estimate tightens monotonically — kth never increases), and a
  * source stays silent until it has accumulated k distinct hashes.
  */
class KmvStreamSpec extends SparkSpec {

  test("kmv snapshots tighten across micro-batches; final equals batch") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val k = 4 // tiny sketch: the merge/emission logic is k-independent
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[(String, Long)]
    val query = DocStream.kmvMaintain(mem.toDS(), k)
      .writeStream.format("memory").queryName("kmv27")
      .outputMode("append").start()
    try {
      // batch 1: source a gets only 3 distinct hashes -> below k, silent
      mem.addData(("a", 50L), ("a", 40L), ("a", 30L), ("a", 40L))
      query.processAllAvailable()
      assert(spark.table("kmv27").count() == 0,
        "a source thinner than k must not emit")
      // batch 2: a 4th distinct hash arrives -> kth = 4th smallest = 60
      mem.addData(("a", 60L))
      query.processAllAvailable()
      val snap1 = spark.table("kmv27").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      assert(snap1 == Set(("a", 60L)), s"first full sketch kth: $snap1")
      // batch 3: smaller hashes displace the tail -> kth TIGHTENS to 40
      mem.addData(("a", 10L), ("a", 20L))
      query.processAllAvailable()
      val snaps = spark.table("kmv27").collect()
        .map(r => (r.getString(0), r.getLong(1)))
      assert(snaps.toSet == Set(("a", 60L), ("a", 40L)),
        s"snapshot sequence must be 60 then 40: ${snaps.toSeq}")
      // monotone: across the emitted sequence kth never increased
      val ks = snaps.map(_._2)
      assert(ks.sorted.reverse.sameElements(ks), s"kth must tighten: ${ks.toSeq}")
      // a batch of hashes all ABOVE the current kth changes nothing and
      // must emit nothing (no duplicate append-mode snapshots)
      mem.addData(("a", 900L), ("a", 30L))
      query.processAllAvailable()
      assert(spark.table("kmv27").count() == snaps.length,
        "an above-kth batch (and a duplicate min) must not re-emit")
      // batch replay of the SAME rows = one final row at the same kth
      val batch = DocStream.kmvMaintain(
        Seq(("a", 50L), ("a", 40L), ("a", 30L), ("a", 40L), ("a", 60L),
          ("a", 10L), ("a", 20L)).toDS(), k)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(batch == Set(("a", 40L)),
        s"batch degeneration must equal the final snapshot: $batch")
    } finally {
      query.stop()
      prior match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }
}
