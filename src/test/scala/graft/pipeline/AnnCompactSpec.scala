package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** s13 delta-to-base index compaction: the on-disk physics the SQL
  * oracle cannot see — untouched cell directories keep their files
  * byte-identical (names + lengths), exactly the delta-touched cells
  * are rewritten, and the compacted layout reads back as precisely
  * base ∪ delta (the read-equivalence that makes the fold safe to
  * swap under live probes).
  */
class AnnCompactSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def cellDirs(root: String): Map[String, java.io.File] =
    new java.io.File(root).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cid="))
      .map(f => f.getName -> f).toMap

  private def files(d: java.io.File): Map[String, Long] =
    graft.sources.Layout.dataFiles(d).map(f => f.getName -> f.length()).toMap

  test("untouched cells byte-identical; exactly the delta-touched cells rewritten") {
    val before = cellDirs(Similarity.s13BaseLayoutPath(spark, dir))
    val after = cellDirs(Similarity.s13CompactedPath(spark, dir))
    val touched = Similarity.s13TouchedCells(spark, dir).map(c => s"cid=$c").toSet
    assert(touched.nonEmpty && (before.keySet -- touched).nonEmpty,
      "fixture must have both touched and untouched cells")
    assert(after.keySet == before.keySet ++ touched,
      "compaction must add only delta-born cells")
    (before.keySet -- touched).foreach { c =>
      assert(files(after(c)) == files(before(c)),
        s"untouched cell $c must keep its files byte-identical")
    }
    touched.filter(before.contains).foreach { c =>
      assert(files(after(c)) != files(before(c)),
        s"touched cell $c must actually have been rewritten")
    }
  }

  test("read-equivalence: the compacted layout is exactly base ∪ delta") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), col("cid").cast("long"), col("code"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val base = rows(spark.read.parquet(Similarity.s13BaseLayoutPath(spark, dir)))
    val delta = rows(Similarity.annDeltaIndex(spark, dir))
    val compacted = rows(spark.read.parquet(Similarity.s13CompactedPath(spark, dir)))
    assert(delta.nonEmpty && (base & delta).isEmpty,
      "the delta must be disjoint new rows")
    assert(compacted == base ++ delta,
      "every base and delta row must survive the fold exactly once")
  }
}
