package graft.bench

import graft.SparkSpec
import graft.datagen.Case

/** The parquet-dictionary sweep variant (SURVEY §7.3): the measured
  * batch must really come back from DICTIONARY-ENCODED parquet — same
  * rows, same pre-sorted order — or the "<case>-parquet" cell families
  * would silently time the in-memory workload under a storage label.
  */
class ParquetDictSweepSpec extends SparkSpec {

  test("round trip preserves rows and order; column chunks are dictionary-encoded") {
    for (c <- Seq(Case.DictionaryTuple, Case.MixedDictionaryTuple)) {
      val n = 2000
      val back = SortSweep.parquetInput(spark, c, n)
      val got = back.collect()
      val want = c.df(spark, n).collect()
      assert(got.length == n, s"${c.name}: row count")
      assert(got.toSeq == want.toSeq, s"${c.name}: rows/order must survive the round trip")

      // footer check: every string column chunk carries a dictionary
      // encoding (RLE_DICTIONARY in the v2 writer, PLAIN_DICTIONARY in v1)
      val dir = new java.io.File(s"${graft.Scratch.dir}/graft-sweep-pq/${c.name}-$n")
      val part = dir.listFiles().find(_.getName.endsWith(".parquet")).get
      val conf = new org.apache.hadoop.conf.Configuration()
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(new org.apache.hadoop.fs.Path(part.getAbsolutePath), conf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        import scala.jdk.CollectionConverters._
        val chunks = reader.getFooter.getBlocks.asScala.flatMap(_.getColumns.asScala)
        val strChunks = chunks.filter(ch =>
          c.dictCols.map(i => c.schema.fields(i).name).contains(ch.getPath.toDotString))
        assert(strChunks.nonEmpty, s"${c.name}: no string column chunks found")
        strChunks.foreach { ch =>
          val encs = ch.getEncodings.asScala.map(_.name()).toSet
          assert(encs.exists(e => e.contains("DICTIONARY")),
            s"${c.name}/${ch.getPath}: expected a dictionary encoding, got $encs")
        }
      } finally reader.close()
    }
  }

  test("measureBoth runs over the parquet-born batch") {
    val df = SortSweep.parquetInput(spark, Case.DictionaryTuple, 2000).persist()
    df.count()
    val pts = SortSweep.measureBoth("dictionary-tuple", df, 2000, 3)
    df.unpersist(blocking = true)
    assert(pts.map(_.strategy).toSet == Set("dyn-comparator", "rows-format"))
    assert(pts.forall(_.avgUs > 0))
  }
}
