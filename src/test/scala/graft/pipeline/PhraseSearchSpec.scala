package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** t15 phrase search: the index-probe path must equal an independent
  * shuffle-free scan twin (per-row position filtering in pure column
  * algebra — the spelling a grep would use), the postings table must be
  * 0-based positional, and the join must stay an equi-join.
  */
class PhraseSearchSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  /** Direct per-row twin: positions i (0-based) where ws[i]=w1 ∧
    * ws[i+1]=w2, computed without explode/join/shuffle.
    */
  private def direct(w1: String, w2: String) =
    graft.Tables.t(spark, dir, "documents")
      .select(col("doc_id"), Portable.words(col("text")).as("ws"))
      .withColumn("hits", expr(
        s"filter(sequence(0, size(ws) - 2), i -> ws[i] = '$w1' AND ws[i + 1] = '$w2')"))
      .filter(size(col("hits")) > 0)
      .select(col("doc_id"), size(col("hits")).cast("long").as("n_hits"),
        element_at(col("hits"), 1).cast("long").as("first_pos"))

  test("index-probe result equals the shuffle-free scan twin") {
    val got = graft.SparkEntry.queries("t15_phrase_search")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val want = direct(Text.PhraseW1, Text.PhraseW2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == want && got.nonEmpty,
      s"index probe must equal the direct scan (${got.size} vs ${want.size})")
  }

  test("postings are 0-based positions in document order") {
    val post = Text.postingsIndex(spark, dir)
    val one = post.filter(col("doc_id") === post.agg(min("doc_id")).collect()(0).getLong(0))
      .orderBy(col("pos")).collect()
    assert(one.head.getInt(1) == 0, "positions must start at 0")
    assert(one.map(_.getInt(1)).toSeq == (0 until one.length),
      "positions must be dense document order")
    val words = graft.Tables.t(spark, dir, "documents")
      .filter(col("doc_id") === one.head.getLong(0))
      .select(Portable.words(col("text"))).collect()(0).getSeq[String](0)
    assert(one.map(_.getString(2)).toSeq == words,
      "postings terms must replay the document's word sequence")
  }

  test("the phrase join is an equi-join over pruned term lists") {
    val p = graft.SparkEntry.queries("t15_phrase_search")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"phrase adjacency must join on (doc_id, pos):\n$p")
  }

  test("the pos+1 chain generalizes to 3-term phrases") {
    // 'sort merge join' via two chained adjacency joins vs the direct twin
    val post = Text.postingsIndex(spark, dir)
    def list(w: String) = post.filter(col("term") === w)
    val got = list("sort").select(col("doc_id"), col("pos"))
      .join(list("merge").select(col("doc_id"), (col("pos") - 1).as("pos")),
        Seq("doc_id", "pos"))
      .join(list("join").select(col("doc_id"), (col("pos") - 2).as("pos")),
        Seq("doc_id", "pos"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = graft.Tables.t(spark, dir, "documents")
      .select(col("doc_id"), Portable.words(col("text")).as("ws"))
      .withColumn("hits", expr(
        "filter(sequence(0, size(ws) - 3), i -> ws[i] = 'sort' AND ws[i + 1] = 'merge' AND ws[i + 2] = 'join')"))
      .filter(size(col("hits")) > 0)
      .select(col("doc_id"), size(col("hits")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want, s"3-term chain must equal the direct scan (${got.size} vs ${want.size})")
  }
}
