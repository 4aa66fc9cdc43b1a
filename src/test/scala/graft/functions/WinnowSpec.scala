package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class WinnowSpec extends SparkSpec {

  private def fp(s: String, k: Int = 8, w: Int = 5): Set[Long] = {
    val arr = WinnowKernel.winnow(UTF8String.fromString(s), k, w)
    arr.toLongArray().toSet
  }

  test("fingerprints are a subset of all k-gram hashes and deterministic") {
    val text = "the quick brown fox jumps over the lazy dog"
    assert(fp(text) == fp(text))
    assert(fp(text).nonEmpty)
    // every fingerprint appears among the raw k-gram hashes (k=8,w=1 ==
    // all distinct-run hashes)
    val allHashes = fp(text, 8, 1)
    assert(fp(text).subsetOf(allHashes))
  }

  test("winnowing guarantee: shared substring of w+k-1 bytes shares a fingerprint") {
    val core = "abcdefghijklmnop" // 16 chars >= w+k-1 = 12
    val a = s"XXXX $core YYYY"
    val b = s"1234567 $core 000"
    assert(fp(a).intersect(fp(b)).nonEmpty, "common substring must yield a common fingerprint")
  }

  test("disjoint documents share no fingerprints") {
    assert(fp("aaaaaaaaaaaaaaaaaaaa").intersect(fp("zzzzzzzzzzzzzzzzzzzz")).isEmpty)
  }

  test("short documents yield the single global minimum") {
    val short = "abcdefgh" // exactly one 8-gram
    assert(fp(short).size == 1)
  }

  test("expression executes inside whole-stage codegen over a parquet scan") {
    GraftFunctions.register(spark)
    // a local Seq would be ConvertToLocalRelation-folded at optimize
    // time; a parquet scan exercises the real generated pipeline
    val df = graft.Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), expr("winnow_fp(text, 8, 5)").as("f"))
    // AQE wraps stages in WholeStageCodegen only once the query runs —
    // collect THIS df (a write would spawn a separate QueryExecution),
    // then inspect the finalized adaptive plan
    val rows = df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"winnow_fp fell out of codegen:\n$plan")
    assert(rows.nonEmpty && rows.take(5).forall(_.getSeq[Long](1).nonEmpty))
  }

  test("audio_stats registration rejects a non-numeric silence literal with a typed message") {
    GraftFunctions.register(spark)
    val base = graft.Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .select(call_function("pcm_gen", col("doc_id"), lit(4), lit(64)).as("pcm"))
    // builder-time validation fires at analysis: a string literal where
    // the silence threshold belongs must fail with the typed message,
    // not an opaque ClassCastException (VERDICT r9 item 7)
    val e = intercept[Exception] {
      base.select(call_function("audio_stats", col("pcm"), lit(64), lit("loud"))).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("silence must be an integer literal")),
      s"expected the typed builder message, got: $e")
    // and a NULL silence literal is rejected too
    val e2 = intercept[Exception] {
      base.select(call_function("audio_stats", col("pcm"), lit(64),
        lit(null).cast("long"))).collect()
    }
    assert(messages(e2).exists(_.contains("silence must not be NULL")),
      s"expected the null-literal message, got: $e2")
  }

  test("t5_winnow query runs over documents with one fingerprint set per doc") {
    val out = graft.SparkEntry.queries("t5_winnow")(spark, "/root/testdata/sf0.001")
    val rows = out.collect()
    assert(rows.length > 0)
    assert(rows.forall(r => r.getInt(r.fieldIndex("n_fp")) > 0))
  }
}
