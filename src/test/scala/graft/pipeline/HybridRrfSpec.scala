package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** s15 hybrid retrieval: reciprocal-rank fusion semantics pinned
  * independently of the oracle hash — the properties a fusion bug
  * would break first.
  */
class HybridRrfSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def result = graft.SparkEntry.queries("s15_hybrid_rrf")(spark, dir)

  test("every audit query returns a full fused top-k, ranks dense from 1") {
    val rows = result.collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == (0L until Similarity.AuditQueries.toLong).toSet)
    for ((q, rs) <- byQ) {
      assert(rs.length == Similarity.RrfTopK, s"qid $q fused list size")
      assert(rs.map(_.getAs[Int]("rn")).sorted.toSeq == (1 to Similarity.RrfTopK),
        s"qid $q ranks not dense")
    }
  }

  test("rrf_ppm is exactly the sum of the two reciprocal terms") {
    // reconstruct per-doc membership from the output flags: a doc in
    // exactly one list scores 10^6 div (C + rank) for SOME rank 1..10;
    // a doc in both scores a sum of two such terms. Verify every score
    // is representable that way, and that the flags match.
    val c = Similarity.RrfC
    val single = (1 to Similarity.RrfTopK).map(r => 1000000L / (c + r)).toSet
    val double = (for {
      a <- 1 to Similarity.RrfTopK; b <- 1 to Similarity.RrfTopK
    } yield 1000000L / (c + a) + 1000000L / (c + b)).toSet
    result.collect().foreach { r =>
      val (inLex, inVec) = (r.getAs[Boolean]("in_lex"), r.getAs[Boolean]("in_vec"))
      val score = r.getAs[Long]("rrf_ppm")
      if (inLex && inVec) assert(double.contains(score), s"bad dual score $score")
      else {
        assert(inLex || inVec, "fused doc in neither list")
        assert(single.contains(score), s"bad single score $score")
      }
    }
  }

  test("a doc in both lists outranks any single-list doc at any rank") {
    // min dual score = 2 · (10^6 div (60+10)) = 2 · 14285 = 28570;
    // max single = 10^6 div 61 = 16393 — structural, but assert it on
    // the data
    val rows = result.collect()
    val duals = rows.filter(r => r.getAs[Boolean]("in_lex") && r.getAs[Boolean]("in_vec"))
    val singles = rows.filter(r => r.getAs[Boolean]("in_lex") ^ r.getAs[Boolean]("in_vec"))
    if (duals.nonEmpty && singles.nonEmpty)
      assert(duals.map(_.getAs[Long]("rrf_ppm")).min >
        singles.map(_.getAs[Long]("rrf_ppm")).max)
  }

  test("the shared df-capped index the lexical leg reads sheds hot shingles") {
    val capped = Dedup.cappedIndex(spark, dir)
    val raw = Dedup.shingleIndex(spark, dir)
    assert(capped.count() <= raw.count())
  }
}
