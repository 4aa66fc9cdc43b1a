package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** p8 domain rank: exact-integer PageRank over the syndication graph.
  * The strongest check is differential: the domain graph is
  * |domains|-bounded, so the spec pulls it driver-side (BoundedCollect)
  * and replays the same floor-division recurrence in plain Scala — the
  * distributed fixpoint must match BIT-FOR-BIT, not approximately.
  * Plus the mass-conservation envelope truncation allows.
  */
class DomainRankSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def q(name: String) = graft.queries.Registry.all.find(_.name == name).get

  test("p8: distributed integer PageRank equals the driver-side replay exactly") {
    val got = q("p8_domain_rank").run(spark, dir)
    val rows = graft.BoundedCollect.rows(got, 1000, "p8 spec result")
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)

    // rebuild the same graph: sources co-occurring in a d6 cluster
    val docSrc = graft.Tables.t(spark, dir, "documents").select(col("doc_id"), col("source"))
    val cs = Dedup.dupComponents(spark, dir).join(docSrc, "doc_id")
      .select(col("root"), col("source")).distinct()
    val edges = graft.BoundedCollect.rows(
      cs.as("a").join(cs.as("b"), Seq("root"))
        .filter(col("a.source") =!= col("b.source"))
        .select(col("a.source").as("src"), col("b.source").as("dst")).distinct(),
      100000, "p8 spec edges").map(r => (r.getString(0), r.getString(1)))
    val nodes = graft.BoundedCollect.rows(docSrc.select("source").distinct(),
      1000, "p8 spec nodes").map(_.getString(0)).sorted
    val n = nodes.length.toLong
    val outdeg = edges.groupBy(_._1).map { case (s, es) => s -> es.length.toLong }
    val inEdges = edges.groupBy(_._2)

    var r = nodes.map(_ -> 1000000L / n).toMap
    val base = 150000L / n
    for (_ <- 1 to Curation.DomainRankIters) {
      val contrib = r.map { case (s, v) => s -> outdeg.get(s).map(v / _).getOrElse(0L) }
      r = nodes.map { u =>
        val inflow = inEdges.getOrElse(u, Array.empty[(String, String)])
          .map { case (src, _) => contrib(src) }.sum
        u -> (base + (85L * inflow) / 100L)
      }.toMap
    }
    val want = nodes.map(s => (s, r(s), outdeg.getOrElse(s, 0L)))
    assert(rows.toSeq == want.toSeq,
      "distributed fixpoint must replay exactly under identical floor-division arithmetic")
  }

  test("p8: rank mass is conserved up to floor-truncation leak") {
    val got = q("p8_domain_rank").run(spark, dir)
    val agg = got.agg(sum("rank_ppm"), count(lit(1)), min("rank_ppm")).head()
    val (tot, nSrc, mn) = (agg.getLong(0), agg.getLong(1), agg.getLong(2))
    assert(tot <= 1000000L, "floor division can only lose mass, never create it")
    // every truncation site loses < 1 unit; per iteration that is
    // bounded by (#edges + #nodes + 1) units, tiny vs 1e6
    assert(tot > 900000L, s"mass leak too large: $tot ppm")
    assert(mn >= 150000L / nSrc, "every node keeps at least the teleport share")
  }
}
