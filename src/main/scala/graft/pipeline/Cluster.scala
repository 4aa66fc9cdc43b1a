package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.storage.StorageLevel

/** Connected components over an undirected pair table, by distributed
  * min-label propagation: every node starts labelled with its own id,
  * and each round replaces a node's label with the minimum label in its
  * closed neighborhood, until a fixpoint. The result assigns every node
  * the MINIMUM doc_id reachable from it — the canonical representative
  * of its duplicate cluster.
  *
  * This is the union-find step of a production dedup pipeline: verified
  * near-dup PAIRS (d5) say "these two are interchangeable", but removal
  * must act on CLUSTERS — keep exactly one member per transitive group —
  * or chains (1~2, 2~3 with no verified (1,3)) either drop content whose
  * keeper was itself dropped, or keep both ends of a chain.
  *
  * Scale shape: the input is the verified near-dup pair set, which is
  * |true near-dups|-sized — orders of magnitude below the corpus — and
  * every round is one equi-join plus one min-aggregate on it (both
  * map-side combinable). Rounds needed = the maximum cluster DIAMETER,
  * not the corpus size; near-dup clusters are template families with
  * single-digit diameters in practice, and the [[MaxRounds]] guard turns
  * a pathological corpus (one long chain) into a loud error rather than
  * silent wrong output. (The O(log n)-round large-star/small-star
  * variant exists for that regime; at the pair volumes dedup produces,
  * per-round latency dominates and plain propagation wins.)
  *
  * Each round's frontier is `localCheckpoint`ed — NOT persist+unpersist.
  * An iterative loop must both truncate lineage (each round references
  * the previous twice, so unmaterialized lineage doubles per round) and
  * release superseded rounds; but `unpersist` on a frame that a LATER
  * cached plan references makes the CacheManager re-plan that dependent
  * entry and DROP its materialized data — so the persist+unpersist
  * spelling silently turned every post-loop scan into a full fixpoint
  * replay (measured: 9 s per scan of a 45-row result; the loop itself
  * went quadratic-in-rounds for the same reason). `localCheckpoint`
  * truncates the plan to the materialized RDD blocks, so releasing round
  * N-1 after round N is built cannot invalidate anything, and the loop
  * holds at most two rounds of state. The trade documented honestly:
  * local checkpoints are not fault-tolerant (a lost executor kills the
  * job instead of recomputing) — a 1000-executor deployment sets a
  * reliable `spark.checkpoint.dir` and swaps `checkpoint` in; the loop
  * shape is identical.
  */
private[graft] object Cluster {

  /** Propagation-round ceiling: a duplicate cluster with diameter beyond
    * this is not a template family but a degenerate corpus (one chain of
    * thousands of pairwise-verified docs); failing loudly beats shipping
    * a half-converged clustering as if it were exact.
    */
  val MaxRounds = 64

  /** `(doc_id, root)` for every node of `pairs` — `pairs` must carry two
    * long columns `doc1`/`doc2`; `root` is the min doc_id reachable.
    */
  def minLabelComponents(pairs: DataFrame): DataFrame = {
    val edges = pairs
      .select(col("doc1").as("src"), col("doc2").as("dst"))
      .union(pairs.select(col("doc2").as("src"), col("doc1").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Convergence check: labels are per-element monotone non-increasing,
    // so sum(root) is unchanged iff NO label moved — one map-side
    // aggregate over the frontier (which also materializes its
    // checkpoint), replacing the old per-round join+filter+count job.
    // DECIMAL(38,0): exact at any node count / id range a corpus can hold.
    def rootSum(df: DataFrame): Option[java.math.BigDecimal] =
      Option(graft.BoundedCollect.rows(
        df.agg(sum(col("root").cast(DecimalType(38, 0)))),
        1, "cc fixpoint checksum")(0).getDecimal(0))
    var labels = edges
      .select(col("src").as("doc_id"))
      .distinct()
      .withColumn("root", col("doc_id"))
      .localCheckpoint(true)
    var prevSum = rootSum(labels)
    var converged = false
    var rounds = 0
    while (!converged) {
      rounds += 1
      if (rounds > MaxRounds)
        sys.error(s"connected components did not converge in $MaxRounds rounds")
      val viaNeighbor = edges
        .join(labels, edges("dst") === labels("doc_id"))
        .select(edges("src").as("doc_id"), col("root"))
      val next = labels
        .select("doc_id", "root")
        .unionByName(viaNeighbor)
        .groupBy("doc_id")
        .agg(min("root").as("root"))
        .localCheckpoint(true)
      val s = rootSum(next)
      converged = s == prevSum
      prevSum = s
      releaseCheckpoint(labels) // safe: `next` holds its own blocks
      labels = next
    }
    edges.unpersist(false)
    labels
  }

  /** Free a `localCheckpoint`ed frame's RDD blocks. Checkpoints don't
    * register with the CacheManager, so `Dataset.unpersist` can't reach
    * them — release the underlying RDD directly.
    */
  private def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed
      .collectFirst { case l: LogicalRDD => l.rdd }
      .foreach(_.unpersist(false))

  /** DuckDB twin: transitive closure by recursive CTE. `pairsCte` must
    * name a CTE with `doc1`/`doc2` columns; emits CTE bodies
    * `<prefix>_edges` and `<prefix>_roots(doc_id, root)`. The enclosing
    * WITH must be declared RECURSIVE. The prefix exists so one query can
    * instantiate components over several pair sets (p2 clusters the base
    * lake and the mixed lake∪delta graph in the same oracle).
    */
  def componentsCtes(pairsCte: String, prefix: String = "cc"): String =
    s"""${prefix}_edges AS (
          SELECT doc1 AS src, doc2 AS dst FROM $pairsCte
          UNION ALL
          SELECT doc2, doc1 FROM $pairsCte),
        ${prefix}_reach(doc_id, r) AS (
          SELECT src, src FROM ${prefix}_edges
          UNION
          SELECT ${prefix}_reach.doc_id, e.dst
          FROM ${prefix}_reach JOIN ${prefix}_edges e ON ${prefix}_reach.r = e.src),
        ${prefix}_roots AS (
          SELECT doc_id, min(r) AS root FROM ${prefix}_reach GROUP BY 1)"""
}
