package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Persist-with-replacement for derived tables that several branches of
  * one query read (an index self-join, a signature bucket join): the
  * derived table must be persisted AND eagerly built — a lazy persist
  * lets the join branches race to fill the cache, each recomputing the
  * upstream (measured 3× slower) — but per-invocation persists that are
  * never released leak a cache entry per call (Bench runs every heavy
  * query twice). Keying by (session, name) caps the leak at ONE live
  * copy per table: each rebuild unpersists the copy it supersedes, and
  * a fresh session never receives a DataFrame bound to a previous
  * (possibly stopped) session's context.
  *
  * NOT change-detecting: the sameResult reuse check treats a re-read of
  * the same parquet path as identical, so REWRITING a corpus dir
  * in place within one session silently serves the stale cached table
  * (the same hazard as `Similarity.maxBlockCache` and
  * `Dedup.shingleIndex`). Fixture-writing callers must call
  * [[releaseMatching]] (and `Dedup.releaseIndex`) after the write —
  * Bench's skew teardown and the fixture specs do.
  */
private[graft] object Materialized {
  private val live =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  def apply(key: String, df: DataFrame): DataFrame = {
    // Sweep dead sessions on every touch: entries of a stopped session
    // hold its full analyzed plans (and the session itself) forever —
    // a JVM cycling sessions (test suites, repeated embedders) would
    // otherwise grow `live` by #sessions × #tables. Their cache died
    // with the session, so removal (no unpersist) is enough.
    live.keys.filter(_._1.sparkContext.isStopped).foreach(live.remove)
    val k = (df.sparkSession, key)
    live.get(k) match {
      // Re-invocation with the SAME plan (bench min-of-two, repeated
      // Verify calls): reuse the live copy. Re-persisting would no-op
      // (Spark caches by logical plan) and then unpersisting the "old"
      // handle would evict that shared entry, leaving the new handle
      // UNCACHED — the leak fix would have un-materialized the table.
      case Some(prev)
          if prev.queryExecution.analyzed.sameResult(df.queryExecution.analyzed) =>
        prev
      case prev =>
        val p = df.persist(StorageLevel.MEMORY_AND_DISK)
        p.count() // eager: one fill, then pure cache reads
        live.put(k, p)
        prev.foreach(_.unpersist(false))
        p
    }
  }

  /** Key-trusting variant for derived tables whose CONSTRUCTION runs
    * driver-side jobs (the connected-components fixpoint loop): `apply`
    * must be handed a finished plan, so a memoized caller would re-pay
    * the loop just to produce the plan the sameResult check compares.
    * Here `build` runs only on a key miss; a hit returns the live copy
    * without evaluating `build` at all. The key must embed everything
    * the plan depends on (corpus dir at minimum) — same staleness
    * contract as `apply`, released the same way.
    */
  def getOrBuild(s: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    live.keys.filter(_._1.sparkContext.isStopped).foreach(live.remove)
    live.getOrElse((s, key), apply(key, build))
  }

  /** Unpersist and forget every live table whose string key matches —
    * e.g. all tables derived from a throwaway fixture directory.
    */
  def releaseMatching(p: String => Boolean): Unit =
    live.keys.filter { case (_, key) => p(key) }.foreach { k =>
      live.remove(k).foreach(_.unpersist(false))
    }
}
