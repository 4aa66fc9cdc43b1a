package graft.sources

import graft.{Q, Scratch, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-layout operators: the write-side techniques that let a 100 TB
  * deployment ELIDE work at read time, made visible as gate queries.
  *
  * Both entries read a session-scoped REWRITE of a driver table, built
  * once per (session, corpus) on the RAM-backed scratch volume
  * ([[graft.Scratch]]) and reused by every later invocation (Bench's
  * warm re-runs, repeated Verify calls):
  *
  *  - q33: `lineitem` and `orders` bucketed + sorted on the join key.
  *    The shuffle that a fact-fact equi-join otherwise pays EVERY query
  *    is paid ONCE at write time — at 100 TB the bucketed layout is the
  *    difference between a join that moves 100 TB per run and one that
  *    moves nothing (a cluster co-locates matching buckets; single-node
  *    Spark proves the plan shape: zero Exchange below the join).
  *  - q34: `events` partitioned by `event_type`. A selective query reads
  *    ONE directory (`PartitionFilters` prune at planning time, before
  *    any I/O) — the parquet-footer twin of a cluster's partition-pruned
  *    metastore scan.
  *
  * Like [[graft.pipeline.Materialized]], the rewrites are NOT
  * change-detecting: rewriting a corpus dir in place within one session
  * serves the stale layout. The layout lives under the JVM's
  * applicationId, so concurrent JVMs never clobber each other.
  */
object Layout {
  import Tables.t

  private val BucketCount = 8

  private def layoutRoot(s: SparkSession): String =
    s"${Scratch.dir}/layout-${s.sparkContext.applicationId}"

  /** Memoized bucketed+sorted twin of a base table, registered in the
    * session catalog as an external parquet table. The pre-write
    * `repartition(n, key)` uses the SAME hash family as the bucket spec,
    * so every bucket lands in exactly one sorted file. The join above
    * still plans a LOCAL per-bucket Sort (Spark ≥3 ignores bucket
    * sortBy metadata at read time by default — one file per bucket is a
    * write side effect, not a table contract) — what bucketing removes
    * is the Exchange, which is the part that moves 100 TB.
    */
  private def bucketed(
      s: SparkSession, dir: String, table: String, key: String): DataFrame = {
    val name = f"graft_bkt_${table}_${dir.hashCode & 0x7fffffff}%08x"
    this.synchronized {
      if (!s.catalog.tableExists(name)) {
        t(s, dir, table)
          .repartition(BucketCount, col(key))
          .write
          .bucketBy(BucketCount, key)
          .sortBy(key)
          .option("path", s"${layoutRoot(s)}/$name")
          .mode("overwrite")
          .format("parquet")
          .saveAsTable(name)
      }
    }
    s.table(name)
  }

  /** Memoized event_type-partitioned twin of `events` (ts pre-truncated
    * to microseconds by the loader, so the copy round-trips exactly).
    */
  private def partitionedEvents(s: SparkSession, dir: String): DataFrame = {
    val path = f"${layoutRoot(s)}/graft_part_events_${dir.hashCode & 0x7fffffff}%08x"
    this.synchronized {
      if (!new java.io.File(path, "_SUCCESS").isFile) {
        t(s, dir, "events").write
          .partitionBy("event_type")
          .mode("overwrite")
          .parquet(path)
      }
    }
    s.read.parquet(path)
  }

  def all: Seq[Q] = Seq(
    // ---- q33: fact-fact join over co-bucketed tables — zero Exchange
    //      below the join (PlanSpec-asserted). The `merge` hint keeps the
    //      planner honest at gate SFs where orders would otherwise
    //      broadcast (fine at 0.1 GB, impossible at 100 TB — the bucketed
    //      layout is precisely the plan that does not degrade). ----
    Q(
      "q33_bucketed_join",
      (s, dir) => {
        val li = bucketed(s, dir, "lineitem", "l_orderkey")
        val ord = bucketed(s, dir, "orders", "o_orderkey")
        li.join(ord.hint("merge"), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(
            count(lit(1)).as("n_items"),
            graft.Agg.dsum(col("l_extendedprice")).as("sum_price"))
      },
      Some("""
        SELECT o_orderpriority, count(*) AS n_items,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_price
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1"""),
    ),

    // ---- q34: partition-pruned scan — the event_type predicate prunes
    //      directories at planning time (PartitionFilters, not
    //      PushedFilters), so the purchase slice is the ONLY data read.
    //      Daily revenue roll-up over the surviving partition. ----
    Q(
      "q34_partition_prune",
      (s, dir) =>
        partitionedEvents(s, dir)
          .filter(col("event_type") === "purchase")
          .groupBy(unix_micros(date_trunc("DAY", col("ts"))).as("day_us"))
          .agg(
            count(lit(1)).as("n"),
            graft.Agg.dsum(col("value")).as("sum_value")),
      Some("""
        SELECT epoch_us(date_trunc('day', ts)) AS day_us, count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS sum_value
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1"""),
    ),
  )
}
