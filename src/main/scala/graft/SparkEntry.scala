package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Full query inventory, assembled from the module registries. */
  def inventory: Seq[Q] = graft.queries.Registry.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * p1 is the library's thesis in one query: text features, quality
    * gating, exact dedup and LSH-verified near-dup removal composed into
    * a single declarative plan.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("p1_curation")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    inventory.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    inventory.flatMap(q => q.oracle.map(o => q.name -> o.trim)).toMap
}
