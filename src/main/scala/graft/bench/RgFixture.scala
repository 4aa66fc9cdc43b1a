package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Multi-split twin of a driver testdata directory — the bench's input
  * relayout (round 14, VERDICT r13 item 1 / "Next round" item 1).
  *
  * WHY: every driver testdata table ships as ONE parquet file with ONE
  * row group, and a row group is the unit of scan parallelism
  * (`Tables.t`'s documented caveat) — so at the bench SF every base
  * scan is a single task regardless of core count. Round 13's driver
  * scaling block measured the consequence directly: 8 cores beat 32 on
  * the suite total (68.0 vs 79.1 s) because nothing upstream of the
  * first exchange can use more than one core. That is a FIXTURE
  * property, not an operator property — a real 100 TB table arrives in
  * thousands of splits — and it was masking operator scaling from the
  * family-level measurements (the 10x scale probes, which build
  * multi-split inputs, showed the parallelism the bench could not).
  *
  * WHAT: each table is rewritten ONCE per corpus dir (disk-memoized,
  * same `Scratch.buildOnce` convention as the graft-lake and skew
  * fixtures) into ceil(bytes / 256 KiB) files, capped at 32 — so the
  * big tables (lineitem, orders, events) scan as tens of tasks while
  * the dimensions stay single-file. Rows are hash-distributed on
  * `xxhash64` of the full row — DETERMINISTIC (guide §2.5: a retried
  * write task must reproduce the same row→file assignment; round-robin
  * would also pay sortBeforeRepartition) — and the fixture is built
  * from `Tables.t`, so the rewritten content is bit-identical to what
  * every query reads today (events' ts normalization included: the
  * fixture stores the session-zoned micros the loader produces, which
  * the loader's TimestampType branch passes through unchanged).
  *
  * WHAT THIS DOES NOT CHANGE: every declared query is a deterministic
  * function of table CONTENT (the DuckDB oracle hash-verifies exactly
  * that), and content is preserved row-for-row — so no result, row
  * count, or oracle hash can move. The one layout-sensitive expression
  * in the inventory, q67b's sampled hot-key census, only decides WHICH
  * keys get salted; its result is salt-invariant by construction (the
  * oracle pins that). Verify and the oracle path never see this
  * fixture — they read the original testdata directly.
  *
  * DISCLOSURE: the bench's main query pass times the SAME queries over
  * the SAME rows in this multi-split layout (OPTIMIZATION_r14.md
  * records both layouts' totals). `SPARK_GRAFT_RG_FIX=0` restores the
  * original single-row-group input for like-for-like comparisons.
  */
object RgFixture {
  /** Target bytes per output file. 256 KiB of this corpus' parquet is
    * roughly 15 k lineitem rows — small in absolute terms, but the
    * POINT is split count at gate scale: lineitem lands at the 32-file
    * cap (one split per bench core), orders ~10, events ~8. Production
    * files are 128 MB-1 GB (guide §6); this constant is bench-fixture
    * geometry, not a production recommendation.
    */
  val TargetFileBytes: Long = 256L << 10

  /** Max files per table: the bench's own core ceiling. */
  val MaxFiles = 32

  /** Dev-only: build the fixture for a dir and print its path. */
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", graft.Scratch.dir)
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(prepare(spark, sfDir))
    spark.stop()
  }

  def prepare(spark: SparkSession, sfDir: String): String = {
    // geometry knobs (dev A/B only — the defaults above are the bench
    // contract); variant fixtures key their own path so layouts coexist
    val target = sys.env.get("SPARK_GRAFT_RG_TARGET").map(_.toLong)
      .getOrElse(TargetFileBytes)
    val maxFiles = sys.env.get("SPARK_GRAFT_RG_MAXFILES").map(_.toInt)
      .getOrElse(MaxFiles)
    val geomTag =
      if (target == TargetFileBytes && maxFiles == MaxFiles) ""
      else s"-$target-$maxFiles"
    val root = s"${graft.Scratch.dir}/rgfix/${graft.Scratch.pathKey(sfDir)}$geomTag"
    graft.Scratch.buildOnce(root) {
      graft.Tables.names.foreach { name =>
        val bytes = new java.io.File(s"$sfDir/$name.parquet").length()
        val k = math.min(maxFiles.toLong,
          math.max(1L, (bytes + target - 1) / target)).toInt
        val df = graft.Tables.t(spark, sfDir, name)
        // deterministic content-hash spread, 64x more key values than
        // files so the murmur3 bucketing stays even (guide §2.5)
        val spread = pmod(xxhash64(df.columns.map(col): _*), lit(k * 64L))
        df.repartition(k, spread)
          .write.mode("overwrite").parquet(s"$root/$name.parquet")
      }
    }
    root
  }
}
