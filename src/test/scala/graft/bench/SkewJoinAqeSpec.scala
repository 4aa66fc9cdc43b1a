package graft.bench

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Executable proof that Spark's AQE skew-join split actually engages on
  * the skew fixture's hot key (VERDICT r6 item 5): SkewBench gives 20%
  * of lineitem ONE hot l_orderkey, and the q5/q33-shaped fact join must
  * see its hot partition split at runtime — the 100×-skew story in
  * SCALING.md stays a measured claim, not prose.
  *
  * Thresholds: AQE marks a partition skewed when its bytes exceed BOTH
  * `skewedPartitionFactor` × median AND `skewedPartitionThresholdInBytes`
  * (production defaults 5× / 256 MB — sized for executors, not a gate
  * fixture). The spec scales the BYTE floors down but keeps the 5×
  * FACTOR — the actual skew detector — at its default. Two measured
  * subtleties make the fixture exercise the real regime: (a) at few
  * shuffle partitions the uniform background inside the hot key's
  * partition dilutes it below 5× median (measured 2.1× at 32
  * partitions), so the spec uses 256 — the production-shaped setting
  * where one hot key dominates its partition; (b) a key-only shuffle
  * run-length-compresses the hot key's identical values to almost
  * nothing (measured: 120k hot rows ≈ 26 KB), so the join carries a
  * real payload column (l_extendedprice), after which the hot
  * partition measures ~50× median; and (c) the split unit is a MAP
  * OUTPUT range, so the skewed input must arrive from >1 map task —
  * the single-row-group testdata scan needs a reshard first (a real
  * fact table always has many mappers).
  */
class SkewJoinAqeSpec extends SparkSpec {

  test("AQE splits the skew fixture's hot join partition (skew=true in the final plan)") {
    val fixture = SkewBench.prepare(spark, "/root/testdata/sf0.1")
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.shuffle.partitions",
    ).map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // scaled-down BYTE floors (fixture partitions are MBs, not GBs);
      // the 5x-median FACTOR — the actual skew detector — stays default
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4KB")
      // force the sort-merge path: at fixture scale orders would
      // broadcast and there would be no shuffle to skew-split
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.shuffle.partitions", "256")

      // every driver testdata table is ONE parquet row group = ONE map
      // task (Tables.t scaladoc), and AQE splits a skewed reduce
      // partition along MAP-OUTPUT ranges — with a single mapper there
      // is nothing to split along and the rule backs off (measured: the
      // 50x-median partition stayed unsplit until the input had
      // multiple map tasks). A 100 TB fact table always has thousands
      // of mappers; the pre-shuffle reshard restores that shape here.
      val li = spark.read.parquet(s"$fixture/lineitem.parquet").repartition(16)
      val ord = spark.read.parquet(s"$fixture/orders.parquet")
      val joined = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sum(col("l_extendedprice")).as("rev"))
      // AQE finalizes the plan during execution; run the action through
      // THIS dataframe's own QueryExecution (count() would wrap a new one)
      val rows = joined.collect()
      assert(rows.nonEmpty)
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("isFinalPlan=true"), s"expected a finalized adaptive plan:\n${p.take(2000)}")
      assert("skew=true|skewed".r.findFirstIn(p).isDefined,
        s"expected AQE to mark the hot-key join skew-handled:\n${p.take(4000)}")
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }
}
