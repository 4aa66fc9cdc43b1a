package graft.bench

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only probe (VERDICT r10 item 6): the q67 join measured
  * uniform/skew × {plain, AQE skew-join, full salt (q67), hot-key salt
  * (q67b)} — the comparison a 100-TB operator owner actually needs,
  * documenting when the manual salt beats Spark's built-in skew-join
  * split and what the census-gated variant saves on uniform data.
  *
  * All four variants run in child sessions with
  * `autoBroadcastJoinThreshold = -1`: at the bench SF the orders side
  * fits a broadcast, which would erase the shuffle the whole comparison
  * is about (at 100 TB neither side of an orders⋈lineitem join
  * broadcasts). The AQE variant additionally lowers the skew-split
  * thresholds to engage OptimizeSkewedJoin at bench-scale partition
  * sizes — the same "emulate cluster-scale gates" convention as
  * q60Session. The salted variants keep their explicit broadcast()
  * hints (census + salt table): those ARE the operators.
  *
  * Output: one JSON line per (fixture, variant), min of `iters`
  * adjacent runs, plus a markdown table on stderr for BENCH_NOTES.
  */
object SkewMatrix {

  private def plainJoin(s: SparkSession, dir: String): DataFrame = {
    val li = graft.Tables.t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_extendedprice"))
    val ord = graft.Tables.t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        graft.Agg.dsum(col("l_extendedprice")).as("sum_price"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val iters = args.headOption.map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", graft.Scratch.dir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val noBcast = spark.newSession()
    noBcast.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val aqe = spark.newSession()
    aqe.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    aqe.conf.set("spark.sql.adaptive.enabled", "true")
    aqe.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    // engage the splitter at bench-scale sizes: a partition is "skewed"
    // past 2x the median AND 512 KB (defaults: 5x / 256 MB — cluster
    // sizes; the fixture's hot partition is ~2 MB at sf0.1, so the
    // cluster defaults never fire here), split target 256 KB
    aqe.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    aqe.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "512k")
    aqe.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "256k")

    val variants: Seq[(String, String => DataFrame)] = Seq(
      "plain" -> (d => plainJoin(noBcast, d)),
      "aqe_skewjoin" -> (d => plainJoin(aqe, d)),
      "salted_full" -> (d => graft.SparkEntry.queries("q67_salted_join")(noBcast, d)),
      "salted_hotkey" -> (d => graft.SparkEntry.queries("q67b_hotkey_salted_join")(noBcast, d)),
    )

    val skewDir = SkewBench.prepare(spark, sfDir)
    val fixtures = Seq("uniform" -> sfDir, "skew" -> skewDir)

    // JIT warm pass per variant at the smallest SF
    variants.foreach { case (_, f) =>
      try f("/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[skewmatrix] warm: ${e.getMessage}") }
    }

    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // single-core noise cal (the Bench kernel): stamps the host window
    // so two matrix runs are comparable
    def noiseCal(): Double = {
      def once(): Double = {
        var x = 0x9E3779B97F4A7C15L; var s = 0L; var i = 0
        val t0 = System.nanoTime()
        while (i < 100000000) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; s += x; i += 1 }
        if (s == 42) System.err.println("")
        (System.nanoTime() - t0) / 1e6
      }
      Seq.fill(3)(once()).min
    }
    println(s"""{"noise_cal_ms":${num(noiseCal())}}""")
    val results = scala.collection.mutable.LinkedHashMap.empty[(String, String), Double]
    fixtures.foreach { case (fn, dir) =>
      variants.foreach { case (vn, f) =>
        def once(): Double = {
          System.gc()
          val t0 = System.nanoTime()
          try { f(dir).write.format("noop").mode("overwrite").save(); (System.nanoTime() - t0) / 1e9 }
          catch { case e: Throwable =>
            System.err.println(s"[skewmatrix] $fn/$vn failed: ${e.getMessage}"); -1.0 }
        }
        val ts = Seq.fill(iters)(once()).filter(_ >= 0)
        results((fn, vn)) = if (ts.isEmpty) -1.0 else ts.min
        println(s"""{"fixture":"$fn","variant":"$vn","sec":${num(results((fn, vn)))}}""")
      }
    }
    // markdown table for BENCH_NOTES
    System.err.println("| fixture | " + variants.map(_._1).mkString(" | ") + " |")
    System.err.println("|---|" + variants.map(_ => "---|").mkString)
    fixtures.foreach { case (fn, _) =>
      System.err.println(s"| $fn | " +
        variants.map { case (vn, _) => num(results((fn, vn))) + " s" }.mkString(" | ") + " |")
    }
    spark.stop()
  }
}
