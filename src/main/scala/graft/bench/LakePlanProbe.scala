package graft.bench

/** Dev-only scale probe for the `graft-lake` DSv2 METADATA PLANE
  * (VERDICT r12 item 4): synthesizes per-version manifests at 1×, 10×
  * and 100× the real layout's file count and measures (a) manifest
  * read + runtime-filter planning wall time and (b) the post-pruning
  * read set, pinning two claims the 100 TB design makes:
  *
  *  1. **Planning stays O(|manifest|)** — one linear pass over the
  *     entry list, no directory listing, no file opens. The fitted
  *     planning exponent should sit ≈ 1.0 over two decades with a
  *     per-entry constant in the tens of nanoseconds; at 25 100
  *     entries (100×) a plan must still be sub-millisecond-scale,
  *     which is what keeps the driver out of the picture at 1000
  *     executors.
  *  2. **The pruned READ SET does not grow with the lake** — a 3-key
  *     runtime (DPP) filter keeps exactly the 3 files holding those
  *     keys at every factor (bucket pruning by `floorMod(k, 251)` plus
  *     min/max range skip), so the data-side exponent is 0.0 and the
  *     end-to-end cost of a key-driven lake read is flat in lake size.
  *
  * The synthetic manifests model the realistic Iceberg growth shape:
  * the bucket count stays SnapFidMod (251) while each bucket size-splits
  * into `f` part files with disjoint key ranges — the multi-file-per-
  * (b, fid) form the manifest format and reader legitimately support.
  * No Spark session and no data files: this probes exactly the planning
  * code paths ([[graft.sources.LakeLayout.manifest]] +
  * [[graft.sources.LakeScan]] runtime filtering + bin-packing).
  */
object LakePlanProbe {
  def main(args: Array[String]): Unit = {
    val factors = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(1, 10, 100)
    val fidMod = graft.queries.Advanced.SnapFidMod
    val width = 1000L // keys per (bucket, part) range
    println(s"factor,entries,plan_ms_min,kept_files,kept_rows_frac")
    val results = factors.map { f =>
      val root = java.nio.file.Files.createTempDirectory(s"lake-plan-x$f").toString
      val lines = for (fid <- 0 until fidMod; j <- 0 until f) yield {
        val minK = fid + fidMod.toLong * (j * width)
        val maxK = fid + fidMod.toLong * ((j + 1) * width - 1)
        s"0,$fid,data/b=0/fid=$fid/part-p0-$j.parquet,$minK,$maxK,$width,${4L << 20}"
      }
      java.nio.file.Files.writeString(
        java.nio.file.Path.of(s"$root/manifest-0.csv"),
        lines.mkString("", "\n", "\n"))
      // 3 probe keys in distinct buckets and distinct split ranges —
      // the day's-join-keys shape LakeDsv2Spec pins at 1×
      val keys = Array[Any](
        7L, // fid 7, part 0
        11L + fidMod.toLong * ((f - 1).toLong * width), // fid 11, last part
        42L + fidMod.toLong * ((f / 2).toLong * width)) // fid 42, middle part
      val in = org.apache.spark.sql.sources.In("k", keys)
      var best = Double.MaxValue
      var kept: Seq[graft.sources.LakeLayout.Entry] = Seq.empty
      var parts = 0
      for (_ <- 1 to 5) {
        val t0 = System.nanoTime()
        // the full planning path a DPP re-plan executes: manifest read,
        // runtime filter application, bin-packing into splits
        val scan = new graft.sources.LakeScanBuilder(root, 0)
          .build().asInstanceOf[graft.sources.LakeScan]
        scan.filter(Array[org.apache.spark.sql.sources.Filter](in))
        parts = scan.planInputPartitions().length
        kept = scan.plannedFiles
        val ms = (System.nanoTime() - t0) / 1e6
        if (ms < best) best = ms
      }
      val total = fidMod.toLong * f
      require(kept.size == keys.length,
        s"x$f: expected ${keys.length} surviving files, got ${kept.size}")
      require(parts > 0 && parts <= keys.length)
      println(f"$f,${total},$best%.3f,${kept.size},${kept.map(_.rows).sum.toDouble / (total * width)}%.2e")
      (f, total, best, kept.size)
    }
    def exp(a: (Int, Long, Double, Int), b: (Int, Long, Double, Int)): Double =
      math.log(b._3 / a._3) / math.log(b._2.toDouble / a._2.toDouble)
    if (results.size >= 2) {
      val (lo, hi) = (results.head, results.last)
      println(f"planning_exponent_${lo._1}to${hi._1}=${exp(lo, hi)}%.2f " +
        f"read_set: ${lo._4} -> ${hi._4} files (exponent 0.00)")
    }
  }
}
