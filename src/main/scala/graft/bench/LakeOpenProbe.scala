package graft.bench

/** Dev-only microbenchmark: per-file open cost of the lake's vectorized
  * parquet read, comparing (a) the String-path convenience initialize
  * (fresh Configuration per file) against (b) the FileSplit initialize
  * with a SHARED Configuration/TaskAttemptContext — the candidate fix
  * for q43's small-file open overhead (251 tiny files per version at
  * bench SF serialize in one bin-packed split, so per-file milliseconds
  * multiply straight into the cell).
  */
object LakeOpenProbe {
  def main(args: Array[String]): Unit = {
    val root = args(0)
    val n = if (args.length > 1) args(1).toInt else 200
    val entry = graft.sources.LakeLayout.manifest(root, 0).head
    val path = s"$root/${entry.path}"
    val cols = java.util.Arrays.asList("k", "o_orderstatus", "price")

    def time(label: String)(body: => Unit): Unit = {
      for (w <- 1 to 2) {
        val t0 = System.nanoTime()
        body
        val ms = (System.nanoTime() - t0) / 1e6
        if (w == 2) println(f"$label: ${ms / n}%.3f ms/file ($n files, ${ms}%.0f ms)")
      }
    }

    time("string-init (fresh conf per file)") {
      var i = 0
      while (i < n) {
        val r = new org.apache.spark.sql.execution.datasources.parquet.VectorizedParquetRecordReader(false, 4096)
        r.initialize(path, cols)
        r.resultBatch()
        var rows = 0L
        while (r.nextBatch()) rows += r.resultBatch().numRows()
        r.close()
        i += 1
      }
    }

    val conf = new org.apache.hadoop.conf.Configuration()
    conf.set("spark.sql.parquet.binaryAsString", "false")
    conf.set("spark.sql.parquet.int96AsTimestamp", "false")
    conf.set(org.apache.parquet.hadoop.ParquetInputFormat.READ_SUPPORT_CLASS,
      classOf[org.apache.spark.sql.execution.datasources.parquet.ParquetReadSupport].getName)
    conf.set("spark.sql.caseSensitive", "false")
    conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    conf.set(
      org.apache.spark.sql.execution.datasources.parquet.ParquetReadSupport.SPARK_ROW_REQUESTED_SCHEMA,
      graft.sources.LakeLayout.Schema.json)
    val attempt = new org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl(
      conf, new org.apache.hadoop.mapreduce.TaskAttemptID())
    val len = new java.io.File(path).length()

    time("split-init (shared conf/context)") {
      var i = 0
      while (i < n) {
        val r = new org.apache.spark.sql.execution.datasources.parquet.VectorizedParquetRecordReader(false, 4096)
        r.initialize(
          new org.apache.hadoop.mapred.FileSplit(
            new org.apache.hadoop.fs.Path(path), 0, len, Array.empty[String]),
          attempt)
        r.resultBatch()
        var rows = 0L
        while (r.nextBatch()) rows += r.resultBatch().numRows()
        r.close()
        i += 1
      }
    }

    conf.set("fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
    val attemptRaw = new org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl(
      conf, new org.apache.hadoop.mapreduce.TaskAttemptID())
    time("split-init + RawLocalFileSystem") {
      var i = 0
      while (i < n) {
        val r = new org.apache.spark.sql.execution.datasources.parquet.VectorizedParquetRecordReader(false, 4096)
        r.initialize(
          new org.apache.hadoop.mapred.FileSplit(
            new org.apache.hadoop.fs.Path(path), 0, len, Array.empty[String]),
          attemptRaw)
        r.resultBatch()
        var rows = 0L
        while (r.nextBatch()) rows += r.resultBatch().numRows()
        r.close()
        i += 1
      }
    }

    time("split-init raw, capacity 512") {
      var i = 0
      while (i < n) {
        val r = new org.apache.spark.sql.execution.datasources.parquet.VectorizedParquetRecordReader(false, 512)
        r.initialize(
          new org.apache.hadoop.mapred.FileSplit(
            new org.apache.hadoop.fs.Path(path), 0, len, Array.empty[String]),
          attemptRaw)
        r.resultBatch()
        var rows = 0L
        while (r.nextBatch()) rows += r.resultBatch().numRows()
        r.close()
        i += 1
      }
    }
  }
}
