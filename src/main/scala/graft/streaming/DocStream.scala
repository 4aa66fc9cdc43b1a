package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of the p1 curation pipeline's INGEST stages: the same
  * per-document feature algebra (language ID, length gate, token
  * counts, content fingerprint — all stateless, codegen'd column
  * expressions shared with the batch operators in
  * [[graft.pipeline.Text]]/[[graft.pipeline.Curation]]) followed by
  * watermark-bounded exact dedup on the fingerprint.
  *
  * The split mirrors how a 100 TB pipeline deploys curation: the
  * stateless gate + in-window dedup run AT INGEST (bursty duplicates —
  * crawler refetches, retries — collapse before they ever land), while
  * the corpus-wide stages that need a global index (LSH near-dup
  * removal, batch d1 as the exact backstop) run as the periodic batch
  * p1 pass over the landed data. State here is bounded:
  * `dropDuplicatesWithinWatermark` evicts a fingerprint once the
  * watermark passes its arrival time, so the dedup map holds one
  * watermark-window of distinct keys, not the stream's history.
  */
object DocStream {

  /** docs: streaming DataFrame with (ingest_ts TIMESTAMP, doc_id BIGINT,
    * text STRING). Emits gated, in-window-deduped docs with the p1
    * manifest columns.
    */
  def curationIngest(docs: DataFrame, watermark: String = "2 hours"): DataFrame = {
    import graft.pipeline.{Curation, Portable, Text}
    val feats = docs.select(
      col("ingest_ts") +: col("doc_id") +: Text.langCountCols :+
        Portable.nWords(col("text")).as("n_words") :+
        Portable.bpeTokens(col("text")).as("bpe_tokens") :+
        Portable.normFingerprint(col("text")).as("fingerprint"): _*)
    val gated = feats
      .filter(col("n_words").between(Curation.MinWords, Curation.MaxWords))
      .withColumn("pred_lang", Text.predLangCol)
    // The watermark-bounded dedup is a streaming-only operator (batch
    // rejects it at analysis). The batch path — the backfill/oracle run
    // of the same function — dedups globally and DETERMINISTICALLY
    // (lowest doc_id per fingerprint, p1/p2's exact-dedup rule); a bare
    // dropDuplicates would keep an arbitrary row and no oracle could
    // pin its output.
    val deduped =
      if (docs.isStreaming)
        gated.withWatermark("ingest_ts", watermark)
          .dropDuplicatesWithinWatermark("fingerprint")
      else
        gated.withColumn("rn", org.apache.spark.sql.functions.row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("fingerprint").orderBy("doc_id")))
          .filter(col("rn") === 1)
    deduped.select("ingest_ts", "doc_id", "pred_lang", "n_words", "bpe_tokens", "fingerprint")
  }

  /** Streaming twin of p2's DELTA-vs-LAKE exact stages: [[curationIngest]]'s
    * gate + in-window dedup, PLUS a stream-static LEFT ANTI join against
    * the immutable lake's fingerprint column — an arriving doc whose
    * content the lake already holds is rejected at ingest, before it
    * lands. The join is stateless on the stream side (the static lake
    * plan is re-resolvable per micro-batch, so a nightly lake refresh is
    * picked up without restarting state), and only the fingerprint
    * column of the lake is read — never its text. The near-dup stage
    * (offset min-label clustering) stays in the periodic batch p2 pass:
    * it needs the global pair graph.
    *
    * `lake`: a STATIC DataFrame with a `fingerprint` column (p2's lake
    * manifest, or any projection of it).
    */
  def deltaIngest(docs: DataFrame, lake: DataFrame,
                  watermark: String = "2 hours"): DataFrame =
    curationIngest(docs, watermark)
      .join(lake.select("fingerprint"), Seq("fingerprint"), "left_anti")
      .select("ingest_ts", "doc_id", "pred_lang", "n_words", "bpe_tokens", "fingerprint")

  // ---- e27: live KMV sketch maintenance — the sketch-IVM rung beside
  //      q38 (aggregate IVM), q59 (join IVM) and s10 (ANN delta) ----

  final case class KmvAcc(mins: Array[Long])
  final case class KmvSnap(source: String, kth_h: Long)

  /** Per-source bottom-k sketch as a
    * [[org.apache.spark.sql.streaming.StatefulProcessor]]: state is the
    * k smallest distinct shingle hashes seen so far — FIXED-SIZE per
    * source however much stream passes (the mergeable-summary property
    * q65's global row proves in batch, here doing maintenance work:
    * folding a micro-batch into the sketch IS the KMV merge). Each
    * batch emits the touched source's updated k-th order statistic
    * (the live NDV estimate, e24's running-snapshot shape); sources
    * still thinner than k emit nothing, exactly q65's drop rule. In
    * batch all of a source's hashes arrive in one call over empty
    * state, so exactly one final row per source emits — q65's
    * per-source answer, which the oracle replays.
    */
  class KmvProcessor(k: Int) extends org.apache.spark.sql.streaming.StatefulProcessor[
      String, (String, Long), KmvSnap] {
    @transient private var acc: org.apache.spark.sql.streaming.ValueState[KmvAcc] = _

    override def init(
        outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      acc = getHandle.getValueState[KmvAcc](
        "kmv",
        org.apache.spark.sql.Encoders.product[KmvAcc],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(
        source: String,
        rows: Iterator[(String, Long)],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[KmvSnap] = {
      val prev: Array[Long] = if (acc.exists()) acc.get().mins else Array.emptyLongArray
      // distinct-merge keeping the k smallest — the KMV merge, folded
      // through the bounded ordered-set insert the batch aggregate uses
      // (KmvSketchAgg.boundedInsert): O(log k) per delivered row, O(k)
      // transient memory. The previous spelling concatenated and sorted
      // the ENTIRE call's input, which in the batch degeneration (e27's
      // oracle replay delivers a source's whole hash stream in one call)
      // materialized every distinct hash in one executor array
      // (ADVICE r10).
      val buf = new java.util.TreeSet[java.lang.Long]()
      var i = 0
      while (i < prev.length) { buf.add(prev(i)); i += 1 }
      rows.foreach(r => graft.functions.KmvSketchAgg.boundedInsert(buf, k, r._2))
      val merged = new Array[Long](buf.size())
      val it = buf.iterator() // TreeSet iterates ascending: merged stays sorted
      i = 0
      while (it.hasNext) { merged(i) = it.next(); i += 1 }
      acc.update(KmvAcc(merged))
      // emit only when the k-th statistic actually TIGHTENED (or the
      // sketch just filled): the output is then exactly the strictly
      // decreasing snapshot sequence KmvStreamSpec pins — a batch of
      // already-above-kth hashes re-emitting an identical row would be
      // append-mode noise for downstream consumers
      val prevKth = if (prev.length == k) prev(k - 1) else Long.MaxValue
      if (merged.length == k && merged(k - 1) < prevKth)
        Iterator.single(KmvSnap(source, merged(k - 1)))
      else Iterator.empty
    }
  }

  /** e27's shared path over `(source, h)` hash rows. TimeMode.None —
    * pure key state, no timers, so the SAME processor serves batch
    * (one call per source = q65's answer) and streaming (snapshot per
    * micro-batch). The estimate column is attached OUTSIDE the
    * processor with q65's exact round(…, 6) Spark expression, so the
    * emitted double renders engine-identically. Batch coordinator boot
    * as [[EventStream.runningTotals]].
    */
  def kmvMaintain(rows: org.apache.spark.sql.Dataset[(String, Long)],
      k: Int): DataFrame = {
    import rows.sparkSession.implicits._
    if (!rows.isStreaming) {
      org.apache.spark.sql.execution.streaming.state.StateStoreCoordinatorRef
        .forDriver(org.apache.spark.SparkEnv.get,
          rows.sparkSession.sessionState.conf)
    }
    rows
      .groupByKey(_._1)
      .transformWithState(
        new KmvProcessor(k),
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Append(),
        implicitly[org.apache.spark.sql.Encoder[KmvSnap]])
      .toDF()
      .withColumn("est_ndv",
        round(graft.queries.Advanced.kmvEstRaw(col("kth_h"), k), 6))
  }
}
