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
}
