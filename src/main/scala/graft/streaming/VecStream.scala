package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming side of the s-series index maintenance (s10): CONTINUOUS
  * vector ingestion. Each arriving micro-batch of embeddings runs the
  * frozen-artifact assignment
  * ([[graft.pipeline.Similarity.annAssignFrozenBatch]]) and its
  * `(vec_id, cid, code)` serving rows are appended to the layout — the
  * live twin of s10's one-shot delta append.
  *
  * Contract (what VecStreamSpec pins): per-vector assignment is a pure
  * function of (vector, frozen centroids/codebooks), so the union over
  * ANY micro-batching of the delta equals the batch assignment
  * bit-for-bit — batch-size invariance. It follows that at-least-once
  * redelivery is idempotent at the layout level: a redelivered vector
  * re-emits an identical row, and the append sink upserts by vec_id
  * (or dedups on write) rather than counting emissions.
  *
  * Scale shape: no state store at all — the assignment is stateless
  * per vector (the frozen K-row/128-row artifacts ride along as
  * broadcasts), so the stream scales with arrival rate alone; no
  * watermark, no timeout, nothing corpus-sized in flight. Geometry
  * NEVER re-derives from arrivals (s10's contract) — drift handling
  * stays with the s11 monitor → s12 retrain loop, not the ingest path.
  */
object VecStream {

  /** An arriving embedding: id + vector (matches the engine's internal
    * `(vec_id, v: array<double>)` shape).
    */
  case class Vec(vec_id: Long, v: Seq[Double])

  /** Start the continuous index append: each micro-batch's serving rows
    * are handed to `append` (a real deployment writes them into the
    * s8-style cid-partitioned layout; the spec collects them). The
    * frozen artifacts are resolved against `dir` — the corpus the index
    * was trained on.
    */
  def indexAppend(s: SparkSession, dir: String, arrivals: Dataset[Vec])(
      append: DataFrame => Unit): StreamingQuery =
    arrivals.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Vec], _: Long) =>
        append(graft.pipeline.Similarity.annAssignFrozenBatch(s, dir, batch.toDF()))
      }
      .start()
}
