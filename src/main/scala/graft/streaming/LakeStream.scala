package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Streaming side of the CDC lake family (q41/q43/q44): continuous
  * change-log compaction. A stream of full-row-image change records
  * (upserts and tombstones, batch-stamped) is compacted to each key's
  * LATEST action — the state a merge-on-read reader resolves per query
  * (q43's max_by argmax), maintained incrementally instead.
  *
  * Scale shape: one shuffle on the key; state per key is ONE row (the
  * latest action), so total state is bounded by the touched-key set —
  * days of changes, never the lake. The lake itself is untouched by the
  * stream: merging compacted state with the frozen base remains the
  * reader's broadcast anti-join (q43/q44's batch spelling).
  */
object LakeStream {

  /** A change record: batch stamp, key, row image, action ('U' | 'D'). */
  case class Chg(b: Int, k: Long, o_orderstatus: String, price: Double, act: String)

  /** A key's compacted state: its latest action so far. */
  case class KeyAct(k: Long, b: Int, o_orderstatus: String, price: Double, act: String)

  /** Latest-action-per-key compaction (Kafka compacted-topic semantics).
    * Streaming: mapGroupsWithState (Update mode) emits a key's resolved
    * row on EVERY arrival for that key — a newer action emits the new
    * image; a stale or redelivered record re-emits the unchanged held
    * row (duplicate emissions, never displaced state), so downstream
    * consumers must upsert by key, not count emissions. State never
    * times out because a key's latest action stays meaningful forever
    * (a real deployment snapshots + truncates on checkpoint
    * compaction). Batch (the twin gate): state starts empty and each
    * key sees its full log, so the emission is exactly q43's max_by
    * argmax. Ties on the batch stamp keep the FIRST maximum — the
    * already-held state — so at-least-once redelivery of a batch is
    * idempotent on the resolved state.
    *
    * Input precondition (the CDC feed contract, same as q43's log):
    * at most ONE action per (batch stamp, key), and a redelivered
    * record is bit-identical to the original. Under that contract
    * resolution is deterministic for any arrival order, including
    * same-trigger duplicates (identical images tie-break to an
    * identical result). Two DIFFERENT images under one (b, k) violate
    * the feed contract and resolve by arrival order — garbage in,
    * arbitrary-but-single garbage out.
    */
  def cdcCompact(changes: Dataset[Chg]): Dataset[KeyAct] = {
    import changes.sparkSession.implicits._
    changes.groupByKey(_.k)
      .mapGroupsWithState[KeyAct, KeyAct](GroupStateTimeout.NoTimeout) {
        (k, it, state) =>
          // first-maximum kept EXPLICITLY (strict >): the held state is
          // the leftmost element, so a redelivered equal-stamp record
          // can never displace it — previously this rode on maxBy's
          // unspecified tie order (review r9)
          val latest = (state.getOption.iterator ++
            it.map(c => KeyAct(k, c.b, c.o_orderstatus, c.price, c.act)))
            .reduceLeft((a, c) => if (c.b > a.b) c else a)
          // skip the state-store put when nothing changed — the
          // at-least-once redelivery path this module absorbs would
          // otherwise pay a checkpoint write per stale record
          if (!state.getOption.contains(latest)) state.update(latest)
          latest
      }
  }

  /** An SCD2 ledger row: one key VERSION with its [valid_from,
    * valid_to) batch interval (open interval = current). The streamed
    * twin of q61's one-pass window build.
    */
  case class Ver(k: Long, valid_from: Int, valid_to: Option[Int],
      o_orderstatus: String, price: Double, is_current: Boolean)

  /** A key's open (current) version — the SCD2 maintainer's state. */
  case class OpenVer(b: Int, o_orderstatus: String, price: Double)

  /** Incremental SCD2 history maintenance (e20, q61's streaming twin):
    * per key, each arriving action CLOSES the open version (emitting
    * its final closed row) and an upsert OPENS a new one; the open
    * version is (re-)emitted flagged current on every batch that
    * touches its key — update-mode semantics, so downstream consumers
    * upsert by (k, valid_from), exactly like [[cdcCompact]]'s
    * consumers upsert by key. State per key is ONE row (the open
    * version): total state is bounded by the live-key set, never the
    * history. Batch (the twin gate): each key sees its full change
    * sequence at once, so the fold emits precisely q61's ledger —
    * closed intervals plus the flagged-current open one (StreamScd2Spec
    * pins equality, and pins the live prefix against a MemoryStream).
    * Feed contract — STRICTER than [[cdcCompact]]'s: one action per
    * (b, k), and batch stamps must be non-decreasing ACROSS
    * micro-batches (the CDC log replays in batch order). cdcCompact's
    * latest-wins argmax absorbs cross-batch disorder; an interval
    * ledger cannot — a stamp below the open version's would demand a
    * history rewrite, which is a reprocessing event, not a state
    * update. Within one micro-batch, order is absorbed by the bounded
    * per-key sort on the stamp.
    */
  def scd2Maintain(changes: Dataset[Chg]): Dataset[Ver] = {
    import changes.sparkSession.implicits._
    changes.groupByKey(_.k)
      .flatMapGroupsWithState[OpenVer, Ver](
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout) {
        (k, it, state) =>
          val evs = it.toArray.sortBy(_.b)
          val out = scala.collection.mutable.ArrayBuffer[Ver]()
          var open = state.getOption
          for (e <- evs) {
            // a regressed stamp is a feed violation the ledger cannot
            // absorb (history rewrite = reprocessing event): fail the
            // stream rather than checkpoint an inverted interval
            require(open.forall(_.b <= e.b),
              s"scd2Maintain: key $k batch ${e.b} arrived after open version " +
                s"${open.map(_.b)} — out-of-order feed, reprocess required")
            if (open.exists(_.b == e.b)) {
              // bit-identical redelivery of the open version (the one
              // equal-stamp case the (b, k)-uniqueness contract allows):
              // idempotent re-apply — do NOT close-and-reopen, which
              // would emit a zero-length [b, b) interval that supersedes
              // the genuine current row downstream
            } else {
              open.foreach(o => out +=
                Ver(k, o.b, Some(e.b), o.o_orderstatus, o.price, is_current = false))
              open = e.act match {
                case "U" => Some(OpenVer(e.b, e.o_orderstatus, e.price))
                case "D" => None
                case other => throw new IllegalArgumentException(
                  s"scd2Maintain: key $k batch ${e.b}: unknown action '$other' " +
                    "(feed contract is 'U' | 'D')")
              }
            }
          }
          open match {
            case Some(o) =>
              state.update(o)
              out += Ver(k, o.b, None, o.o_orderstatus, o.price, is_current = true)
            case None => state.remove()
          }
          out.iterator
      }
  }
}
