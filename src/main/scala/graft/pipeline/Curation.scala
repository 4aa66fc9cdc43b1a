package graft.pipeline

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** p1: the end-to-end training-data curation pipeline — the composition
  * every other operator family exists to serve, expressed as ONE
  * declarative query so Catalyst plans the whole flow:
  *
  *   per-doc features (t1 lang-ID, t2 length gate, t3 token counts,
  *   t4/d1 fingerprint)
  *     → quality gate (length window)
  *     → exact dedup (keep the lowest doc_id per fingerprint)
  *     → near-dup removal (drop the non-canonical side of every
  *       LSH-candidate pair that exact-Jaccard verification confirms,
  *       d5's `verified` set)
  *     → manifest (surviving doc_id, predicted language, token counts).
  *
  * Scale shape, stage by stage: the feature stage is per-document
  * (shuffle-free, WholeStageCodegen regex/split column algebra); the
  * exact-dedup stage is one shuffle on `fingerprint` (a windowed
  * row_number — state per group is one counter, no groupBy+self-join
  * re-shuffle); the near-dup stage reuses the session's materialized
  * shingle index and LSH candidate table (built once, see [[Dedup]]),
  * and its verified-loser set is |near-dups|-sized by construction, so
  * it applies as a broadcast anti-join — the corpus never shuffles to
  * be filtered. At 100 TB the pipeline's only corpus-sized shuffle is
  * the fingerprint dedup, which is irreducible (exact dedup IS a
  * group-by-fingerprint), and the manifest writes out pruned columns,
  * never `text`.
  *
  * The loser set's retention join reads `uniq` a second time (once to
  * know which keepers survived, once as the anti-join's left side). At
  * gate scale that is a re-window over thousands of rows; a 100 TB
  * deployment materializes `uniq` first — it IS the curated corpus
  * being produced, so it gets written (or cached) before the near-dup
  * stage either way.
  */
object Curation {
  import Tables.t
  import Text.{langCountCols, langCountsSql, predLangCol, predLangSql}

  private[graft] val MinWords = 20
  private[graft] val MaxWords = 1000

  def all: Seq[Q] = Seq(
    Q(
      "p1_curation",
      (s, dir) => {
        val feats = t(s, dir, "documents").select(
          col("doc_id") +: langCountCols :+
            Portable.nWords(col("text")).as("n_words") :+
            Portable.bpeTokens(col("text")).as("bpe_tokens") :+
            Portable.normFingerprint(col("text")).as("fingerprint"): _*)
        val gated = feats
          .filter(col("n_words").between(MinWords, MaxWords))
          .withColumn("pred_lang", predLangCol)
        val uniq = gated
          .withColumn("rn",
            row_number().over(Window.partitionBy("fingerprint").orderBy("doc_id")))
          .filter(col("rn") === 1)
        // A doc loses to a near-dup pair only when its KEEPER (the
        // lower-id side) actually survived the gate + exact dedup —
        // otherwise dropping it would lose the content entirely (the
        // keeper was already gated out, leaving no copy). The join
        // against `uniq` enforces that retention rule.
        val losers = Dedup.lshVerifiedPairs(s, dir)
          .filter(col("is_dup"))
          .join(uniq.select(col("doc_id").as("doc1")), "doc1")
          .select(col("doc2").as("doc_id"))
          .distinct()
        uniq
          .join(broadcast(losers), Seq("doc_id"), "left_anti")
          .select(col("doc_id"), col("pred_lang"), col("n_words"), col("bpe_tokens"))
      },
      Some(s"""
        WITH ${Dedup.lshVerifiedCtes},
        feats AS (
          SELECT doc_id,
                 $langCountsSql,
                 CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS INT) AS n_words,
                 CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS INT) AS bpe_tokens,
                 md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint
          FROM documents),
        gated AS (
          SELECT *, $predLangSql AS pred_lang
          FROM feats WHERE n_words BETWEEN $MinWords AND $MaxWords),
        uniq AS (
          SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY fingerprint ORDER BY doc_id) AS rn
            FROM gated)
          WHERE rn = 1),
        losers AS (
          SELECT DISTINCT v.doc2 AS doc_id
          FROM verified v JOIN uniq u ON v.doc1 = u.doc_id
          WHERE v.is_dup)
        SELECT doc_id, pred_lang, n_words, bpe_tokens
        FROM uniq
        WHERE doc_id NOT IN (SELECT doc_id FROM losers)"""),
    ),
  )
}
