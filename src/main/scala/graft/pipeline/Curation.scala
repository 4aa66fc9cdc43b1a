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
  *     → near-dup removal (cluster the d5-verified near-dup pairs among
  *       the survivors by connected components and keep exactly the
  *       lowest-id member of each cluster)
  *     → manifest (surviving doc_id, predicted language, token counts).
  *
  * Scale shape, stage by stage: the feature stage is per-document
  * (shuffle-free, WholeStageCodegen regex/split column algebra); the
  * exact-dedup stage is one shuffle on `fingerprint` (a windowed
  * row_number — state per group is one counter, no groupBy+self-join
  * re-shuffle); the near-dup stage reuses the session's materialized
  * shingle index and LSH candidate table (built once, see [[Dedup]]) and
  * clusters only the verified PAIR set ([[Cluster]] — |near-dups|-sized
  * by construction, never the corpus). The surviving corpus (`uniq`) is
  * the pipeline's product and is read twice (once to scope the dup
  * clusters, once as the anti-join's left side), so it is MATERIALIZED —
  * the gate + window compute once and both readers scan the cache, the
  * same write-then-reuse a 100 TB deployment does with its curated
  * output. The only corpus-sized shuffle is the fingerprint dedup, which
  * is irreducible (exact dedup IS a group-by-fingerprint), and the
  * manifest writes out pruned columns, never `text`.
  *
  * Retention semantics (pinned by CurationSpec): removal acts on
  * CLUSTERS, not raw pairs. A doc is dropped iff it is a non-canonical
  * (non-minimum-id) member of a connected component of verified-dup
  * pairs whose endpoints BOTH survived the gate + exact dedup. Chains
  * (1~2, 2~3) therefore keep exactly doc 1 — the round-3 per-pair rule
  * dropped doc 3 because its keeper 2 was in `uniq` at evaluation time
  * even though 2 itself was removed, losing 3's content with no
  * surviving near-copy it was verified against. Pairs with a gated-out
  * endpoint contribute no edge: content whose only keeper never made it
  * into the corpus stays.
  *
  * The loser anti-join carries NO broadcast hint: on the duplicate-heavy
  * crawl corpora dedup exists for, near-dup losers can be a large corpus
  * fraction, and a forced broadcast is an executor-OOM bomb at scale.
  * AQE sees the loser side's runtime size and broadcasts exactly when it
  * is actually small (it is, at every gate SF).
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
        val uniq = Materialized(s"p1.uniq|$dir", gated
          .withColumn("rn",
            row_number().over(Window.partitionBy("fingerprint").orderBy("doc_id")))
          .filter(col("rn") === 1)
          .select("doc_id", "pred_lang", "n_words", "bpe_tokens"))
        val uniqIds = uniq.select("doc_id")
        val dupPairs = Dedup.lshVerifiedPairs(s, dir)
          .filter(col("is_dup"))
          .join(uniqIds.withColumnRenamed("doc_id", "doc1"), "doc1")
          .join(uniqIds.withColumnRenamed("doc_id", "doc2"), "doc2")
          .select("doc1", "doc2")
        val losers = Materialized
          .getOrBuild(s, s"p1.cc|$dir")(Cluster.minLabelComponents(dupPairs))
          .filter(col("doc_id") =!= col("root"))
          .select("doc_id")
        uniq
          .join(losers, Seq("doc_id"), "left_anti")
          .select(col("doc_id"), col("pred_lang"), col("n_words"), col("bpe_tokens"))
      },
      Some(s"""
        WITH RECURSIVE ${Dedup.lshVerifiedCtes},
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
        dup AS (
          SELECT v.doc1, v.doc2
          FROM verified v
          JOIN uniq u1 ON v.doc1 = u1.doc_id
          JOIN uniq u2 ON v.doc2 = u2.doc_id
          WHERE v.is_dup),
        ${Cluster.componentsCtes("dup")},
        losers AS (
          SELECT doc_id FROM cc_roots WHERE doc_id <> root)
        SELECT doc_id, pred_lang, n_words, bpe_tokens
        FROM uniq
        WHERE doc_id NOT IN (SELECT doc_id FROM losers)"""),
    ),
  )
}
