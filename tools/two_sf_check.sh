#!/usr/bin/env bash
# Two-SF oracle gate for the scale-PARAMETERIZED operators — the ones
# whose geometry is derived from the corpus size (s2/s3 band-bit
# ladders, s4's K≈sqrt(n) two-level quantizer, d4b's piece-width
# ladder, d2's df cap) plus the cluster fixpoint (d6). The driver's
# correctness gate runs at one SF; this proves the parameterization
# cross-engine at BOTH ends of the testdata range — Spark and DuckDB
# must derive the SAME widths/centroids from the corpus count at each
# scale, or the hashes split.
#
# Usage: tools/two_sf_check.sh  (writes TWO_SF_GATE.md)
set -uo pipefail
cd "$(dirname "$0")/.."

# d8/d9 (span index is corpus-linear, SpanK constant), t9 (allocation
# depends on corpus totals) joined the gate in round 5. Round 6 adds
# e12 (the streaming anomaly ring's float z must stay engine-portable
# as the hourly series grows), t11 (first-owner novelty over the
# shared shingle index), and the quota/ranking trio p5 (cap binding at
# both SFs: 25 vs 250 docs/source), t12 (df-normalized rank order must
# agree cross-engine as df grows), e13 (content-dedup survivor set).
# q37's z-grid geometry is corpus-min/max-derived — both engines must
# scale the SAME grid at each SF; q38's lake/delta boundary must merge
# to the full recompute at both corpus sizes. Round 7 adds s10 (the
# frozen-index K and the delta boundary both derive from the corpus),
# q39-q44 (layout/ingest fixtures plus the CDC family: q41/q43/q44's
# re-key offset and change-log key sets all derive from the corpus at
# each SF), and d11 (the bloom's load factor — and so its
# false-positive trickle — scales with the eval-span share at each SF
# while the exact-verify must erase it at both).
# Round 8 adds s12 (retrain set, flagged members and refreshed
# centroids all derive from the corpus-sized drift report), q47 (the
# checkpoint folds a corpus-derived log), and the multimodal family
# m4-m7 (raster geometry, variant ids and fingerprint cliques all
# derive from doc_id ranges that grow with the corpus — VERDICT r7
# item 7). This session adds d13/p6 (both ride the d6 cluster
# fixpoint: keeper argmax and root-hash split must agree cross-engine
# at each cluster census), q49 (bloom fill factor and the mid-domain
# probe keys derive from the corpus key range), m9 (the clip set
# and frame index grow with corpus bytes), and e14/e15 (the lateness
# distribution and per-window admission counts are corpus-volume facts
# both engines must agree on at each census). d14 joins with d13:
# the soft-dedup weight table derives from the same cluster census.
# Round 9 adds t14 (its kept-share / rule-firing thresholds are
# corpus-calibrated — ADVICE r8), q53 (NDV/minmax stats are corpus
# facts), q57 (pushdown aggregates over corpus-derived footers), and
# qc7 (the timestamp-ladder canary reads the real events table),
# s15 (df-capped lexical leg + corpus-derived vector ranks), q61/e20
# (the SCD2 ledger's key/version census derives from the corpus at
# each SF, in both the window and streamed builds), and s16 (the
# recall grid rides s4's corpus-derived sqrt(n) quantizer). Late round
# 9 adds s17 (Hamming pool boundaries shift with corpus density),
# d16 (rides the LSH candidate table whose band geometry is
# corpus-derived), p10 (lang quotas are corpus counts and the
# oversample/subsample regime FLIPS between the gate SFs), e21
# (the outer join's NULL-row population is the corpus-volume
# complement of e4's match set at each SF), and q62 (the histogram
# census and the integer quantile positions ceil(q*n) are corpus
# counts both engines must agree on at each SF). Round 9 session 2
# adds q63 (the Hilbert grid shares q37's corpus-min/max geometry,
# so both engines must scale the same 16x16 grid at each SF), q64
# (the CMS grid cells are corpus counts) and q65 (the k-th order
# statistic shifts with corpus density at each SF), and t15 (the
# phrase match census is a corpus-volume fact at each SF), and e22
# (the native session census derives from per-user gap structure at
# each corpus density). Round 10 adds q66 (the pairwise union/
# intersection sketches shift with corpus hash density at each SF),
# t16 (the confusion census and its ppm shares are corpus counts),
# and s18 (the radius census is a corpus-density fact — 10/6/24 rows
# across the three SFs — and rides the same Lloyd replay as s4), and
# e27 (the maintained k-th order statistic shifts with corpus hash
# density at each SF, like q65), and q68 (the custom aggregate's
# insert/merge must reproduce the window replay at each corpus
# density).
# Round 11 adds q67b (the sampled hot-key census reads corpus density
# directly - the gate proves the empty-census degeneration stays
# oracle-equal at every SF; the non-empty branch is spec-pinned on the
# zipf fixture).
# Round 13 adds q69 (manifest-stats aggregate pushdown: the lake's
# per-file min/max/rows stats all derive from the corpus key range at
# each SF, and the stats path must agree with the oracle's full replay
# at both ends).
QUERIES="q69_lake_stats_agg,q67b_hotkey_salted_join,q67_salted_join,q68_kmv_agg,e27_stream_kmv,q66_kmv_setops,t16_langid_confusion,s18_range_search,p11_data_card,q63_hilbert,q64_cms_topk,q65_kmv_ndv,t15_phrase_search,e22_session_window,e23_dropdup_watermark,e24_transform_state,e25_full_attribution,e26_stream_trending,t14_rule_attrition,q53_table_stats,q57_agg_pushdown,qc7_epoch_us,s15_hybrid_rrf,s17_knn_binary,d16_edit_neardup,p10_epoch_plan,e21_outer_attribution,q62_sketch_percentiles,q61_scd2_history,e20_stream_scd2,s16_nprobe_recall,d15_cluster_census,d2_ngram_jaccard,d4b_simhash_pairs,d6_dup_clusters,s2_knn_lsh,s3_cosine_neardup,s4_knn_ivf,s5_knn_sq8,s6_knn_pq,s7_knn_ivfpq,s10_ann_delta,s11_ann_drift,s12_ann_retrain,q39_compaction,q46_selective_compact,q40_jsonl_ingest,q41_cdc_upsert,q42_schema_evolution,q43_time_travel,q44_cdc_stream,q47_log_checkpoint,q48_position_delete,q31_sample,d12_containment,p2_delta_curation,d8_span_dedup,d9_decontam,d11_bloom_decontam,t9_domain_mix,s8_ann_layout,e12_stream_anomaly,t11_novelty,p5_domain_quota,t12_tfidf,e13_stream_dedup,q37_zorder,q45_cluster_prune,q38_incremental_agg,d10_semantic_clusters,m4_resize,m5_payload_phash,m6_media_neardup,m7_resize_neardup,m8_phash_neardup,d13_canonical_pick,p6_leakage_split,q49_bloom_skip,m9_clip_containment,e14_watermark_audit,e15_admission_audit,e16_gap_fill,e17_interp,q50_change_feed,s13_ann_compact,p7_temperature_mix,m10_temporal_dedup,e18_stream_gapfill,q51_equality_delete,q52_snapshot_expiry,t13_ppl_bucket,m11_audio_features,d14_soft_dedup,p8_domain_rank,m12_audio_neardup,q54_spec_evolution,q55_recursive_cte,e19_stream_enrich,s14_mmr_diversify,q56_expectations,q58_wap,q59_join_ivm,p9_shard_order,q60_runtime_filter"

ADDOPENS=$(for p in java.lang java.lang.invoke java.lang.reflect java.io \
  java.net java.nio java.util java.util.concurrent \
  java.util.concurrent.atomic sun.nio.ch sun.nio.cs sun.security.action \
  sun.util.calendar; do echo --add-opens java.base/$p=ALL-UNNAMED; done)

OUT=TWO_SF_GATE.md
{
  echo "# Two-SF oracle gate (scale-parameterized operators)"
  echo
  echo "Queries: \`$QUERIES\`"
  echo "Run: $(date -u +%Y-%m-%dT%H:%MZ) via tools/two_sf_check.sh"
} > "$OUT"

# Three SFs since round 9: the r08 e14/e15/p7 incident shipped green at
# sf0.001 + sf0.1 and red on the driver at sf0.01 — so the driver's own
# SF now runs the FULL suite (every query, not just the
# scale-parameterized subset); the two endpoint SFs keep the subset.
fail=0
for sf in sf0.001 sf0.01 sf0.1; do
  dir=/tmp/twosf_$sf
  rm -rf "$dir"
  filter="$QUERIES"
  [ "$sf" = sf0.01 ] && filter=""
  java $ADDOPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -Xmx8g -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.Verify "/root/testdata/$sf" "$dir" $filter 2>/dev/null
  {
    echo
    echo "## $sf"
    echo
    echo '```'
    python3 tools/check_oracle.py "/root/testdata/$sf" "$dir" || fail=1
    echo '```'
  } >> "$OUT"
done

cat "$OUT"
exit $fail
