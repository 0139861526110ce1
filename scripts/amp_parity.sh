#!/usr/bin/env bash
# Amplified-parity lane: the full correctness gate ABOVE the largest
# generated sf, as ONE command.
#
#   scripts/amp_parity.sh [baseSfDir] [k] [workDir]
#
# defaults: baseSfDir=/root/testdata/sf0.01  k=10  workDir=/tmp/graft_amp10
#
# 1. graft.AmplifyCorpus rewrites documents/events k-wide (structure-
#    preserving, copy-disjoint; other tables symlinked),
# 2. graft.Verify dumps the parity subset below on the amplified dir,
# 3. scripts/parity.py hash-compares every result against DuckDB running
#    the same oracle SQL on the same amplified parquet,
# and the JSON verdict lands in CORRECTNESS_AMP.json at the repo root.
#
# The subset = every operator family whose cost grows with corpus volume:
# the dedup chain end-to-end, the CDC merge/apply pair, sessionization,
# the streaming parity harnesses (file-sourced, so they replay the
# amplified events/documents through real micro-batches), and the
# vector family (embeddings amplified copy-disjoint: fixed 8-query /
# 16-seed prefix, 10x candidate+training corpus, scaled label space).
set -euo pipefail
cd "$(dirname "$0")/.."

BASE="${1:-/root/testdata/sf0.01}"
K="${2:-10}"
WORK="${3:-/tmp/graft_amp10}"
OUT="$WORK.out"

SUBSET="cdc_merge,cdc_upsert_apply,changelog_normalize,cluster_size_hist,\
cross_source_overlap,dedup_agreement,dedup_apply,dedup_exact,\
dedup_incremental,dedup_minhash,dedup_ngram_jaccard,dedup_simhash,\
dedup_sweep,dup_cluster,lsh_band_sweep,minhash_est_error,\
session_quantiles,sessionize,span_dedup,substring_dedup,\
stream_window_agg,stream_merge_parity,stream_sessionize_parity,\
stream_dedup_parity,stream_window_parity,stream_late_parity,\
stream_tier_parity,tier_history,ingest_parity,\
ann_topk,ivf_train,pq_train,pq_recall_trained,sq_recall,\
span_corruption,repeat_plan,contrastive_triplets,\
mrl_recall,bq_recall,corpus_diversity,l_diversity,\
incontext_order,unimax_alloc,\
vocab_growth,t_closeness,embed_drift,ivf_balance,\
event_transitions,stream_transitions_parity,rfm_segments,\
rp_recall,ivf_sq_recall,padding_plan,dup_token_share,\
ring_rebalance,quantile_sketch_error,event_paths,rate_changepoint,\
cluster_cohesion,stream_queue_parity,stream_funnel_parity,\
embed_covariance,anisotropy_audit,mmr_diversify,rrf_fusion,\
weighted_sample,pq_subspace_balance,char_diversity,rpo_audit,\
session_gap_sweep,balance_audit,acf_profile,fano_burstiness,\
knn_graph,nn_descent,zipf_fit,anon_generalize,watermark_sweep,\
sequence_gap_audit,stream_balance_parity,split_kfold,\
compaction_plan,ngram_containment,sample_coverage,hubness_audit,\
attribution_linear,stream_gap_parity,bbit_minhash,\
idempotence_gate,knn_components,readability_score,\
cross_lang_pairs,bounce_rate,alert_payloads,\
stream_compaction_parity,cohort_ltv,stream_linear_parity,\
access_export"

echo "== amplify $BASE x$K -> $WORK"
sbt -batch "runMain graft.AmplifyCorpus $BASE $WORK $K"
echo "== verify subset -> $OUT"
rm -rf "$OUT"
sbt -batch "runMain graft.Verify $WORK $OUT $SUBSET"
echo "== DuckDB parity -> CORRECTNESS_AMP.json"
python3 scripts/parity.py "$OUT" "$WORK" CORRECTNESS_AMP.json
