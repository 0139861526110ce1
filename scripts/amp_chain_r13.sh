#!/usr/bin/env bash
# Round-13 amplified-tier refresh, as one serialized chain (one sbt /
# one Spark JVM at a time — the bench lesson):
#   10x  full 307-query registry          -> CORRECTNESS_AMP.json
#   30x  full 307-query registry          -> CORRECTNESS_AMP30.json
#   100x 302 queries (full minus the 5    -> CORRECTNESS_AMP100.json
#        declared-quadratic kNN truth gates, whose probe forms are in)
#   300x linear doc/event lanes           -> CORRECTNESS_AMP300.json
# Run from the repo root. Writes per-tier logs to /tmp/amp_r13_*.log.
set -uo pipefail
cd "$(dirname "$0")/.."

QUAD="knn_recall,knn_graph,knn_components,nn_descent,hubness_audit"

# full registry minus the declared-quadratic gates, from the live registry
ALL=$(python3 - <<'EOF'
import json
keys = sorted(json.load(open('/tmp/verify_r13/oracle_sql.json')).keys())
quad = {"knn_recall","knn_graph","knn_components","nn_descent","hubness_audit"}
print(",".join(k for k in keys if k not in quad))
EOF
)

# 300x lane: linear-oracle doc/event families (dedup chain, text quality,
# attribution/funnel/session, their streaming parities)
LANE300="dedup_exact,dedup_minhash,dedup_ngram_jaccard,dedup_simhash,dedup_apply,dedup_incremental,dup_cluster,soft_dedup_weights,cluster_size_hist,cross_source_overlap,dup_token_share,dedup_sweep,span_dedup,substring_dedup,quality_filter,quality_gopher,text_stats,token_count,lang_id,doc_fingerprint,blocklist_filter,corpus_sample,split_assign,mix_weights,training_pipeline,attribution_last_touch,attribution_linear,attribution_position,funnel_conversion,sessionize,event_transitions,event_paths,cdc_merge,stream_linear_parity,stream_position_parity,stream_funnel_parity,stream_sessionize_parity,image_dedup"

run_tier() {
  local k="$1" work="$2" subset="$3" out="$4" duckmem="${5:-16GB}"
  echo "=== tier ${k}x -> $out ($(date -u +%H:%M:%S))"
  rm -rf "$work" "$work.out"
  sbt -batch "runMain graft.AmplifyCorpus /root/testdata/sf0.01 $work $k" \
    > "/tmp/amp_r13_${k}_amplify.log" 2>&1 || { echo "AMPLIFY ${k}x FAILED"; return 1; }
  if [ -n "$subset" ]; then
    sbt -batch "runMain graft.Verify $work $work.out $subset" \
      > "/tmp/amp_r13_${k}_verify.log" 2>&1 || { echo "VERIFY ${k}x FAILED"; return 1; }
  else
    sbt -batch "runMain graft.Verify $work $work.out" \
      > "/tmp/amp_r13_${k}_verify.log" 2>&1 || { echo "VERIFY ${k}x FAILED"; return 1; }
  fi
  GRAFT_DUCK_MEM="$duckmem" python3 scripts/parity.py "$work.out" "$work" "$out" \
    > "/tmp/amp_r13_${k}_parity.log" 2>&1
  tail -2 "/tmp/amp_r13_${k}_parity.log"
}

run_tier 10  /tmp/graft_amp10  ""        CORRECTNESS_AMP.json
run_tier 30  /tmp/graft_amp30  ""        CORRECTNESS_AMP30.json
run_tier 100 /tmp/graft_amp100 "$ALL"    CORRECTNESS_AMP100.json 48GB
run_tier 300 /tmp/graft_amp300 "$LANE300" CORRECTNESS_AMP300.json 48GB
echo "=== chain done ($(date -u +%H:%M:%S))"
