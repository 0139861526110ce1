#!/usr/bin/env bash
# Amplified-parity lane: the full correctness gate ABOVE the largest
# generated sf, as ONE command.
#
#   scripts/amp_parity.sh [baseSfDir] [k] [workDir] [subset] [outJson]
#
# defaults: baseSfDir=/root/testdata/sf0.01  k=10  workDir=/tmp/graft_amp10
#           subset=full registry             outJson=CORRECTNESS_AMP.json
#
# 1. graft.AmplifyCorpus rewrites documents/events/embeddings AND the
#    TPC-H fact tables customer/orders/lineitem k-wide (structure-
#    preserving, copy-disjoint key offsets; dims symlinked),
# 2. graft.Verify dumps the parity set on the amplified dir,
# 3. scripts/parity.py hash-compares every result against DuckDB running
#    the same oracle SQL on the same amplified parquet,
# and the JSON verdict lands in $outJson at the repo root.
#
# With no subset argument the FULL query registry runs — every operator
# family, including the OLAP/ledger queries whose volume now scales with
# the amplified fact tables. Pass an explicit comma-separated subset for
# targeted lanes (e.g. the 30x vector run):
#
#   scripts/amp_parity.sh /root/testdata/sf0.01 30 /tmp/graft_amp30 \
#     "ann_topk,ann_lsh,ann_ivf,ivf_train,..." CORRECTNESS_AMP30.json
set -euo pipefail
cd "$(dirname "$0")/.."

BASE="${1:-/root/testdata/sf0.01}"
K="${2:-10}"
WORK="${3:-/tmp/graft_amp10}"
SUBSET="${4:-}"
OUTJSON="${5:-CORRECTNESS_AMP.json}"
OUT="$WORK.out"

echo "== amplify $BASE x$K -> $WORK"
sbt -batch "runMain graft.AmplifyCorpus $BASE $WORK $K"
echo "== verify ${SUBSET:+subset }-> $OUT"
rm -rf "$OUT"
if [ -n "$SUBSET" ]; then
  sbt -batch "runMain graft.Verify $WORK $OUT $SUBSET"
else
  sbt -batch "runMain graft.Verify $WORK $OUT"
fi
echo "== DuckDB parity -> $OUTJSON"
python3 scripts/parity.py "$OUT" "$WORK" "$OUTJSON"
