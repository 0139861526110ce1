#!/usr/bin/env bash
# Cross-engine fuzz harness: K seeded, structure-preserving corpus
# mutations through the FULL query registry, each hash-compared against
# DuckDB on the same parquet (verdict r11 item 8: at this registry size
# new bugs arrive via scale/value-range — the discount_qty_corr int64
# overflow — not via logic, so vary the VALUES, keep the structure).
#
#   scripts/fuzz_parity.sh [K] [baseSfDir] [workRoot] [outJson]
#
# defaults: K=3  baseSfDir=/root/testdata/sf0.001
#           workRoot=/tmp/graft_fuzz  outJson=FUZZ.json
#
# Value seeds fz1..fzK: AmplifyCorpus k=2 with salt "fz<s>" (per-seed
# token suffixes and embedding perturbations — different hash values,
# same dup density / key structure). Structural seeds (always run):
#   sk1 — zipfian hot-key skew: 30% of events collapse onto 16 hot
#         user ids (giant sessions, hot reducers)
#   sh1 — shape adversaries: empty / whitespace-only / unicode-heavy
#         (CJK + astral emoji + combining mark) documents, null-dense
#         props JSON
#   ep1 — empty-group shape: a whole language+source of documents, all
#         signup events and a whole embedding label vanish (empty
#         rollup groups, zero-denominator funnels, empty label QA)
# Each seed: graft.Verify + scripts/parity.py on the mutated parquet —
# both engines read the identical file, so a divergence is a real
# cross-engine semantics bug, never a fixture artifact. The verdict
# JSON per seed lands in $workRoot_<salt>.json; a one-line rollup
# (seeds, per-seed pass/fail) is written to $outJson; exit is non-zero
# if any seed fails.
set -euo pipefail
cd "$(dirname "$0")/.."

K="${1:-3}"
BASE="${2:-/root/testdata/sf0.001}"
ROOT="${3:-/tmp/graft_fuzz}"
OUTJSON="${4:-FUZZ.json}"

SALTS="$(seq -f 'fz%g' 1 "$K") sk1 sh1 ep1"
declare -a SUMMARY=()
TOTAL_FAIL=0
i=0
for SALT in $SALTS; do
  i=$((i + 1))
  WORK="${ROOT}_$SALT"
  OUT="$WORK.out"
  echo "== fuzz seed $SALT: amplify $BASE x2 -> $WORK"
  rm -rf "$WORK" "$OUT"
  sbt -batch "runMain graft.AmplifyCorpus $BASE $WORK 2 $SALT"
  echo "== fuzz seed $SALT: verify -> $OUT"
  sbt -batch "runMain graft.Verify $WORK $OUT"
  echo "== fuzz seed $SALT: DuckDB parity -> $WORK.json"
  python3 scripts/parity.py "$OUT" "$WORK" "$WORK.json"
  NP=$(python3 -c "import json;d=json.load(open('$WORK.json'));print(d['_meta']['n_pass'])")
  NF=$(python3 -c "import json;d=json.load(open('$WORK.json'));print(d['_meta']['n_fail'])")
  SUMMARY+=("{\"seed\":$i,\"salt\":\"$SALT\",\"n_pass\":$NP,\"n_fail\":$NF}")
  TOTAL_FAIL=$((TOTAL_FAIL + NF))
done

printf '{"metric":"fuzz_parity","k":2,"base":"%s","seeds":[%s]}\n' \
  "$BASE" "$(IFS=,; echo "${SUMMARY[*]}")" | tee "$OUTJSON"

# a fuzz harness nothing can gate on is decoration: fail the run when
# any seed failed parity
if [ "$TOTAL_FAIL" -gt 0 ]; then
  echo "fuzz_parity: $TOTAL_FAIL query failure(s) across seeds" >&2
  exit 1
fi
