#!/usr/bin/env bash
# Per-query bench regression gate (round-12 verdict stretch item):
# run a fresh bench and flag any query that reads > THRESH x its
# committed per-query record AFTER normalizing the window — the
# committed BENCH_LOCAL.json is the reference, the median per-query
# ratio over untouched queries is the window normalizer (the verify
# skill's steady-throttle lesson: a uniform 1.3x window is the HOST,
# not a regression; a single query at 3x inside a quiet window is a
# plan regression).
#
#   scripts/bench_gate.sh [sfDir] [thresh] [refJson]
#
# defaults: sfDir=/root/testdata/sf0.1  thresh=1.5
#           refJson=<committed BENCH_LOCAL.json at HEAD>
# Exit 0 = no normalized regression; 1 = regressions listed on stderr.
# The fresh run REPLACES BENCH_LOCAL.json (commit it if it's the new
# record); the reference is read from git HEAD, not the worktree.
set -euo pipefail
cd "$(dirname "$0")/.."

SF="${1:-/root/testdata/sf0.1}"
THRESH="${2:-1.5}"
REF="${3:-}"

REFJSON="$(mktemp /tmp/bench_ref.XXXX.json)"
if [ -n "$REF" ]; then
  cp "$REF" "$REFJSON"
else
  git show HEAD:BENCH_LOCAL.json > "$REFJSON"
fi

echo "== bench_gate: fresh bench at $SF (reference: ${REF:-HEAD:BENCH_LOCAL.json})"
SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
  sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"' || true

python3 - "$REFJSON" BENCH_LOCAL.json "$THRESH" <<'EOF'
import json, statistics, sys
ref = json.load(open(sys.argv[1]))["queries"]
new = json.load(open(sys.argv[2]))["queries"]
thresh = float(sys.argv[3])
common = sorted(set(ref) & set(new))
if not common:
    print("bench_gate: no common queries with the reference", file=sys.stderr)
    sys.exit(1)
ratios = {q: new[q] / ref[q] for q in common if ref[q] > 0}
med = statistics.median(ratios.values())
# ignore sub-50ms queries: scheduling noise dominates their ratio
flagged = [(q, r) for q, r in sorted(ratios.items(), key=lambda x: -x[1])
           if r / med > thresh and ref[q] >= 0.05]
print(f"bench_gate: {len(common)} common queries, window median {med:.2f}x,"
      f" threshold {thresh}x normalized")
for q, r in flagged:
    print(f"  REGRESSION {q}: {r:.2f}x raw, {r/med:.2f}x normalized "
          f"(ref {ref[q]:.2f}s -> {new[q]:.2f}s)", file=sys.stderr)
sys.exit(1 if flagged else 0)
EOF
