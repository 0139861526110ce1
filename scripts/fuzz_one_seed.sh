#!/usr/bin/env bash
# Run ONE fuzz seed (amplify+verify+parity) and merge its result into
# FUZZ.json — the incremental form of fuzz_parity.sh for a newly added
# seed (the full harness re-runs every seed; a new structural seed only
# needs its own run, the committed results of the others still stand).
#
#   scripts/fuzz_one_seed.sh <salt> [baseSfDir] [workRoot] [outJson]
set -euo pipefail
cd "$(dirname "$0")/.."

SALT="${1:?salt required, e.g. ep1}"
BASE="${2:-/root/testdata/sf0.001}"
ROOT="${3:-/tmp/graft_fuzz}"
OUTJSON="${4:-FUZZ.json}"
WORK="${ROOT}_$SALT"
OUT="$WORK.out"

echo "== fuzz seed $SALT: amplify $BASE x2 -> $WORK"
rm -rf "$WORK" "$OUT"
sbt -batch "runMain graft.AmplifyCorpus $BASE $WORK 2 $SALT"
echo "== fuzz seed $SALT: verify -> $OUT"
sbt -batch "runMain graft.Verify $WORK $OUT"
echo "== fuzz seed $SALT: DuckDB parity -> $WORK.json"
python3 scripts/parity.py "$OUT" "$WORK" "$WORK.json"

python3 - "$SALT" "$WORK.json" "$OUTJSON" <<'EOF'
import json, sys
salt, seed_json, out = sys.argv[1:4]
meta = json.load(open(seed_json))["_meta"]
doc = json.load(open(out))
seeds = [s for s in doc["seeds"] if s["salt"] != salt]
seeds.append({"seed": len(seeds) + 1, "salt": salt,
              "n_pass": meta["n_pass"], "n_fail": meta["n_fail"]})
for i, s in enumerate(seeds):
    s["seed"] = i + 1
doc["seeds"] = seeds
json.dump(doc, open(out, "w"), separators=(",", ":"))
print(f"{out}: {salt} n_pass={meta['n_pass']} n_fail={meta['n_fail']}")
EOF

NF=$(python3 -c "import json;print(json.load(open('$WORK.json'))['_meta']['n_fail'])")
[ "$NF" -eq 0 ] || { echo "fuzz seed $SALT: $NF failure(s)" >&2; exit 1; }
