#!/usr/bin/env bash
# End-of-round snapshot gate (round-10 verdict item 7): a snapshot MUST
# ride a green suite. Runs `sbt test`; refuses to commit on any failure.
# Also drops ADVICE.md (advisor output about a PREVIOUS head — carrying
# it into the snapshot misleads the next round's driver; the advisor
# regenerates it fresh each round — verdict item 5).
#
#   scripts/snapshot.sh "commit message"
set -euo pipefail
cd "$(dirname "$0")/.."
MSG="${1:?usage: scripts/snapshot.sh \"commit message\"}"

echo "== snapshot gate: sbt test must exit 0"
if ! sbt -batch test > /tmp/graft_snapshot_test.log 2>&1; then
  tail -n 60 /tmp/graft_snapshot_test.log
  echo "== SUITE RED — refusing to snapshot" >&2
  exit 1
fi
grep -E "Tests: succeeded" /tmp/graft_snapshot_test.log | tail -n 1

if [ -f ADVICE.md ]; then
  git rm -q --ignore-unmatch ADVICE.md
  rm -f ADVICE.md
fi

git add -A
if git diff --cached --quiet; then
  echo "== nothing to snapshot (working tree clean)"
else
  git commit -m "$MSG"
fi
