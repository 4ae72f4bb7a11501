#!/usr/bin/env bash
# Pre-snapshot gate: run before any end-of-round / milestone commit.
# A snapshot must never ship with a red suite, a failing differential
# check, or a crashed bench (round 4 shipped all three; this script is
# the process fix). Usage:
#
#   bash scripts/gate.sh            # full gate (~12 min)
#   bash scripts/gate.sh --fast     # selfcheck at sf0.001 + pytest only
#
# Exits non-zero on the first failing stage.
set -euo pipefail
cd "$(dirname "$0")/.."

FAST="${1:-}"

echo "== gate: pytest =="
python -m pytest tests/ -q

if [ "$FAST" = "--fast" ]; then
  echo "== gate: selfcheck (sf0.001) =="
  python scripts/selfcheck.py /root/testdata/sf0.001 | tail -1
else
  echo "== gate: selfcheck (sf0.01 — driver gate scale) =="
  python scripts/selfcheck.py /root/testdata/sf0.01 | tail -1

  echo "== gate: bench =="
  OUT=$(python bench.py)
  echo "$OUT"
  # Parse only the LAST line: bench.py's contract is one final JSON
  # line, and stray stdout (py4j/log4j/Ivy warnings) above it must not
  # read as a gate failure.
  python3 - <<'EOF' "$OUT"
import json, sys
last = [ln for ln in sys.argv[1].splitlines() if ln.strip()][-1]
d = json.loads(last)
assert d.get("value", 0) > 0 and d.get("queries"), "bench produced no numbers"
print(f"bench ok: {d['value']}s over {len(d['queries'])} queries")
EOF
fi

echo "== gate: PASS =="
