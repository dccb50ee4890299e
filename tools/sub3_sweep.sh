#!/bin/bash
# r14 verdict #6: solo-3x every committed sf10 per-query value below 3 s
# (suite-sourced small values are position/JIT-dominated; the committed
# number must be a solo fresh-JVM median). Skips queries whose committed
# value already is a solo3x median.
# Usage: tools/sub3_sweep.sh [out=/tmp/sub3.jsonl]
set -u
OUT=${1:-/tmp/sub3.jsonl}
cd "$(dirname "$0")/.." || exit 1
QS=$(python3 - <<'EOF'
import json
d = json.load(open('BENCH_SF10.json'))
sf10 = d['sf10']
already = set(sf10.get('solo3x', {}))
qs = [k for k, v in sf10['queries'].items() if v < 3.0 and k not in already]
print(' '.join(sorted(qs)))
EOF
)
echo "sweeping: $QS"
for q in $QS; do
  tools/solo3x.sh /tmp/graft_sf10 "$q" 3 24g "$OUT"
done
echo SUB3_DONE
