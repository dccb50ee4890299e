#!/bin/bash
# End-of-round gate: full suite, sf0.01 verify + DuckDB selfcheck,
# quiet-suite local bench, leak scan.
# Usage: tools/round_gate.sh [round=16]
# r16: the quiet-box bench line lands IN THE REPO as
# BENCH_LOCAL_r<N>.json (r15 wrote it to /tmp and lost it — r15
# verdict missing #3).
set -u
R=${1:-16}
cd "$(dirname "$0")/.." || exit 1
sbt -batch test > /tmp/gate_test.log 2>&1
grep -E "Tests:|All tests" /tmp/gate_test.log | tail -2
rm -rf /tmp/gate_verify
SPARK_GRAFT_CPUS=16 GRAFT_HEAP=8g tools/graftjava.sh graft.Verify /root/testdata/sf0.01 /tmp/gate_verify 2>&1 | tail -1
python3 tools/selfcheck.py /root/testdata/sf0.01 /tmp/gate_verify 2>&1 | tail -1
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 GRAFT_HEAP=24g \
  tools/graftjava.sh graft.Bench 2>/dev/null | grep '"metric"' | tail -1 > "BENCH_LOCAL_r${R}.json"
head -c 300 "BENCH_LOCAL_r${R}.json"; echo
python3 tools/leakcheck.py "$R" > /dev/null 2>&1 && python3 -c "import json; d=json.load(open('LEAKCHECK.json')); print('leakcheck n_hits', d['n_hits'], d.get('round'), d.get('head_tree','')[:16])"
echo GATE_DONE
