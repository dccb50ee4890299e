#!/bin/bash
# r14 verdict #7 / r15 verdict #3: settle the tick_qc /
# multimodal_decode / feature_ic mover drifts with the prescribed
# binary A/B. Interleaved solo runs, r13 tree (worktree @ e3c0c5f) vs
# current tree, same box/data/protocol.
#
# r16 hardening — the r15 run silently produced EMPTY r13 rows
# because tools/graftjava.sh did not exist at e3c0c5f (the launcher
# postdates it): the r13 invocation failed, $S was empty, and the
# empty value was appended without complaint. Now the launcher is
# provisioned into the worktree first, classes are smoke-checked, and
# an empty measurement aborts the whole A/B loudly.
# Usage: tools/r13_ab.sh <r13TreeDir> [out=/tmp/r13_ab.jsonl]
set -u
R13=$1
OUT=${2:-/tmp/r13_ab.jsonl}
cd "$(dirname "$0")/.." || exit 1
HERE=$(pwd)
mkdir -p "$R13/tools"
cp tools/graftjava.sh "$R13/tools/graftjava.sh"
if [ ! -f "$R13/target/scala-2.13/classes/graft/Bench.class" ]; then
  echo "FATAL: r13 tree at $R13 is not built (target/scala-2.13/classes missing)" >&2
  exit 1
fi
run_one() { # repo label dir query
  local S
  S=$(cd "$1" && SPARK_GRAFT_SF_DIR="$3" SPARK_GRAFT_ONLY="$4" SPARK_GRAFT_CPUS=32 \
    GRAFT_HEAP=24g tools/graftjava.sh graft.Bench 2>/dev/null \
    | grep '"metric"' | tail -1 \
    | python3 -c "import json,sys; print(json.load(sys.stdin)['queries']['$4'])")
  if [ -z "$S" ]; then
    echo "FATAL: empty measurement from bin=$2 q=$4 dir=$3 — aborting A/B" >&2
    exit 1
  fi
  echo "{\"bin\":\"$2\",\"q\":\"$4\",\"dir\":\"$3\",\"sec\":$S}" >> "$OUT"
}
for i in 1 2 3; do
  run_one "$HERE" cur /tmp/graft_sf10 tick_qc
  run_one "$R13" r13 /tmp/graft_sf10 tick_qc
done
# tick_qc_daily added r18: the largest apparent r17 suite mover
# (0.95 -> 1.52 s at 32 cores, faster at 8 — pin whether it is drift)
for q in multimodal_decode feature_ic tick_qc_daily; do
  for i in 1 2 3; do
    run_one "$HERE" cur /root/testdata/sf0.1 "$q"
    run_one "$R13" r13 /root/testdata/sf0.1 "$q"
  done
done
echo R13AB_DONE
