#!/bin/bash
# r18 frac_diff decade protocol (VERDICT r17 ask #8): solo-3x fresh
# JVMs at /tmp/graft_sf10 (10M ticks) and /tmp/graft_sf100 (100M
# ticks, the §6t 14.1x decade), new binary, plus an interleaved
# old-binary (r17 tree at ce6783b, built under /tmp/r17_tree) A/B at
# sf100 so the boxed-Row-encoder removal is attributed on one box.
set -u
OUT=${1:-/tmp/fd_r18.jsonl}
R17=${2:-/tmp/r17_tree}
cd "$(dirname "$0")/.." || exit 1
HERE=$(pwd)
mkdir -p "$R17/tools"; cp tools/graftjava.sh "$R17/tools/graftjava.sh"
if [ ! -f "$R17/target/scala-2.13/classes/graft/Bench.class" ]; then
  echo "FATAL: r17 tree at $R17 not built" >&2; exit 1
fi
run() { # repo label dir run
  if ! pgrep -x java >/dev/null 2>&1; then rm -rf /tmp/graft-ckpt-* /tmp/blockmgr-* 2>/dev/null; fi
  local S
  S=$(cd "$1" && SPARK_GRAFT_SF_DIR="$3" SPARK_GRAFT_ONLY=frac_diff SPARK_GRAFT_CPUS=32 \
    GRAFT_HEAP=24g tools/graftjava.sh graft.Bench 2>/dev/null | grep '"metric"' | tail -1 \
    | python3 -c "import json,sys; d=json.load(sys.stdin); print(d['queries']['frac_diff'], d['failed'])")
  if [ -z "$S" ]; then echo "FATAL: empty frac_diff run bin=$2 dir=$3" >&2; exit 1; fi
  echo "{\"bin\":\"$2\",\"q\":\"frac_diff\",\"dir\":\"$3\",\"run\":$4,\"sec_failed\":\"$S\"}" >> "$OUT"
  echo "done $2 $3 run $4"
}
for i in 1 2 3; do run "$HERE" new /tmp/graft_sf10 "$i"; done
for i in 1 2 3; do
  run "$HERE" new /tmp/graft_sf100 "$i"
  run "$R17" r17 /tmp/graft_sf100 "$i"
done
echo FD_R18_DONE
