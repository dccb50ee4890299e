#!/bin/bash
# Solo-3x fresh-JVM bench runs for one query at one sfDir.
# Usage: tools/solo3x.sh <sfDir> <query> [nRuns=3] [heap=24g] [out=/tmp/solo3x.jsonl]
# Appends one JSON line per run: {"q":..,"dir":..,"sec":..,"failed":N}
set -u
DIR=$1; Q=$2; N=${3:-3}; HEAP=${4:-24g}; OUT=${5:-/tmp/solo3x.jsonl}
cd "$(dirname "$0")/.." || exit 1
for i in $(seq 1 "$N"); do
  # killed runs leak blockmgr/checkpoint scratch; reclaim it ONLY when
  # no JVM is alive (a blanket rm once deleted a concurrent test JVM's
  # live shuffle dirs - never again)
  if ! pgrep -x java >/dev/null 2>&1; then
    rm -rf /tmp/graft-ckpt-* /tmp/blockmgr-* /tmp/graft-embprobe* 2>/dev/null
  fi
  LINE=$(SPARK_GRAFT_SF_DIR="$DIR" SPARK_GRAFT_ONLY="$Q" SPARK_GRAFT_CPUS=32 \
    GRAFT_HEAP="$HEAP" tools/graftjava.sh graft.Bench 2>/dev/null | grep '"metric"' | tail -1)
  SEC=$(echo "$LINE" | python3 -c "import json,sys; d=json.load(sys.stdin); print(d['queries']['$Q'], d['failed'])" 2>/dev/null)
  echo "{\"q\":\"$Q\",\"dir\":\"$DIR\",\"run\":$i,\"sec_failed\":\"$SEC\"}" >> "$OUT"
done
