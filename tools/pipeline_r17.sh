#!/bin/bash
# r16 verdict #4: composed-pipeline decade probe. Solo fresh JVMs,
# 3 runs per (chain, decade); one JSON line per stage per run.
# docs chain decades: /tmp/graft_fd_sf10 (500k docs) /
# /tmp/graft_fd_sf100 (5M docs), tick_qc gate from /tmp/graft_sf1 /
# /tmp/graft_sf10 events (10M / 100M ticks).
# emb chain decades: /tmp/graft_emb_sf10 (200k) / emb_sf100 (2M).
set -u
OUT=${1:-/tmp/pipeline_r17.jsonl}
cd "$(dirname "$0")/.." || exit 1
run() { # mode dir eventsDir runIdx
  if ! pgrep -x java >/dev/null 2>&1; then rm -rf /tmp/graft-pipe* /tmp/graft-ckpt-* /tmp/blockmgr-* 2>/dev/null; fi
  SPARK_GRAFT_CPUS=32 GRAFT_HEAP=24g tools/graftjava.sh graft.PipelineProbe "$1" "$2" $3 2>/dev/null \
    | grep '"stage"' | sed "s/}$/,\"run\":$4}/" >> "$OUT"
}
for i in 1 2 3; do
  run docs /tmp/graft_fd_sf10 /tmp/graft_sf1 "$i"
  echo "done docs sf10 run $i"
done
for i in 1 2 3; do
  run docs /tmp/graft_fd_sf100 /tmp/graft_sf10 "$i"
  echo "done docs sf100 run $i"
done
for i in 1 2 3; do
  run emb /tmp/graft_emb_sf10 "" "$i"
  echo "done emb sf10 run $i"
done
for i in 1 2 3; do
  run emb /tmp/graft_emb_sf100 "" "$i"
  echo "done emb sf100 run $i"
done
echo PIPELINE_R17_DONE
