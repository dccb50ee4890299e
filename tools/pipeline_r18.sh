#!/bin/bash
# r18 run of the composed-pipeline decade probe (r16 verdict ask #4,
# r17 verdict ask #5 — the r17 harness ran but its results were never
# committed). Same chains and decades as tools/pipeline_r17.sh; the
# sf10 cells run 2 solo rounds and the sf100 cells 1 round (wall-clock budget of
# the final optimization round — per-run raws are committed, and the
# artifact records the run count per cell honestly).
set -u
OUT=${1:-/tmp/pipeline_r18.jsonl}
cd "$(dirname "$0")/.." || exit 1
run() { # mode dir eventsDir runIdx
  if ! pgrep -x java >/dev/null 2>&1; then rm -rf /tmp/graft-pipe* /tmp/graft-ckpt-* /tmp/blockmgr-* 2>/dev/null; fi
  SPARK_GRAFT_CPUS=32 GRAFT_HEAP=24g tools/graftjava.sh graft.PipelineProbe "$1" "$2" $3 2>/dev/null \
    | grep '"stage"' | sed "s/}$/,\"run\":$4}/" >> "$OUT"
}
for i in 1 2; do run docs /tmp/graft_fd_sf10 /tmp/graft_sf1 "$i"; echo "done docs sf10 run $i"; done
for i in 1; do run docs /tmp/graft_fd_sf100 /tmp/graft_sf10 "$i"; echo "done docs sf100 run $i"; done
for i in 1 2; do run emb /tmp/graft_emb_sf10 "" "$i"; echo "done emb sf10 run $i"; done
for i in 1; do run emb /tmp/graft_emb_sf100 "" "$i"; echo "done emb sf100 run $i"; done
echo PIPELINE_R18_DONE
