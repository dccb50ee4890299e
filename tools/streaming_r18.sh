#!/bin/bash
# r18 run of the streaming-twin throughput probe (r16 verdict ask #7,
# r17 verdict ask #5 — harness committed r17, results never were).
# Same twins and decades as tools/streaming_r17.sh; the two largest
# cells (bars sf10, minhash fd_sf100) run 1 round, small cells 2
# (wall-clock budget; run counts recorded in the artifact).
set -u
OUT=${1:-/tmp/streaming_r18.jsonl}
cd "$(dirname "$0")/.." || exit 1
run() { # dir mode runIdx
  if ! pgrep -x java >/dev/null 2>&1; then rm -rf /tmp/graft-sbench* /tmp/graft-ckpt-* /tmp/blockmgr-* 2>/dev/null; fi
  SPARK_GRAFT_CPUS=32 GRAFT_HEAP=24g tools/graftjava.sh graft.StreamingBench "$1" "$2" 2>/dev/null \
    | grep rows_per_sec | sed "s/}$/,\"run\":$3}/" >> "$OUT"
}
for i in 1 2; do
  run /tmp/graft_sf1 bars "$i"
  run /tmp/graft_fd_sf10 minhash "$i"
  run /tmp/graft_emb_sf1 vidx "$i"
  run /tmp/graft_emb_sf10 vidx "$i"
  echo "done streaming small round $i"
done
for i in 1; do
  run /tmp/graft_sf10 bars "$i"
  run /tmp/graft_fd_sf100 minhash "$i"
  echo "done streaming large round $i"
done
echo STREAMING_R18_DONE
