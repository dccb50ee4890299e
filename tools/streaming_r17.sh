#!/bin/bash
# r16 verdict #7: streaming-twin throughput probe. Solo fresh JVMs,
# 3 runs per (twin, decade); one JSON line per run.
# bars reads events (fd sf1 = 10M ticks, sf10 = 100M);
# minhash/vidx read documents/embeddings fd decades.
set -u
OUT=${1:-/tmp/streaming_r17.jsonl}
cd "$(dirname "$0")/.." || exit 1
run() { # dir mode runIdx
  if ! pgrep -x java >/dev/null 2>&1; then rm -rf /tmp/graft-sbench* /tmp/graft-ckpt-* /tmp/blockmgr-* 2>/dev/null; fi
  SPARK_GRAFT_CPUS=32 GRAFT_HEAP=24g tools/graftjava.sh graft.StreamingBench "$1" "$2" 2>/dev/null \
    | grep rows_per_sec | sed "s/}$/,\"run\":$3}/" >> "$OUT"
}
for i in 1 2 3; do
  run /tmp/graft_sf1 bars "$i"
  run /tmp/graft_sf10 bars "$i"
  run /tmp/graft_fd_sf10 minhash "$i"
  run /tmp/graft_fd_sf100 minhash "$i"
  run /tmp/graft_emb_sf1 vidx "$i"
  run /tmp/graft_emb_sf10 vidx "$i"
  echo "done streaming round $i"
done
echo STREAMING_R17_DONE
