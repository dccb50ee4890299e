#!/bin/bash
# r17 embeddings decade suite (r16 verdict #1/#2): all decades on the
# post-r17 binary — solo-3x driver queries, EmbedProbe production
# probes at a FULL 3-run protocol (the r16 artifact ran 2 and labeled
# it solo-3x — verdict ask #2), the NEW semanticDedupStaged
# decomposition with the streamed-vs-aggregation scoring A/B, and the
# EmbedAccount per-stage counts.
set -u
OUT=${1:-/tmp/emb_r17.jsonl}
cd "$(dirname "$0")/.." || exit 1
for d in emb_sf1 emb_sf10 emb_sf100; do
  for q in embed_dedup semantic_dedup ann_ivf_topk diversity_sample ann_pq_topk; do
    tools/solo3x.sh "/tmp/graft_$d" "$q" 3 24g "$OUT"
    echo "done $d $q"
  done
done
# production probes + the r17 staged/scoring A/B — 3 runs each
for d in emb_sf1 emb_sf10 emb_sf100; do
  for m in dedup topk diversity semstage semstage_agg; do
    for i in 1 2 3; do
      if ! pgrep -x java >/dev/null 2>&1; then rm -rf /tmp/graft-ckpt-* /tmp/blockmgr-* /tmp/graft-embprobe* /tmp/graft-semstage* 2>/dev/null; fi
      L=$(SPARK_GRAFT_CPUS=32 GRAFT_HEAP=24g tools/graftjava.sh graft.EmbedProbe "/tmp/graft_$d" "$m" 2>/dev/null | grep total_sec | tail -1)
      echo "{\"probe\":\"$m\",\"dir\":\"$d\",\"run\":$i,\"r\":$L}" >> "$OUT"
    done
    echo "done probe $d $m"
  done
done
if ! pgrep -x java >/dev/null 2>&1; then rm -rf /tmp/graft-ckpt-* /tmp/blockmgr-* 2>/dev/null; fi
SPARK_GRAFT_CPUS=32 GRAFT_HEAP=24g tools/graftjava.sh graft.EmbedAccount \
  /tmp/graft_emb_sf1 /tmp/graft_emb_sf10 /tmp/graft_emb_sf100 2>/dev/null \
  | grep '"dir"' >> "$OUT"
echo EMB_R17_DONE
