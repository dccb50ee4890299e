#!/bin/bash
# r16 embeddings decade suite (r15 verdict #1/#2/#4/#5): all decades
# on the post-r16 binary — solo-3x driver queries (now incl.
# diversity_sample + ann_pq_topk), EmbedProbe production probes
# (dedup/topk with build-stage decomposition, plus the one-shot D4
# diversity production shape), and the EmbedAccount per-stage counts.
set -u
OUT=${1:-/tmp/emb_r16.jsonl}
cd "$(dirname "$0")/.." || exit 1
for d in emb_sf1 emb_sf10 emb_sf100; do
  for q in embed_dedup semantic_dedup ann_ivf_topk diversity_sample ann_pq_topk; do
    tools/solo3x.sh "/tmp/graft_$d" "$q" 3 24g "$OUT"
    echo "done $d $q"
  done
done
for d in emb_sf1 emb_sf10 emb_sf100; do
  for m in dedup topk diversity; do
    for i in 1 2; do
      if ! pgrep -x java >/dev/null 2>&1; then rm -rf /tmp/graft-ckpt-* /tmp/blockmgr-* /tmp/graft-embprobe* 2>/dev/null; fi
      L=$(SPARK_GRAFT_CPUS=32 GRAFT_HEAP=24g tools/graftjava.sh graft.EmbedProbe "/tmp/graft_$d" "$m" 2>/dev/null | grep build_sec | tail -1)
      echo "{\"probe\":\"$m\",\"dir\":\"$d\",\"run\":$i,\"r\":$L}" >> "$OUT"
    done
    echo "done probe $d $m"
  done
done
if ! pgrep -x java >/dev/null 2>&1; then rm -rf /tmp/graft-ckpt-* /tmp/blockmgr-* 2>/dev/null; fi
SPARK_GRAFT_CPUS=32 GRAFT_HEAP=24g tools/graftjava.sh graft.EmbedAccount \
  /tmp/graft_emb_sf1 /tmp/graft_emb_sf10 /tmp/graft_emb_sf100 2>/dev/null \
  | grep '"dir"' >> "$OUT"
echo EMB_R16_DONE
