#!/bin/bash
# r14 verdict #3: embedding-family decade probe on the fixed-density
# corpora (/tmp/graft_emb_sf{1,10,100}). Solo-3x fresh JVMs per
# (decade, query) for the production-shaped driver queries, then the
# production incremental paths via EmbedProbe (nCells=0 -> sqrt(N)),
# then EmbedAccount stage counts per decade.
set -u
OUT=${1:-/tmp/emb_decades.jsonl}
cd "$(dirname "$0")/.." || exit 1
for d in emb_sf1 emb_sf10 emb_sf100; do
  for q in embed_dedup semantic_dedup ann_ivf_topk; do
    tools/solo3x.sh "/tmp/graft_$d" "$q" 3 24g "$OUT"
    echo "done $d $q"
  done
done
for d in emb_sf1 emb_sf10 emb_sf100; do
  for m in dedup topk; do
    for i in 1 2 3; do
      L=$(SPARK_GRAFT_CPUS=32 GRAFT_HEAP=24g tools/graftjava.sh graft.EmbedProbe "/tmp/graft_$d" "$m" 2>/dev/null | grep build_sec | tail -1)
      echo "{\"probe\":\"$m\",\"dir\":\"$d\",\"run\":$i,\"r\":$L}" >> "$OUT"
    done
    echo "done probe $d $m"
  done
done
SPARK_GRAFT_CPUS=32 GRAFT_HEAP=24g tools/graftjava.sh graft.EmbedAccount \
  /tmp/graft_emb_sf1 /tmp/graft_emb_sf10 /tmp/graft_emb_sf100 2>/dev/null \
  | grep '"dir"' >> "$OUT"
echo EMB_DECADES_DONE
