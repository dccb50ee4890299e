#!/bin/bash
# sf100 leg of the embeddings decade probe (restarted after the
# generated-code package fix), then EmbedProbe + EmbedAccount.
set -u
OUT=${1:-/tmp/emb_decades.jsonl}
cd "$(dirname "$0")/.." || exit 1
for q in embed_dedup semantic_dedup ann_ivf_topk; do
  tools/solo3x.sh /tmp/graft_emb_sf100 "$q" 3 24g "$OUT"
  echo "done emb_sf100 $q"
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
echo EMB_SF100_DONE
