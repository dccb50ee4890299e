#!/bin/bash
# r18 embeddings protocol (VERDICT r17 asks #1/#4/#7):
#  - interleaved same-binary A/B of the tiled k-means/assignment
#    kernels (spark.graft.fusedKmeans / spark.graft.tiledAssign off =
#    the r17 expression+sumByKey path) via EmbedProbe dedup at fd
#    sf100 — build_stages carries kmeans_round_* and assign_write;
#  - interleaved A/B of the 4-wide SemDedup kernel tile
#    (GRAFT_SEMDEDUP_TILED=false = the r17 scalar candidate loop) via
#    EmbedProbe semstage at fd sf100 — score_streamed is the stage;
#  - CellSkew census (committed artifact — r17 ask #4's first step);
#  - solo-3x refresh of the decade rows the diff touches
#    (semantic_dedup driver query at sf100; EmbedProbe topk sf100);
#  - ann_pq_topk emb_sf1 re-runs (r17 ask #7: two cells scraped empty).
set -u
OUT=${1:-/tmp/emb_r18.jsonl}
cd "$(dirname "$0")/.." || exit 1
clean() { if ! pgrep -x java >/dev/null 2>&1; then rm -rf /tmp/graft-ckpt-* /tmp/blockmgr-* /tmp/graft-embprobe* /tmp/graft-semstage* 2>/dev/null; fi; }
OLDCONF="spark.graft.fusedKmeans=false;spark.graft.tiledAssign=false"
probe() { # mode conf tiledEnv label run
  clean
  local L
  L=$(SPARK_GRAFT_CPUS=32 GRAFT_HEAP=24g SPARK_GRAFT_CONF="$2" GRAFT_SEMDEDUP_TILED="$3" \
    tools/graftjava.sh graft.EmbedProbe /tmp/graft_emb_sf100 "$1" 2>/dev/null | grep total_sec | tail -1)
  if [ -z "$L" ]; then echo "FATAL: empty probe $1 $4" >&2; exit 1; fi
  echo "{\"ab\":\"$4\",\"run\":$5,\"r\":$L}" >> "$OUT"
  echo "done $4 run $5"
}
# 1. kernels A/B, interleaved (old runs restore BOTH r17 paths)
for i in 1 2; do
  probe dedup "$OLDCONF" false old_kernels "$i"
  probe dedup "" true new_kernels "$i"
done
probe dedup "" true new_kernels 3
# 2. score-tile A/B (semstage: score_streamed stage), interleaved
for i in 1 2; do
  probe semstage "" false old_score "$i"
  probe semstage "" true new_score "$i"
done
probe semstage "" true new_score 3
# 3. census (one run; the numbers in CellSkew's doc get an artifact)
clean
SPARK_GRAFT_CPUS=32 GRAFT_HEAP=24g tools/graftjava.sh graft.CellSkew /tmp/graft_emb_sf100 2>/dev/null \
  | tail -5 > /tmp/cellskew_r18.txt
echo "census done"
# 4. decade-row refreshes on the new binary (solo-3x medians)
tools/solo3x.sh /tmp/graft_emb_sf100 semantic_dedup 3 24g "$OUT"
for i in 1 2 3; do probe topk "" true topk_sf100 "$i"; done
# 5. ann_pq_topk emb_sf1 (3 full runs — r17 had n_failed: 2 there)
tools/solo3x.sh /tmp/graft_emb_sf1 ann_pq_topk 3 24g "$OUT"
echo EMB_R18_DONE
