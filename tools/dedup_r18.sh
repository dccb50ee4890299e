#!/bin/bash
# r18 doc-dedup protocol (VERDICT r17 ask #3 + ADVICE codec item):
#  - the dedup_incremental interleaved conf-switched A/B at fd sf100
#    that SURVEY §6aa's OLD_INCR/NEW_INCR placeholder promised:
#    old = spark.graft.shingleExchangeBytes=0 (scaledShinglePartitions
#    off — the pre-r17 fixed-32-partition verify joins), new = default;
#  - the ISOLATED shingle-checkpoint codec A/B (exchange scaling at
#    default on BOTH sides; spark.graft.shingleCodec=none vs the r18
#    session-codec default) on dedup_minhash — this also gives the
#    committed raw series for the minhash scaling numbers quoted in
#    prose in r17.
# All runs: solo fresh JVMs, 24g heap, local[32], suite defaults.
set -u
OUT=${1:-/tmp/dedup_r18.jsonl}
DIR=${2:-/tmp/graft_fd_sf100}
cd "$(dirname "$0")/.." || exit 1
run() { # query conf label run
  if ! pgrep -x java >/dev/null 2>&1; then rm -rf /tmp/graft-ckpt-* /tmp/blockmgr-* /tmp/graft-incr* 2>/dev/null; fi
  local LINE SEC
  LINE=$(SPARK_GRAFT_SF_DIR="$DIR" SPARK_GRAFT_ONLY="$1" SPARK_GRAFT_CPUS=32 \
    GRAFT_HEAP=24g SPARK_GRAFT_CONF="$2" tools/graftjava.sh graft.Bench 2>/dev/null \
    | grep '"metric"' | tail -1)
  SEC=$(echo "$LINE" | python3 -c "import json,sys; d=json.load(sys.stdin); print(d['queries']['$1'], d['failed'])" 2>/dev/null)
  if [ -z "$SEC" ]; then echo "FATAL: empty run $1 $3" >&2; exit 1; fi
  echo "{\"ab\":\"$3\",\"q\":\"$1\",\"dir\":\"$DIR\",\"run\":$4,\"sec_failed\":\"$SEC\"}" >> "$OUT"
  echo "done $3 $1 run $4"
}
# 1. incremental-dedup scaling A/B (fills the §6aa placeholder row)
for i in 1 2; do
  run dedup_incremental "spark.graft.shingleExchangeBytes=0" incr_old "$i"
  run dedup_incremental "" incr_new "$i"
done
# 2. isolated codec-only A/B on the shingle checkpoints (minhash)
for i in 1 2; do
  run dedup_minhash "spark.graft.shingleCodec=none" codec_none "$i"
  run dedup_minhash "" codec_session "$i"
done
echo DEDUP_R18_DONE
