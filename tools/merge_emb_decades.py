#!/usr/bin/env python3
"""Fold /tmp/emb_decades.jsonl into BENCH_FD_DECADES.json as the
embeddings section (r14 verdict #3)."""
import json
import statistics
import sys

src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/emb_decades.jsonl"
dst = "BENCH_FD_DECADES.json"

runs = {}      # (decade, query) -> [sec]
probes = {}    # (decade, mode) -> [{build,incr,total}]
account = []
for line in open(src):
    line = line.strip()
    if not line:
        continue
    r = json.loads(line)
    if "sec_failed" in r:
        sec, failed = r["sec_failed"].split()
        assert failed == "0", line
        d = r["dir"].split("graft_")[-1]
        runs.setdefault((d, r["q"]), []).append(float(sec))
    elif "probe" in r:
        d = r["dir"]
        probes.setdefault((d, r["probe"]), []).append(r["r"])
    elif "vectors" in r:
        account.append(r)

out = {"queries": {}, "incremental_production": {}, "account": account}
for (d, q), ss in sorted(runs.items()):
    out["queries"].setdefault(q, {})[d] = {
        "solo_runs": ss, "median": round(statistics.median(ss), 2)}
for (d, m), rs in sorted(probes.items()):
    out["incremental_production"].setdefault(m, {})[d] = {
        "runs": rs,
        "median_total": round(statistics.median(x["total_sec"] for x in rs), 2),
        "median_build": round(statistics.median(x["build_sec"] for x in rs), 2),
        "median_incr": round(statistics.median(x["incr_sec"] for x in rs), 2)}
for q, decs in out["queries"].items():
    if "emb_sf10" in decs and "emb_sf1" in decs:
        decs["step_sf1_to_sf10"] = round(decs["emb_sf10"]["median"] / decs["emb_sf1"]["median"], 1)
    if "emb_sf100" in decs and "emb_sf10" in decs:
        decs["step_sf10_to_sf100"] = round(decs["emb_sf100"]["median"] / decs["emb_sf10"]["median"], 1)

bench = json.load(open(dst))
bench["embeddings"] = out
bench["embeddings"]["protocol"] = (
    "r14 verdict #3 + r15 6w: fixed-density embedding corpora "
    "(ScaleGen familySize=10, d=512, 2000 families at cosine 0.96-0.99, "
    "fresh Gaussians beyond; /tmp/graft_emb_sf1=20k, emb_sf10=200k, "
    "emb_sf100=2M vectors). Solo-3x fresh JVMs, 24g, local[32], committed "
    "value = median. queries = production-shaped driver queries via Bench "
    "(embed_dedup: autoLshParams; semantic_dedup: N/256 cells; ann_ivf_topk). "
    "incremental_production = graft.EmbedProbe: buildIndex(nCells=0 -> sqrtN "
    "cells) on 3/4 of the corpus + incremental semantic-dedup / top-k of the "
    "remaining 1/4 (the driver queries pin nCells=16 for oracle replay - a "
    "toy form at 2M vectors; the probe measures the production shape). "
    "account = EmbedAccount per-stage counts (bucket rows, raw candidate "
    "rows, distinct candidate pairs, verified output pairs). Binary: "
    "post-6w (LshBucketsExpr + NormalizeExpr + slim candidate join).")
json.dump(bench, open(dst, "w"), indent=1)
print(json.dumps(out["queries"], indent=1)[:1500])
