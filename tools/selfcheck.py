#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

Registers each parquet table as a DuckDB view, runs every oracle SQL
from oracle_sql.json, and compares against the Spark parquet dumps:
row count, column names, and values (floats rounded).
"""
import json, sys, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def load_spark(outdir, name):
    files = glob.glob(os.path.join(outdir, name, "*.parquet"))
    if not files:
        return None
    return pq.read_table(files[0]).to_pandas()

def norm(df):
    # Driver-hash precision: no float rounding here. Calibration
    # (r4, vs CORRECTNESS_r03): queries the driver hash-matches differ
    # from DuckDB by <= 2.4e-14 relative (last-ulp FP noise); the one
    # it failed (rolling_features, float accumulate-subtract drift) was
    # orders of magnitude above that. rtol=1e-12 below separates the
    # two regimes; the old round-6/rtol-1e-6 gate let drift ship twice.
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            continue
        if "datetime" in str(df[c].dtype):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    return df.reset_index(drop=True)

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        got = load_spark(outdir, name)
        if got is None:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: cols {list(g.columns)} vs {list(e.columns)}"); n_fail += 1; continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}"); n_fail += 1; continue
        # order-insensitive compare (sort by all columns)
        g2 = g.sort_values(by=list(g.columns)).reset_index(drop=True)
        e2 = e.sort_values(by=list(e.columns)).reset_index(drop=True)
        try:
            pd.testing.assert_frame_equal(g2, e2, check_dtype=False, rtol=1e-12, atol=1e-12)
            # Signed-zero audit: the driver's byte hash distinguishes
            # -0.0 from +0.0 but rtol does not (0.0 == -0.0), which let
            # the r10 bet_size divergence through. For float columns,
            # flag any row where the values are == equal yet the IEEE
            # sign bits differ — exactly the ±0.0 case (nonzero equal
            # doubles always share a sign).
            sz_bad = []
            for c in g2.columns:
                gv, ev = g2[c].to_numpy(), e2[c].to_numpy()
                if gv.dtype.kind != "f" or ev.dtype.kind != "f":
                    continue
                m = (gv == ev) & (np.signbit(gv) != np.signbit(ev))
                if m.any():
                    sz_bad.append((c, int(m.sum())))
            if sz_bad:
                print(f"FAIL {name}: signed-zero divergence {sz_bad}"); n_fail += 1
            else:
                print(f"PASS {name} ({len(g)} rows)"); n_pass += 1
        except AssertionError as ex:
            print(f"FAIL {name}: {str(ex)[:500]}"); n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
