#!/usr/bin/env python3
"""Single-node baseline timings for the reference's benchmark scenarios.

polars itself cannot run in this container (zero egress, no wheel), so
the measurable baseline is the reference's OWN single-node comparison
implementations — the pandas twins polars-trading ships in
tests/testing_utils/ and polars_trading/_testing/ and benchmarks
against the plugin. This script imports those modules from
/root/reference (read-only) and times them on the shapes
tools/refbench_data.py generated; graft.RefBench times the Spark
operators on the identical parquet. fixed_time_return_classification
has no reference pandas twin, so an equivalent pandas implementation
lives here.

Usage: python3 tools/refbench_pd.py <datadir> [shapes...]
Prints one JSON object: {scenario: {shape: best_seconds}}.
"""
import json
import sys
import time

import pandas as pd

sys.path.insert(0, "/root/reference/tests")


def _load(name, path):
    # direct file import: polars_trading/__init__.py pulls in the Rust
    # extension, which isn't built here — the _testing twins themselves
    # are pure pandas/numpy
    import importlib.util

    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


_bars = _load("pd_bars_helpers", "/root/reference/tests/testing_utils/pd_bars_helpers.py")
_feat = _load("ref_features", "/root/reference/polars_trading/_testing/features.py")
_lab = _load("ref_labels", "/root/reference/polars_trading/_testing/labels.py")
pandas_dollar_bars = _bars.pandas_dollar_bars
pandas_tick_bars = _bars.pandas_tick_bars
pandas_time_bars = _bars.pandas_time_bars
pandas_volume_bars = _bars.pandas_volume_bars
frac_diff_ffd = _feat.frac_diff_ffd
get_daily_vol = _lab.get_daily_vol


def fixed_time_return_classification(df: pd.DataFrame, window: int, thr: float):
    # independent pandas equivalent (not reference code): per symbol,
    # forward `window`-row return, 3-way label at +-thr
    out = []
    for _, g in df.sort_values(["symbol", "ts_event", "trade_id"]).groupby("symbol"):
        r = g["price"].shift(-window) / g["price"] - 1
        lab = pd.Series(0, index=g.index)
        lab[r > thr] = 1
        lab[r < -thr] = -1
        lab[r.isna()] = pd.NA
        out.append(pd.DataFrame({"symbol": g["symbol"], "label": lab}))
    return pd.concat(out)


SCENARIOS = {
    # name -> (companies, fn)
    "time_bars": (5, lambda df: pandas_time_bars(df, "1min")),
    "tick_bars": (5, lambda df: pandas_tick_bars(df, 100)),
    "volume_bars": (5, lambda df: pandas_volume_bars(df, 10_000)),
    "dollar_bars": (5, lambda df: pandas_dollar_bars(df, 1_000_000)),
    "frac_diff": (
        3,
        lambda df: df.set_index("ts_event")
        .groupby("symbol")[["price"]]
        .apply(frac_diff_ffd, 0.5, 1e-3)
        .reset_index(),
    ),
    "daily_vol": (
        5,
        lambda df: df.set_index("ts_event")
        .groupby("symbol")["price"]
        .apply(get_daily_vol, 100)
        .reset_index(),
    ),
    "fixed_time_return_class": (
        5,
        lambda df: fixed_time_return_classification(df, 50, 0.2),
    ),
}


def best_of(fn, df, rounds=3):
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        fn(df)
        best = min(best, time.perf_counter() - t0)
        if best > 60:  # slow python loop — one round is representative
            break
    return best


def main(datadir: str, sizes):
    out = {}
    for name, (comp, fn) in SCENARIOS.items():
        out[name] = {}
        for n in sizes:
            if name in ("volume_bars", "dollar_bars") and n > 100_000:
                # the reference's pandas twins are per-row python loops
                # (~67 s at 10k): a 1M run would take ~2 h. Record the
                # linear extrapolation instead (the loop is O(n)).
                small = out[name].get("10000")
                if isinstance(small, float):
                    out[name][str(n)] = f"extrapolated:{round(small * n / 10_000, 1)}"
                continue
            # frac_diff/daily_vol: the reference twins index by
            # timestamp and crash on duplicates, which the mimesis
            # second-resolution shape guarantees at 1M rows — use the
            # unique-microsecond variant there (suffix recorded)
            suffix = "u" if name in ("frac_diff", "daily_vol") and n > 100_000 else ""
            df = pd.read_parquet(f"{datadir}/s{n}c{comp}{suffix}/trades.parquet")
            key = str(n) + suffix
            try:
                out[name][key] = round(best_of(fn, df), 4)
            except Exception as e:  # noqa: BLE001 — record, keep measuring
                out[name][key] = f"error: {type(e).__name__}: {e}"
            print(f"{name} n={key}: {out[name][key]}", file=sys.stderr)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    datadir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_refbench"
    sizes = [int(s) for s in sys.argv[2:]] or [10_000, 1_000_000]
    main(datadir, sizes)
