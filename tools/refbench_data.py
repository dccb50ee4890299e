#!/usr/bin/env python3
"""Generate trade data in the reference benchmark's shape.

Mirrors polars-trading's `generate_trade_data(n_rows, n_companies)`
fixture (see /root/reference/polars_trading/_testing/data.py):
unsorted random event timestamps over ~25 years, 2-decimal prices
uniform in [1, 100], integer sizes in [10_000, 100_000], symbols drawn
from n_companies fake tickers — plus a trade_id row index (this
engine's deterministic tie-breaker; the reference relies on implicit
row order instead).

Usage: python3 tools/refbench_data.py <outdir>
Writes <outdir>/s{N}c{C}/trades.parquet for each benchmark shape.
"""
import os
import string
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# the reference's published grid (10k rows), plus the same scenarios
# at 100x, where a distributed engine's overheads must amortize.
# unique_us=True adds sub-second jitter: at 1M rows the second-
# resolution mimesis shape guarantees duplicate timestamps, which the
# reference's own pandas frac_diff/daily_vol twins crash on — the
# 'u'-suffixed variants keep those scenarios measurable at 100x.
SHAPES = [
    (10_000, 5, False),
    (10_000, 3, False),
    (1_000_000, 5, False),
    (1_000_000, 3, False),
    (1_000_000, 5, True),
    (1_000_000, 3, True),
]


def gen(n_rows: int, n_companies: int, unique_us: bool, seed: int = 42) -> pa.Table:
    rng = np.random.default_rng(seed + n_rows + n_companies)
    tickers = []
    while len(tickers) < n_companies:
        t = "".join(rng.choice(list(string.ascii_uppercase), size=4))
        if t not in tickers:
            tickers.append(t)
    lo = np.datetime64("2000-01-01T00:00:00").astype("datetime64[s]").astype(np.int64)
    hi = np.datetime64("2025-01-01T00:00:00").astype("datetime64[s]").astype(np.int64)
    ts = rng.integers(lo, hi, size=n_rows) * 1_000_000  # microseconds
    if unique_us:
        # sub-second jitter: collisions need equal (second, us) — over
        # 25 years of seconds x 1e6 offsets the space is ~8e14, so 1M
        # draws are unique with overwhelming probability; assert it
        ts = ts + rng.integers(0, 1_000_000, size=n_rows)
        assert len(np.unique(ts)) == n_rows, "timestamp collision — bump the seed"
    price = np.round(rng.uniform(1.0, 100.0, size=n_rows), 2)
    size = rng.integers(10_000, 100_001, size=n_rows)
    sym = rng.choice(tickers, size=n_rows)
    return pa.table(
        {
            "ts_event": pa.array(ts, type=pa.timestamp("us")),
            "price": pa.array(price, type=pa.float64()),
            "size": pa.array(size, type=pa.int64()),
            "symbol": pa.array(sym, type=pa.string()),
            "trade_id": pa.array(np.arange(n_rows), type=pa.int64()),
        }
    )


def main(outdir: str) -> None:
    for n, c, uq in SHAPES:
        d = os.path.join(outdir, f"s{n}c{c}" + ("u" if uq else ""))
        os.makedirs(d, exist_ok=True)
        # 64k-row groups, NOT the writer default (one giant group):
        # parquet row groups are Spark's scan-split granularity — a
        # single-row-group 1M-row file pins the entire map side (scan +
        # partial aggregation) to ONE task regardless of split count,
        # which benchmarked the engine's single-core floor instead of
        # the operator (time_bars 1M: 1.62 s -> 0.81 s from this alone).
        # Any production layout has many row groups per scan; the
        # miniature must too. pandas timings are unaffected (the twin
        # loads the frame once, outside the timed region).
        pq.write_table(gen(n, c, uq), os.path.join(d, "trades.parquet"), row_group_size=65536)
        print(f"wrote {d}/trades.parquet ({n} rows, {c} companies, unique_us={uq})")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_refbench")
