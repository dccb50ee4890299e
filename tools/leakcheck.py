#!/usr/bin/env python3
"""Leak scan: no proprietary/internal references may appear in the tree.

Writes LEAKCHECK.json with the scanned tree hash and a UTC timestamp so
each round's 0-hits claim is provably from a fresh scan of that exact
tree (round-9 advice: a hand-bumped round number is indistinguishable
from a re-run).

Usage: python3 tools/leakcheck.py <round>
"""
import json
import re
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

PATTERNS = {
    # non-public package roots / imports
    "internal-import": re.compile(r"\bimport\s+(com\.anthropic|ant\.|internal\.|corp\.)"),
    "internal-url": re.compile(r"https?://[^\s\"')]*\b(corp|internal|intranet|\.ant\b)[^\s\"')]*"),
    "internal-pkg2": re.compile(r"anthropic", re.IGNORECASE),
    # object-store buckets (none should exist: zero egress, local parquet only)
    "internal-bucket": re.compile(r"\b(s3a?|gs|abfss?)://[A-Za-z0-9._-]+"),
    "slack-link": re.compile(r"slack\.com|\bgo/[a-z][a-z0-9-]+\b"),
    "api-key": re.compile(r"\b(sk-[A-Za-z0-9]{20,}|AKIA[0-9A-Z]{16}|AIza[0-9A-Za-z_-]{30,})\b"),
    "axon-env": re.compile(r"\bAXON_[A-Z_]+\b"),
}

SCAN_GLOBS = ["src/**/*.scala", "*.md", "build.sbt", "tools/**/*.py", ".claude/**/*.md"]


def main() -> None:
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    hits = {k: [] for k in PATTERNS}
    for g in SCAN_GLOBS:
        for p in sorted(ROOT.glob(g)):
            # the scanner's own pattern table would self-match
            if not p.is_file() or p.resolve() == Path(__file__).resolve():
                continue
            try:
                text = p.read_text(errors="replace")
            except OSError:
                continue
            for i, line in enumerate(text.splitlines(), 1):
                for key, rx in PATTERNS.items():
                    if rx.search(line):
                        hits[key].append(f"{p.relative_to(ROOT)}:{i}: {line.strip()[:160]}")
    tree = subprocess.run(
        ["git", "-C", str(ROOT), "rev-parse", "HEAD^{tree}"],
        capture_output=True, text=True).stdout.strip()
    dirty = subprocess.run(
        ["git", "-C", str(ROOT), "status", "--porcelain"],
        capture_output=True, text=True).stdout.strip() != ""
    out = {
        "round": rnd,
        "scanned_at_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "head_tree": tree + ("+dirty" if dirty else ""),
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    (ROOT / "LEAKCHECK.json").write_text(json.dumps(out, indent=2) + "\n")
    print(f"LEAKCHECK: {out['n_hits']} hits, tree {out['head_tree']}")
    sys.exit(1 if out["n_hits"] else 0)


if __name__ == "__main__":
    main()
