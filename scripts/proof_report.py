"""Summarize a zoo-proof run from its per-scene metric files.

The end-to-end CLI proof (zoo/README.md) scores each held-out scene with
the reference's own ``Metrics`` output (``<raw>.aligned.txt``, byte-format
per Depth.h:197-243).  This tool walks one or more result folders, parses
those files, and reports per-scene RMSE given->result plus the summary the
proof ledger records (improved count, mean RMSE before/after).

Usage:
    python scripts/proof_report.py /tmp/proof_p99approx_v1 [more dirs...]

Emits one human table per folder and one JSON line per folder on stdout
(so A/B runs can be diffed mechanically).
"""

from __future__ import annotations

import glob
import json
import math
import os
import sys


def parse_aligned(path: str) -> dict:
    vals = {}
    with open(path) as fp:
        for line in fp:
            if ":" not in line:
                continue
            key, _, raw = line.partition(":")
            key = key.strip()
            if key.endswith(("_given", "_result")):
                vals[key] = float(raw)
    return vals


def report(folder: str) -> dict:
    files = sorted(glob.glob(os.path.join(folder, "*.aligned.txt")))
    if not files:
        print(f"{folder}: no .aligned.txt metric files", file=sys.stderr)
        return {"folder": folder, "count": 0}
    rows, improved = [], 0
    sum_g = sum_r = 0.0
    for f in files:
        v = parse_aligned(f)
        rg, rr = math.sqrt(v["mse_given"]), math.sqrt(v["mse_result"])
        improved += rr < rg
        sum_g += rg
        sum_r += rr
        rows.append((os.path.basename(f)[: -len(".aligned.txt")], rg, rr))
    print(f"== {folder}")
    for name, rg, rr in rows:
        mark = "+" if rr < rg else "-"
        print(f"  {mark} {name}: RMSE {rg:.5f} -> {rr:.5f}"
              f" ({(rr - rg) / rg * 100:+.1f}%)")
    mean_g, mean_r = sum_g / len(rows), sum_r / len(rows)
    summary = {
        "folder": folder,
        "count": len(rows),
        "improved": improved,
        "mean_rmse_given": round(mean_g, 6),
        "mean_rmse_result": round(mean_r, 6),
        "mean_delta_pct": round((mean_r - mean_g) / mean_g * 100, 2),
    }
    print(json.dumps(summary))
    return summary


def main(argv: list[str]) -> int:
    if not argv:
        print(__doc__)
        return 2
    for folder in argv:
        report(folder)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
