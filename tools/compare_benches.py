#!/usr/bin/env python
"""Compare two bench result files into a Markdown table with uncertainty.

Counterpart of the reference's `tools/compare_benches.r:24-48`: given two
files of per-run throughput numbers (one per line, produced by
`examples/bench_decode.py` piped through awk, or bench.py JSON lines), it
prints before/after means, propagated standard error, and the ratio.

Usage: python tools/compare_benches.py BEFORE.txt AFTER.txt
"""

import json
import math
import pathlib
import sys


def load(path):
    vals = []
    for line in pathlib.Path(path).read_text().splitlines():
        line = line.strip()
        if not line:
            continue
        try:
            vals.append(float(json.loads(line)["value"]))
        except (ValueError, KeyError, json.JSONDecodeError):
            try:
                vals.append(float(line.split()[0]))
            except (ValueError, IndexError):
                pass
    if not vals:
        raise SystemExit(f"no numbers found in {path}")
    return vals


def mean_sem(vals):
    n = len(vals)
    mu = sum(vals) / n
    if n < 2:
        return mu, 0.0
    var = sum((v - mu) ** 2 for v in vals) / (n - 1)
    return mu, math.sqrt(var / n)


def main(argv):
    if len(argv) != 2:
        print(__doc__)
        return 1
    (a, sa), (b, sb) = mean_sem(load(argv[0])), mean_sem(load(argv[1]))
    ratio = b / a
    # First-order error propagation for the ratio (compare_benches.r:36-44).
    sr = ratio * math.sqrt((sa / a) ** 2 + (sb / b) ** 2) if a and b else 0.0
    print("| | before | after | ratio |")
    print("|---|---|---|---|")
    print(f"| mean ± sem | {a:.3f} ± {sa:.3f} | {b:.3f} ± {sb:.3f} | "
          f"{ratio:.3f} ± {sr:.3f} |")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
