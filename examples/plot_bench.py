#!/usr/bin/env python3
"""Scrape bench output into a QPS-recall plot (reference: examples/plot_bench.py).

Usage: python examples/bench.py data.npy | tee out.log
       python examples/plot_bench.py out.log plot.png
"""

import re
import sys

import numpy as np


def parse(path):
    """Parse 'recall10@10=R  QPS=Q' lines into series split by builds."""
    series, cur = [], []
    pat = re.compile(r"recall\d+@\d+=([\d.]+)\s+QPS=([\d,.]+)")
    for line in open(path):
        if line.startswith("[build]") and cur:
            series.append(cur)
            cur = []
        if m := pat.search(line):
            cur.append((float(m.group(1)),
                        float(m.group(2).replace(",", ""))))
    if cur:
        series.append(cur)
    return series


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "bench.log"
    dst = sys.argv[2] if len(sys.argv) > 2 else "plot.png"
    series = parse(src)
    if not series:
        sys.exit(f"no data points found in {src}")
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(7, 5))
    for i, pts in enumerate(series, 1):
        pts = sorted(pts)
        ax.plot([r for r, _ in pts], [q for _, q in pts],
                marker="o", label=f"build_probes={i}")
    # the reference's published CPU sweep points on the same workload
    # (reference README.md:132-135) — the baseline this build is
    # measured against; its README Annoy comparison spans
    # recall 0.3-0.93 at 100-6,000 QPS (examples/plot_bench.py:33-36)
    ax.plot([0.37403, 0.50214], [4727.14, 3965.61], marker="s",
            linestyle="--", color="gray",
            label="tinyknn (Cython/AVX, CPU, published)")
    ax.set_yscale("log")
    ax.set_xlabel("Recall@10")
    ax.set_ylabel("Queries per second")
    ax.set_title("tinyknn_tpu QPS vs recall")
    ax.legend()
    ax.grid(True, alpha=0.3)
    fig.savefig(dst, dpi=120, bbox_inches="tight")
    print(f"wrote {dst} ({sum(len(s) for s in series)} points, "
          f"{len(series)} builds)")


if __name__ == "__main__":
    main()
