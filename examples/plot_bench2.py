#!/usr/bin/env python3
"""AUC-per-build_probes summary plot (reference: examples/plot_bench2.py).

Usage: python examples/plot_bench2.py out.log plot2.png
Parses 'Area under the curve' lines emitted by examples/bench.py.
"""

import re
import sys


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "bench.log"
    dst = sys.argv[2] if len(sys.argv) > 2 else "plot2.png"
    aucs = [float(m.group(1)) for m in
            re.finditer(r"Area under the curve from [\d./]+ to 1: ([\d.]+)",
                        open(src).read())]
    if not aucs:
        sys.exit(f"no AUC lines found in {src}")
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.bar(range(1, len(aucs) + 1), aucs)
    ax.set_xlabel("build_probes")
    ax.set_ylabel("QPS-recall AUC (recall 0.5..1)")
    ax.set_title("tinyknn_tpu: AUC by build_probes")
    fig.savefig(dst, dpi=120, bbox_inches="tight")
    print(f"wrote {dst} ({len(aucs)} builds)")


if __name__ == "__main__":
    main()
