#!/usr/bin/env python3
"""Stream qc-capacity guidance table (round-4 VERDICT item: weak 7).

``query_stream`` self-tunes its bucket capacities by default
(``adaptive_qc``: a one-time per-shape load pre-pass plus a free
drop-counter guard); pinning ``queries_per_cluster`` disables that in
favor of a fixed capacity. This measures, on the cached GloVe index
with its naturally clustered queries, what the adaptive default and
each pinned qc multiple of the heuristic cost and buy: dropped
(query, probe) pairs, recall10@10, and the marginal per-batch time —
the numbers behind docs/PERFORMANCE.md's stream-capacity table.

Usage: python examples/stream_guidance.py [--probes 3 10]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from tinyknn_tpu import utils                     # noqa: E402
from tinyknn_tpu.io import load_ivf               # noqa: E402
from tinyknn_tpu.models.ivf import default_qc0    # noqa: E402

parser = argparse.ArgumentParser()
parser.add_argument("--probes", type=int, nargs="+", default=[3, 10])
parser.add_argument("--k", type=int, default=10)
parser.add_argument("--mult", type=float, default=4.0)
parser.add_argument("--qc-mults", type=float, nargs="+",
                    default=[1.0, 2.0, 4.0])
parser.add_argument("--reps", type=int, nargs=2, default=[4, 12])
parser.add_argument("--scan-impl", default=None,
                    choices=["auto", "fused", "xla", "exact"])
parser.add_argument("--index", default="ivf_clustered-1183514-100_"
                    "angular_num_clusters=1087_dims_per_block=2_"
                    "build_probes=1.npz")
args = parser.parse_args()

utils.enable_compilation_cache()

print("loading index...", flush=True)
ivf = load_ivf(args.index)
if args.scan_impl is not None:
    ivf.set_scan_impl(args.scan_impl)

size, dim, nq = 1183514, 100, 10000
_, queries = utils.make_clustered(size, dim, nq)

trus_file = ("trus_clustered-1183514-100_k_neighbours=10_"
             "num_queries=10000_metric='angular'.npy")
trus = np.load(trus_file) if os.path.isfile(trus_file) else None

k = args.k
R1, R2 = args.reps
n_active = int(ivf.active_centers.shape[0])
qb1 = queries[None] + (np.arange(R1, dtype=np.float32)
                       [:, None, None] * 1e-6)
qb2 = queries[None] + (np.arange(R2, dtype=np.float32)
                       [:, None, None] * 1e-6)

for P in args.probes:
    p1 = int(args.mult * ((P + 1) * k + 1)) or None
    # the same mean-load heuristic IVF.query starts from
    qc_heur = max(8, 8 * ((5 * nq * P // (2 * n_active)) // 8 + 1))
    qc0_heur = default_qc0(nq, n_active)
    for m in ["auto"] + args.qc_mults:
        if m == "auto":
            # the adaptive default: load pre-pass sizes the capacity
            # (one-time per shape), free drop counter guards drift
            ivf.queries_per_cluster = None
            ivf._stream_qc_floors = {}
        else:
            ivf.queries_per_cluster = int(max(qc_heur, qc0_heur) * m
                                          + 7) // 8 * 8
        out, stats = ivf.query_stream(qb1, k=k, n_probes=P, pass_1=p1,
                                      with_stats=True)
        out = np.asarray(out)
        np.asarray(ivf.query_stream(qb2, k=k, n_probes=P, pass_1=p1))
        t1 = t2 = float("inf")
        for _ in range(3):
            t0 = time.time()
            np.asarray(ivf.query_stream(qb1, k=k, n_probes=P, pass_1=p1))
            t1 = min(t1, time.time() - t0)
            t0 = time.time()
            np.asarray(ivf.query_stream(qb2, k=k, n_probes=P, pass_1=p1))
            t2 = min(t2, time.time() - t0)
        marginal = (t2 - t1) / (R2 - R1)
        dropped = stats["dropped_probe_pairs"]
        total = stats["total_probe_pairs"]
        qc_lbl = ("auto" if m == "auto"
                  else f"{ivf.queries_per_cluster:>4} ({m:.0f}x heur)")
        line = (f"P={P:>2} qc={qc_lbl}: dropped {dropped}/{total} "
                f"({100*dropped/max(total,1):.3f}%)  "
                f"{marginal*1000:6.1f} ms/batch -> "
                f"{nq/marginal:>9,.0f} QPS")
        if trus is not None:
            rec = np.mean([len(set(t.tolist()) & set(g.tolist())) / k
                           for t, g in zip(trus, out[0])])
            line += f"  recall{k}@{k}={rec:.4f}"
        print(line, flush=True)
    ivf.queries_per_cluster = None
