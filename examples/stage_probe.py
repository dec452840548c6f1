#!/usr/bin/env python3
"""Marginal-rate probe of the IVF query at GloVe scale.

Times query_stream at two in-jit rep counts and reports the MARGINAL
per-batch time (Delta time / Delta reps) — the only honest per-batch
figure on a tunneled TPU (the ~28.5 ms dispatch constant cancels in
the difference; see docs/PERFORMANCE.md "Measurement methodology").

Usage: python examples/stage_probe.py [--probes 1 10] [--mult 4]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from tinyknn_tpu import knn_brute, utils          # noqa: E402
from tinyknn_tpu.io import load_ivf               # noqa: E402

parser = argparse.ArgumentParser()
parser.add_argument("--probes", type=int, nargs="+", default=[1, 10])
parser.add_argument("--mult", type=float, default=4.0)
parser.add_argument("--k", type=int, default=10)
parser.add_argument("--reps", type=int, nargs=2, default=[4, 12])
parser.add_argument("--index", default="ivf_clustered-1183514-100_"
                    "angular_num_clusters=1087_dims_per_block=2_"
                    "build_probes=1.npz")
parser.add_argument("--fold-mult", type=int, default=None,
                    help="override IVF fold width multiplier")
parser.add_argument("--scan-impl", default=None,
                    choices=["auto", "fused", "xla", "exact"])
parser.add_argument("--rescore-rows", action="store_true")
args = parser.parse_args()

utils.enable_compilation_cache()

print("loading index...", flush=True)
ivf = load_ivf(args.index)
if args.fold_mult is not None:
    ivf.fold_mult = args.fold_mult
if args.scan_impl is not None:
    ivf.set_scan_impl(args.scan_impl)
if args.rescore_rows:
    ivf.set_rescore_rows(True)

# queries: the canonical clustered-1183514-100 dataset
size, dim, nq = 1183514, 100, 10000
data, queries = utils.make_clustered(size, dim, nq)

trus_file = ("trus_clustered-1183514-100_k_neighbours=10_"
             "num_queries=10000_metric='angular'.npy")
trus = np.load(trus_file) if os.path.isfile(trus_file) else None

k = args.k
R1, R2 = args.reps
for P in args.probes:
    p1 = int(args.mult * ((P + 1) * k + 1)) or None
    qb1 = queries[None] + (np.arange(R1, dtype=np.float32)
                           [:, None, None] * 1e-6)
    qb2 = queries[None] + (np.arange(R2, dtype=np.float32)
                           [:, None, None] * 1e-6)
    out = np.asarray(ivf.query_stream(qb1, k=k, n_probes=P, pass_1=p1))
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
    line = (f"P={P} pass_1={p1}: marginal {marginal*1000:.1f} ms / "
            f"{nq} queries -> {nq/marginal:,.0f} QPS sustained")
    if trus is not None:
        rec = np.mean([len(set(t.tolist()) & set(g.tolist())) / k
                       for t, g in zip(trus, out[0])])
        line += f"  recall{k}@{k}={rec:.4f}"
    print(line, flush=True)
