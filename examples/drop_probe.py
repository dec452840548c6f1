#!/usr/bin/env python3
"""Audit bucket-capacity drops at GloVe scale (clustered query skew).

The qc heuristic sizes buckets at ~2.5x the MEAN per-cluster load;
clustered queries concentrate on hot clusters, so tail-round pairs
can overflow. query() now always runs the free drop check + retry
escalation (the old Q*P <= 4096 gate silently cost 1-2pp recall at
GloVe scale); this tool prints the POST-escalation dropped count +
recall per probe count via query(..., with_stats=True), optionally
with a forced queries_per_cluster cap (which disables escalation).

Usage: python examples/drop_probe.py [--probes 2 3 10] [--qc 0]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from tinyknn_tpu import utils                      # noqa: E402
from tinyknn_tpu.io import load_ivf                # noqa: E402

parser = argparse.ArgumentParser()
parser.add_argument("--probes", type=int, nargs="+", default=[2, 3, 10])
parser.add_argument("--k", type=int, default=10)
parser.add_argument("--qc", type=int, default=0,
                    help="force queries_per_cluster (0 = heuristic)")
parser.add_argument("--scan-impl", default="exact")
parser.add_argument("--mult", type=float, default=0.0)
parser.add_argument("--index", default="ivf_clustered-1183514-100_"
                    "angular_num_clusters=1087_dims_per_block=2_"
                    "build_probes=1.npz")
args = parser.parse_args()

utils.enable_compilation_cache()
print("loading index...", flush=True)
ivf = load_ivf(args.index)
ivf.set_scan_impl(args.scan_impl)
if args.qc:
    ivf.queries_per_cluster = args.qc

size, dim, nq = 1183514, 100, 10000
_, queries = utils.make_clustered(size, dim, nq)

trus_file = ("trus_clustered-1183514-100_k_neighbours=10_"
             "num_queries=10000_metric='angular'.npy")
trus = np.load(trus_file) if os.path.isfile(trus_file) else None
k = args.k

for P in args.probes:
    p1 = int(args.mult * ((P + 1) * k + 1)) or None
    out, stats = ivf.query(queries, k=k, n_probes=P, pass_1=p1,
                           with_stats=True)
    out = np.asarray(out)
    rec = float("nan")
    if trus is not None:
        rec = np.mean([len(set(t.tolist()) & set(g.tolist())) / k
                       for t, g in zip(trus, out)])
    print(f"P={P}: recall={rec:.4f} dropped={stats['dropped_probe_pairs']}"
          f"/{stats['total_probe_pairs']} qc={stats['queries_per_cluster_cap']}"
          f" qc0={stats['queries_per_cluster_cap_round0']}", flush=True)
