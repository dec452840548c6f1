#!/usr/bin/env python3
"""Exact-mode frontier re-measure (round-4 VERDICT item 1).

The round-3 exact table in docs/PERFORMANCE.md carries asterisked
P>=3 rows measured BEFORE the always-on drop escalation landed
(bucket-capacity drops silently cost 1-2pp recall on clustered
queries).  This re-measures the frontier on the cached GloVe index:
per n_probes, recall10@10 from the escalating ``query()`` path
(with drop stats) and sustained QPS from ``query_stream`` marginal
timing (Delta t / Delta reps, so the ~28.5 ms relay dispatch constant
cancels; CLAUDE.md methodology).

Usage: python examples/exact_frontier.py [--probes 1 2 3 4 6 10]
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

parser = argparse.ArgumentParser()
parser.add_argument("--probes", type=int, nargs="+",
                    default=[1, 2, 3, 4, 6, 10])
parser.add_argument("--k", type=int, default=10)
parser.add_argument("--reps", type=int, nargs=2, default=[4, 12])
parser.add_argument("--scan-impl", default="exact",
                    choices=["auto", "fused", "xla", "exact"])
parser.add_argument("--index", default="ivf_clustered-1183514-100_"
                    "angular_num_clusters=1087_dims_per_block=2_"
                    "build_probes=1.npz")
parser.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (recall is "
                         "hardware-independent, so the recall column "
                         "can be re-measured during a relay outage)")
parser.add_argument("--recall-only", action="store_true",
                    help="skip the QPS timing sweeps (pointless off-TPU)")
args = parser.parse_args()

if args.cpu:
    import jax
    jax.config.update("jax_platforms", "cpu")

utils.enable_compilation_cache()

print("loading index...", flush=True)
ivf = load_ivf(args.index)
t0 = time.time()
ivf.set_scan_impl(args.scan_impl)
print(f"scan_impl={args.scan_impl} derived in {time.time()-t0:.1f}s",
      flush=True)

size, dim, nq = 1183514, 100, 10000
_, queries = utils.make_clustered(size, dim, nq)

trus_file = ("trus_clustered-1183514-100_k_neighbours=10_"
             "num_queries=10000_metric='angular'.npy")
trus = np.load(trus_file) if os.path.isfile(trus_file) else None

k = args.k
R1, R2 = args.reps
qb1 = queries[None] + (np.arange(R1, dtype=np.float32)
                       [:, None, None] * 1e-6)
qb2 = queries[None] + (np.arange(R2, dtype=np.float32)
                       [:, None, None] * 1e-6)

for P in args.probes:
    # recall through the escalating query() path (post-drop-retry)
    out, stats = ivf.query(queries, k=k, n_probes=P, with_stats=True)
    out = np.asarray(out)
    rec = float("nan")
    if trus is not None:
        rec = np.mean([len(set(t.tolist()) & set(g.tolist())) / k
                       for t, g in zip(trus, out)])
    if args.recall_only:
        print(f"P={P:>2}: recall{k}@{k}={rec:.4f} "
              f"dropped={stats['dropped_probe_pairs']}"
              f"/{stats['total_probe_pairs']}", flush=True)
        continue
    # sustained QPS through query_stream, measured at the margin
    np.asarray(ivf.query_stream(qb1, k=k, n_probes=P))
    np.asarray(ivf.query_stream(qb2, k=k, n_probes=P))
    t1 = t2 = float("inf")
    for _ in range(3):
        s = time.time()
        np.asarray(ivf.query_stream(qb1, k=k, n_probes=P))
        t1 = min(t1, time.time() - s)
        s = time.time()
        np.asarray(ivf.query_stream(qb2, k=k, n_probes=P))
        t2 = min(t2, time.time() - s)
    marginal = (t2 - t1) / (R2 - R1)
    print(f"P={P:>2}: recall{k}@{k}={rec:.4f} "
          f"dropped={stats['dropped_probe_pairs']}"
          f"/{stats['total_probe_pairs']} "
          f"{marginal*1000:6.1f} ms/batch -> "
          f"{nq/marginal:>9,.0f} QPS sustained", flush=True)
