#!/usr/bin/env python3
"""P=1 operating-point frontier: the north-star QPS hunt.

BASELINE.md's north star is QPS at recall10@10 >= 0.374 (the
reference's first published sweep point, pass_1 = (P+1)k+1 = 21). At
P=1 the fold-emit scan itself is ~4 ms / 10k queries; the pool
selection and the exact rescore dominate — and BOTH scale with the
pass-1 width. The published 85-100k QPS figures all use the 4x pool
(p1=84, recall 0.70): far more recall than the 0.374 point needs,
paid for in selection + rescore width.

This sweeps {pass_1} x {fold_mult} x {rescore_rows} x {table_dtype}
at P=1 on the cached GloVe index in one long-lived process, reporting
marginal ms/batch (dispatch constant cancels) + recall10@10 — the
data for picking the fastest recall>=0.374 and recall>=0.5 points.

Usage: python examples/p1_frontier.py [--pass1 11 21 42 84]
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
parser.add_argument("--pass1", type=int, nargs="+",
                    default=[17, 21, 42, 84])
# fold_mult is a no-op at P=1 (the round-0 fold always covers the
# nearest list fully; there are no tail rounds), so the default grid
# pins it — measured on CPU via the gate-equal XLA engine: recall at
# fm 4/8/18 is bit-identical across the whole pass_1 ladder.
parser.add_argument("--mults", type=int, nargs="+", default=[8])
parser.add_argument("--k", type=int, default=10)
parser.add_argument("--probes", type=int, default=1)
parser.add_argument("--reps", type=int, nargs=2, default=[4, 12])
parser.add_argument("--rescore-rows", type=int, nargs="+",
                    default=[0, 1])
parser.add_argument("--table-dtypes", nargs="+", default=["int8"],
                    choices=["int8", "bf16"])
parser.add_argument("--index", default="ivf_clustered-1183514-100_"
                    "angular_num_clusters=1087_dims_per_block=2_"
                    "build_probes=1.npz")
args = parser.parse_args()

utils.enable_compilation_cache()

print("loading index...", flush=True)
ivf = load_ivf(args.index)

size, dim, nq = 1183514, 100, 10000
_, queries = utils.make_clustered(size, dim, nq)

trus_file = ("trus_clustered-1183514-100_k_neighbours=10_"
             "num_queries=10000_metric='angular'.npy")
trus = np.load(trus_file) if os.path.isfile(trus_file) else None

k, P = args.k, args.probes
R1, R2 = args.reps
qb1 = queries[None] + (np.arange(R1, dtype=np.float32)
                       [:, None, None] * 1e-6)
qb2 = queries[None] + (np.arange(R2, dtype=np.float32)
                       [:, None, None] * 1e-6)

for td in args.table_dtypes:
    ivf.pq.table_dtype = td
    for rr in args.rescore_rows:
        ivf.set_rescore_rows(bool(rr))
        for fm in args.mults:
            ivf.fold_mult = fm
            for p1 in args.pass1:
                out = np.asarray(ivf.query_stream(
                    qb1, k=k, n_probes=P, pass_1=p1))
                np.asarray(ivf.query_stream(
                    qb2, k=k, n_probes=P, pass_1=p1))
                t1 = t2 = float("inf")
                for _ in range(3):
                    t0 = time.time()
                    np.asarray(ivf.query_stream(
                        qb1, k=k, n_probes=P, pass_1=p1))
                    t1 = min(t1, time.time() - t0)
                    t0 = time.time()
                    np.asarray(ivf.query_stream(
                        qb2, k=k, n_probes=P, pass_1=p1))
                    t2 = min(t2, time.time() - t0)
                marginal = (t2 - t1) / (R2 - R1)
                line = (f"tables={td} rr={rr} fold_mult={fm:>2} "
                        f"P={P} pass_1={p1:>3}: "
                        f"{marginal*1000:6.1f} ms/batch -> "
                        f"{nq/marginal:>9,.0f} QPS")
                if trus is not None:
                    rec = np.mean(
                        [len(set(t.tolist()) & set(g.tolist())) / k
                         for t, g in zip(trus, out[0])])
                    line += f"  recall{k}@{k}={rec:.4f}"
                print(line, flush=True)
