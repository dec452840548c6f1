#!/usr/bin/env python3
"""Select+rescore wall experiment (round-4 VERDICT item 6).

At P=10 / Q=10k the encoded selection (~100 ms) and the exact rescore
(~100 ms) co-dominate the GloVe-scale PQ query (docs/PERFORMANCE.md
stage table). Two levers claim to move the wall:

  * rescore_rows=True — rescore gathers CSR-ordered raw rows by flat
    position and decodes ids only for the final winners, deleting one
    of the two ~44-rows/us gathers (the gathers are issue-bound, so
    halving the COUNT should halve that stage);
  * fold_mult — wider folds cost more selection work but fewer slot
    collisions (recall), narrower the reverse.

This sweeps the {rescore_rows} x {fold_mult} x {n_probes} grid in ONE
long-lived process (a new process pays minutes of TPU worker re-attach,
CLAUDE.md) on the cached GloVe index, reporting the marginal per-batch
time (Delta t / Delta reps — the dispatch constant cancels) and
recall10@10 per combo.

Usage: python examples/wall_probe.py [--probes 4 10] [--mults 8 16]
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
parser.add_argument("--probes", type=int, nargs="+", default=[4, 10])
parser.add_argument("--mults", type=int, nargs="+", default=[4, 8, 16])
parser.add_argument("--mult", type=float, default=4.0,
                    help="pass-1 pool multiplier (as examples/bench.py)")
parser.add_argument("--k", type=int, default=10)
parser.add_argument("--reps", type=int, nargs=2, default=[4, 12])
parser.add_argument("--index", default="ivf_clustered-1183514-100_"
                    "angular_num_clusters=1087_dims_per_block=2_"
                    "build_probes=1.npz")
parser.add_argument("--table-dtype", default=None,
                    choices=["int8", "bf16"],
                    help="override the PQ table dtype (tables are "
                         "built per-query from center_blocks, so this "
                         "flips on a built index); bf16 removes the "
                         "int8 rounding noise at equal scan speed and "
                         "may buy the same recall from a narrower "
                         "pass-1 pool")
args = parser.parse_args()

utils.enable_compilation_cache()

print("loading index...", flush=True)
ivf = load_ivf(args.index)
if args.table_dtype is not None:
    ivf.pq.table_dtype = args.table_dtype

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

for rr in (False, True):
    ivf.set_rescore_rows(rr)
    for fm in args.mults:
        ivf.fold_mult = fm
        for P in args.probes:
            p1 = int(args.mult * ((P + 1) * k + 1)) or None
            out = np.asarray(ivf.query_stream(
                qb1, k=k, n_probes=P, pass_1=p1))
            np.asarray(ivf.query_stream(qb2, k=k, n_probes=P, pass_1=p1))
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
            line = (f"rescore_rows={int(rr)} fold_mult={fm:>2} P={P:>2} "
                    f"pass_1={p1}: {marginal*1000:6.1f} ms/batch -> "
                    f"{nq/marginal:>9,.0f} QPS")
            if trus is not None:
                rec = np.mean([len(set(t.tolist()) & set(g.tolist())) / k
                               for t, g in zip(trus, out[0])])
                line += f"  recall{k}@{k}={rec:.4f}"
            print(line, flush=True)
