#!/usr/bin/env python3
"""scan_budget_bytes trade on the euclid-at-scale skewed stream.

The default ~2 GB scan-grid budget clamps the adaptive capacities
below the measured peak at P>=3 on this workload (residual drops in
stats). Measures drops + sustained QPS at 2/4/8 GB budgets.
"""
import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

from tinyknn_tpu import utils
from tinyknn_tpu.io import load_ivf

utils.enable_compilation_cache()

size, dim, nq, k = 1000000, 128, 10000, 10
_, queries = utils.make_clustered(size, dim, nq)
trus = np.load(utils.truth_cache_path(size, dim, k, nq, "euclidean"))
true_sets = [set(t.tolist()) for t in trus]

import jax.numpy as jnp
t0 = time.time()
assert float((jnp.ones((8, 8)) @ jnp.ones((8, 8))).sum()) == 512.0
print(f"chip probe ok in {time.time()-t0:.1f}s", flush=True)

ivf = load_ivf("ivf_clustered-1000000-128_euclidean_num_clusters=1000_"
               "dims_per_block=2_build_probes=1.npz")
print("index loaded", flush=True)

R = 4
qb = queries[None] + np.arange(R, dtype=np.float32)[:, None, None] * 1e-6
for gb in (2, 4, 8):
    ivf.scan_budget_bytes = gb << 30
    ivf._stream_qc_floors = {}
    for P in (4, 6):
        p1 = 4 * ((P + 1) * k + 1)
        out, st = ivf.query_stream(qb, k=k, n_probes=P, pass_1=p1,
                                   with_stats=True)
        el = float("inf")
        for _ in range(2):
            t0 = time.time()
            out = ivf.query_stream(qb, k=k, n_probes=P, pass_1=p1)
            out = np.asarray(out)
            el = min(el, time.time() - t0)
        found = sum(len(true_sets[i] & set(g.tolist()))
                    for i, g in enumerate(out[0]))
        print(f"budget={gb}GB P={P}: {R*nq/el:9,.0f} QPS  "
              f"recall={found/(k*nq):.4f}  "
              f"qc={st['queries_per_cluster_cap']} "
              f"dropped={st['dropped_probe_pairs']}", flush=True)
print("done", flush=True)
