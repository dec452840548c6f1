#!/usr/bin/env python3
"""Diagnose the euclid-at-scale stream dip at P=3/4.

Both round-5 euclid sweeps showed query_stream sustained QPS
collapsing to ~2-3k at n_probes=3/4 while per-call query() ran
8-13k and P=6 streamed fine (~20-26k). Suspect: the adaptive-qc
pre-pass floors (peak per-cluster load on clustered data) blowing
the (C, qc, S) scan grids up at some probe counts. Prints the
adaptive floors, effective capacities, and per-call timings with
adaptive on vs off.
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

import jax.numpy as jnp
t0 = time.time()
assert float((jnp.ones((8, 8)) @ jnp.ones((8, 8))).sum()) == 512.0
print(f"chip probe ok in {time.time()-t0:.1f}s", flush=True)

ivf = load_ivf("ivf_clustered-1000000-128_euclidean_num_clusters=1000_"
               "dims_per_block=2_build_probes=1.npz")
print("index loaded", flush=True)

R = 4
qb = queries[None] + np.arange(R, dtype=np.float32)[:, None, None] * 1e-6
for P in (2, 3, 4, 6):
    p1 = 4 * ((P + 1) * k + 1)
    for adaptive in (True, False):
        out, st = ivf.query_stream(qb, k=k, n_probes=P, pass_1=p1,
                                   with_stats=True, adaptive_qc=adaptive)
        el = float("inf")
        for _ in range(2):
            t0 = time.time()
            out = ivf.query_stream(qb, k=k, n_probes=P, pass_1=p1,
                                   adaptive_qc=adaptive)
            np.asarray(out)
            el = min(el, time.time() - t0)
        print(f"P={P} adaptive={adaptive}: {R*nq/el:9,.0f} QPS  "
              f"qc={st['queries_per_cluster_cap']} "
              f"qc0={st['queries_per_cluster_cap_round0']} "
              f"floors={st.get('adaptive_qc_floors')} "
              f"dropped={st['dropped_probe_pairs']}", flush=True)
print("done", flush=True)
