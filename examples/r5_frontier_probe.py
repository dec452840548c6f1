#!/usr/bin/env python3
"""Round-5 frontier probe (ONE long-lived TPU process).

Captures, with bench.py's sustained methodology (query_stream, 5
batches per dispatch, best-of-3):
  1. today's relay baseline: bp=1 exact P=1 (round-4 captured 223-254k)
  2. the build_probes=2 exact frontier at P=1..4 (the only lever past
     the bp=1 coverage ceiling of 0.981 — docs/PERFORMANCE.md)
  3. bp=2 PQ points for the sweep table

Reference axis: /root/reference/examples/bench.py:108-117 sweeps
build_probes 1..3 (spill at /root/reference/tinyknn/ivf.py:85).
"""
import os.path
import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

from tinyknn_tpu import utils
from tinyknn_tpu.io import load_ivf

utils.enable_compilation_cache()

size, dim, nq, k = 1183514, 100, 10000, 10
n_clusters = 1087

trus_file = (f"trus_clustered-{size}-{dim}_k_neighbours={k}"
             f"_num_queries={nq}_metric='angular'.npy")
trus = np.load(trus_file)
true_sets = [set(t.tolist()) for t in trus]

_, queries = utils.make_clustered(size, dim, nq)

# wait for the chip before the big load (worker re-attach cost lands on
# the first substantial device op of a new process)
import jax
import jax.numpy as jnp
t0 = time.time()
assert float((jnp.ones((8, 8)) @ jnp.ones((8, 8))).sum()) == 512.0
print(f"chip probe ok in {time.time()-t0:.1f}s", flush=True)

# validate the knn_brute precision fix ON DEVICE: HIGHEST-precision
# truth must agree with the f64 CPU truth (the old DEFAULT-precision
# truth agreed only 0.9809 — the bf16-truncation artifact)
if os.path.isfile("trus64_clustered-1183514-100_k10_nq10000_angular.npy"):
    from tinyknn_tpu import knn_brute
    full, _ = utils.make_clustered(size, dim, nq)
    t0 = time.time()
    sub = np.asarray(knn_brute(queries[:2000], full, k,
                               metric="angular"))
    t64 = np.load("trus64_clustered-1183514-100_k10_nq10000_angular.npy")
    agree = np.mean([len(set(a.tolist()) & set(b.tolist())) / k
                     for a, b in zip(sub, t64[:2000])])
    print(f"knn_brute(HIGHEST) vs f64 truth agreement on 2000 queries: "
          f"{agree:.4f} ({time.time()-t0:.1f}s)", flush=True)
    del full


def sustained(ivf_obj, n_probes, pass_1=None, reps=5):
    jq = jnp.asarray(
        queries[None]
        + np.arange(reps, dtype=np.float32)[:, None, None] * 1e-6)
    out = np.asarray(ivf_obj.query_stream(
        jq, k=k, n_probes=n_probes, pass_1=pass_1))  # warm/compile
    el = float("inf")
    for _ in range(3):
        t = time.time()
        out = np.asarray(ivf_obj.query_stream(
            jq, k=k, n_probes=n_probes, pass_1=pass_1))
        el = min(el, time.time() - t)
    qps = reps * nq / el
    found = sum(len(true_sets[i] & set(g.tolist()))
                for i, g in enumerate(np.asarray(out[0])))
    return qps, found / (k * nq)


for bp in (1, 2):
    ivf_file = (f"ivf_clustered-{size}-{dim}_angular_"
                f"num_clusters={n_clusters}_dims_per_block=2_"
                f"build_probes={bp}.npz")
    t0 = time.time()
    ivf = load_ivf(ivf_file)
    print(f"loaded bp={bp} index in {time.time()-t0:.1f}s", flush=True)

    # PQ-path points for the sweep table (quality pool, p1=4x)
    for p in (1, 2, 3):
        p1 = 4 * ((p + 1) * k + 1)
        qps, rec = sustained(ivf, n_probes=p, pass_1=p1)
        print(f"bp={bp} PQ    P={p} p1={p1}: recall10@10={rec:.4f} "
              f"QPS={qps:,.0f}", flush=True)

    t0 = time.time()
    ivf.set_scan_impl("exact")
    print(f"derived exact tiles in {time.time()-t0:.1f}s", flush=True)
    for p in (1, 2, 3, 4):
        qps, rec = sustained(ivf, n_probes=p)
        print(f"bp={bp} exact P={p}: recall10@10={rec:.4f} "
              f"QPS={qps:,.0f}", flush=True)
print("done", flush=True)
