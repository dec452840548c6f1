#!/usr/bin/env python3
"""Regenerate the stored ground-truth archives with PRECISE distances.

Round-5 finding (examples/r5_ceiling_analysis.py): the stored truth
files were computed by knn_brute on TPU at DEFAULT matmul precision,
which truncates f32 inputs to bf16 on the MXU — 1.9% of the GloVe
top-10 ids were near-tie-wrong, capping EVERY engine's measured recall
at 0.9809 ("the 0.981 coverage ceiling" was this artifact; true probe
coverage at P=2 is 0.9995). knn_brute now passes precision=HIGHEST;
this script replaces the cached truth with f64 direct-summation truth
computed on CPU (chunked BLAS — no device needed).

  - angular GloVe scale: reuses the f64 truth the analysis saved.
  - euclidean 1M x 128: recomputed here in f64 (~10 min on CPU).
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from tinyknn_tpu.utils import make_clustered  # noqa: E402

# --- angular (GloVe-scale): from the analysis run's saved f64 truth
src = "trus64_clustered-1183514-100_k10_nq10000_angular.npy"
dst = ("trus_clustered-1183514-100_k_neighbours=10_num_queries=10000_"
       "metric='angular'.npy")
if os.path.isfile(src):
    t = np.load(src)
    np.save(dst, t.astype(np.int64))
    print(f"angular truth replaced from {src}", flush=True)
else:
    print(f"missing {src}; run r5_ceiling_analysis.py first",
          file=sys.stderr)

# --- euclidean 1M x 128 (clustered-1000000-128)
size, dim, nq, k = 1000000, 128, 10000, 10
data, queries = make_clustered(size, dim, nq)
data, queries = data.astype(np.float64), queries.astype(np.float64)

dn2 = (data ** 2).sum(1)
tru = np.empty((nq, k), dtype=np.int64)
B = 250
for i in range(0, nq, B):
    qb = queries[i:i + B]
    d2 = ((qb ** 2).sum(1)[:, None] + dn2[None, :]
          - 2.0 * (qb @ data.T))
    part = np.argpartition(d2, k - 1, axis=1)[:, :k]
    row = np.take_along_axis(d2, part, 1)
    order = np.argsort(row, axis=1)
    tru[i:i + B] = np.take_along_axis(part, order, 1)
    if (i // B) % 4 == 0:
        print(f"euclid f64 truth: {i + B}/{nq}", flush=True)

dst_e = ("trus_clustered-1000000-128_k_neighbours=10_num_queries=10000_"
         "metric='euclidean'.npy")
old = np.load(dst_e) if os.path.isfile(dst_e) else None
if old is not None:
    agree = np.mean([len(set(a.tolist()) & set(b.tolist())) / k
                     for a, b in zip(old, tru)])
    print(f"old euclid truth vs f64: agreement {agree:.4f}", flush=True)
np.save(dst_e, tru)
print("euclid truth replaced", flush=True)
