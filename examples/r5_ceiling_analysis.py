#!/usr/bin/env python3
"""Decompose the 0.981 recall plateau: coverage loss vs truth near-ties.

Pure NumPy/BLAS (no device). For the GloVe-scale archives:
  1. recompute the ground truth in f64 (direct summation, chunked BLAS)
     and report its id-set agreement with the stored knn_brute truth —
     quantifies how much of the plateau is the truth's own f32
     dot-product-expansion near-tie artifact (see bench.py's exact-gate
     note: reproduces bit-identically on CPU);
  2. per build_probes archive and n_probes, report the MEMBERSHIP
     ceiling (true id present in the probed union — the real coverage
     bound) next to the id-recall ceiling of f32/f64 brute force over
     the union (what any engine's measured recall can reach).
"""
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from tinyknn_tpu.utils import make_clustered  # noqa: E402

nq, k = 10000, 10
size, dim = 1183514, 100

data_raw, queries = make_clustered(size, dim, nq)

trus = np.load("trus_clustered-1183514-100_k_neighbours=10_"
               "num_queries=10000_metric='angular'.npy")
true_sets = [set(t.tolist()) for t in trus]

# --- 1. f64 direct-summation truth (angular: normalize both sides)
dn = (data_raw / np.linalg.norm(data_raw, axis=1, keepdims=True)
      ).astype(np.float64)
qn = (queries / np.linalg.norm(queries, axis=1, keepdims=True)
      ).astype(np.float64)
tru64 = np.empty((nq, k), dtype=np.int64)
B = 500
for i in range(0, nq, B):
    sims = qn[i:i + B] @ dn.T            # (B, N) f64
    part = np.argpartition(-sims, k - 1, axis=1)[:, :k]
    row = np.take_along_axis(sims, part, 1)
    order = np.argsort(-row, axis=1)
    tru64[i:i + B] = np.take_along_axis(part, order, 1)
    print(f"f64 truth: {i + B}/{nq}", flush=True)
agree = np.mean([len(true_sets[i] & set(tru64[i].tolist())) / k
                 for i in range(nq)])
print(f"stored knn_brute truth vs f64 truth id agreement: {agree:.4f} "
      f"(1-agree = the measurement ceiling any engine hits)", flush=True)
np.save("trus64_clustered-1183514-100_k10_nq10000_angular.npy", tru64)
true64_sets = [set(t.tolist()) for t in tru64]

# --- 2. per-archive membership vs brute-force-over-union ceilings
for bp in (1, 2):
    z = np.load(f"ivf_clustered-1183514-100_angular_num_clusters=1087_"
                f"dims_per_block=2_build_probes={bp}.npz")
    C, data = z["active_centers"], z["data"]
    tile_off, counts, csr_ids = (z["tile_offsets"], z["list_counts"],
                                 z["csr_ids"])
    order = np.argsort(-(qn.astype(np.float32) @ C.T), axis=1)[:, :4]
    lists = [csr_ids[tile_off[c] * 128: tile_off[c] * 128 + counts[c]]
             for c in range(len(counts))]
    for P in (1, 2, 3):
        member = member64 = rec32 = rec64 = 0
        for i in range(nq):
            # unique: a bp>=2 archive spills each point into several
            # lists, and duplicate ids would crowd the argpartition
            # top-k (first-run bug: bp=2 P>=2 "recall" collapsed)
            ids = np.unique(np.concatenate(
                [lists[c] for c in order[i, :P]]))
            s = set(ids.tolist())
            member += len(true_sets[i] & s)
            member64 += len(true64_sets[i] & s)
            d32 = -(data[ids] @ qn[i].astype(np.float32))
            top = ids[np.argpartition(d32, min(k - 1, len(ids) - 1))[:k]]
            rec32 += len(true_sets[i] & set(top.tolist()))
            d64 = -(dn[ids] @ qn[i])
            top = ids[np.argpartition(d64, min(k - 1, len(ids) - 1))[:k]]
            rec64 += len(true64_sets[i] & set(top.tolist()))
        print(f"bp={bp} P={P}: membership(stored-truth)="
              f"{member / (k * nq):.4f} membership(f64-truth)="
              f"{member64 / (k * nq):.4f} union-bf-f32 vs stored="
              f"{rec32 / (k * nq):.4f} union-bf-f64 vs f64="
              f"{rec64 / (k * nq):.4f}", flush=True)
