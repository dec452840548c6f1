#!/usr/bin/env python3
"""Recall grid over build_probes x query_probes (reference: examples/multiprobes.py)."""

import argparse

import numpy as np

import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))  # allow running without install

from tinyknn_tpu import FastPQ, IVF, knn_brute

parser = argparse.ArgumentParser()
parser.add_argument("--n", type=int, default=20000)
parser.add_argument("--d", type=int, default=64)
parser.add_argument("--n-queries", type=int, default=500)
parser.add_argument("--k", type=int, default=10)
parser.add_argument("--metric", choices=["euclidean", "angular"],
                    default="euclidean")
parser.add_argument("--max-probes", type=int, default=8)
args = parser.parse_args()

np.random.seed(10)
X = np.random.randn(args.n, args.d).astype(np.float32)
qs = np.random.randn(args.n_queries, args.d).astype(np.float32)
trus = np.asarray(knn_brute(qs, X, k=args.k, metric=args.metric))
true_sets = [set(t.tolist()) for t in trus]

print(f"build\\query  " + " ".join(f"{qp:>7}" for qp in
                                   range(1, args.max_probes + 1)))
for bp in range(1, args.max_probes + 1):
    ivf = IVF(args.metric, int(args.n ** 0.5), FastPQ(2))
    ivf.fit(X).build(X, n_probes=bp)
    row = []
    for qp in range(1, args.max_probes + 1):
        guesses = np.asarray(ivf.query(qs, k=args.k, n_probes=qp))
        recall = np.mean([len(true_sets[i] & set(g.tolist())) / args.k
                          for i, g in enumerate(guesses)])
        row.append(recall)
    print(f"{bp:>11}  " + " ".join(f"{r:>7.4f}" for r in row))
