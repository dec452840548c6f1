#!/usr/bin/env python3
"""IVF recall/QPS sweep over n_probes (reference: examples/ivf_example.py)."""

import argparse
import time

import numpy as np

import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))  # allow running without install

from tinyknn_tpu import FastPQ, IVF, knn_brute, utils

parser = argparse.ArgumentParser()
parser.add_argument("--n", type=int, default=10000)
parser.add_argument("--d", type=int, default=128)
parser.add_argument("--n-queries", type=int, default=1000)
parser.add_argument("--k", type=int, default=10)
parser.add_argument("--metric", choices=["euclidean", "angular"],
                    default="euclidean")
parser.add_argument("--n-clusters", type=int, default=100)
parser.add_argument("--build-probes", type=int, default=2)
parser.add_argument("--max-probes", type=int, default=10)
args = parser.parse_args()

np.random.seed(10)
X = np.random.randn(args.n, args.d).astype(np.float32)
qs = np.random.randn(args.n_queries, args.d).astype(np.float32)

with utils.timer(True, "Computing ground truth..."):
    trus = np.asarray(knn_brute(qs, X, k=args.k, metric=args.metric))

with utils.timer(True, "Building index..."):
    ivf = IVF(args.metric, args.n_clusters, FastPQ(2))
    ivf.fit(X).build(X, n_probes=args.build_probes)

print(f"\n{'n_probes':>8} {'recall@10':>10} {'QPS':>12}")
for n_probes in range(1, args.max_probes + 1):
    guesses = np.asarray(ivf.query(qs, k=args.k, n_probes=n_probes))  # warm
    start = time.time()
    guesses = np.asarray(ivf.query(qs, k=args.k, n_probes=n_probes))
    elapsed = time.time() - start
    recall = np.mean([len(set(g.tolist()) & set(t.tolist())) / args.k
                      for g, t in zip(guesses, trus)])
    print(f"{n_probes:>8} {recall:>10.4f} {args.n_queries/elapsed:>12.0f}")
