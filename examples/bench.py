#!/usr/bin/env python3
"""Full benchmark harness (reference: examples/bench.py).

Sweeps build_probes x n_probes on a dataset (GloVe/SIFT .npy, or
synthetic), with ground-truth and index caches, and reports the
QPS-recall curve and its AUC. Queries run fully batched on the TPU.
"""

import argparse
import os.path
import re
import sys
import time

import numpy as np

import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))  # allow running without install

from tinyknn_tpu import FastPQ, IVF, knn_brute, utils

utils.enable_compilation_cache()

parser = argparse.ArgumentParser(
    description="Benchmark FastPQ and IVF on a dataset")
parser.add_argument("filename",
                    help=".npy file (e.g. glove.twitter.27B.100d.npy), or "
                         "random-<size>-<dim> / clustered-<size>-<dim>")
parser.add_argument("--n-queries", type=int, default=10000)
parser.add_argument("--dims-per-block", type=int, default=2)
parser.add_argument("--k-neighbours", type=int, default=10)
parser.add_argument("--metric", choices=["euclidean", "angular"],
                    default="euclidean")
parser.add_argument("--a", type=float, default=1.0,
                    help="Number of clusters will be int(a * sqrt(n))")
parser.add_argument("--max-build-probes", type=int, default=10)
parser.add_argument("--recall-target", type=float, default=0.9)
parser.add_argument("--no-cache", action="store_true")
parser.add_argument("--pass1-mult", type=float, default=4.0,
                    help="pass-1 rescore pool = mult * ((P+1)k+1). The "
                         "reference default is 1 (its heap cost scales "
                         "with the pool); on TPU a wider exact rescore "
                         "is nearly free and buys large recall at "
                         "fixed n_probes")
parser.add_argument("--scan-impl", default="auto",
                    choices=["auto", "fused", "xla", "exact"],
                    help="list-scan engine; 'exact' stores raw bf16 "
                         "vector tiles and computes true distances in "
                         "the scan (thin f32 rescore only)")
parser.add_argument("--table-dtype", default="int8",
                    choices=["int8", "bf16", "f32"],
                    help="PQ distance-table dtype. int8 is the "
                         "reference's quantized scheme; bf16 removes "
                         "the quantization noise at equal index "
                         "memory (tables are per-query temporaries) — "
                         "measured +4-5pp recall at fixed probes/pool "
                         "on GloVe-scale (docs/PERFORMANCE.md)")
parser.add_argument("--rescore-rows", action="store_true",
                    help="store a CSR-ordered raw copy so the rescore "
                         "gathers by flat row (deferred id decode)")
parser.add_argument("--sustained-reps", type=int, default=4,
                    help="Batches per dispatch for the sustained QPS "
                         "figure (0 disables; per-call round-trip QPS "
                         "is always reported)")
args = parser.parse_args()

num_queries = args.n_queries
dims_per_block = args.dims_per_block
k_neighbours = args.k_neighbours
metric = args.metric
simple_name = os.path.basename(args.filename)

print("Loading and shuffling...")
if match := re.match(r"random-(\w+)-(\d+)", args.filename):
    sizes = {"xs": 10**5, "s": 3 * 10**5, "m": 10**6}
    size = sizes.get(match.group(1), None) or int(match.group(1))
    dim = int(match.group(2))
    data = np.random.default_rng(10).standard_normal(
        (size + num_queries, dim), dtype=np.float32)
elif match := re.match(r"clustered-(\w+)-(\d+)", args.filename):
    sizes = {"xs": 10**5, "s": 3 * 10**5, "m": 10**6}
    size = sizes.get(match.group(1), None) or int(match.group(1))
    dim = int(match.group(2))
    # one source of truth for the recipe: the driver bench gates
    # recall against truth archives computed on THIS data, so the
    # generator must not drift between consumers
    d_q = utils.make_clustered(size, dim, num_queries)
    data = np.concatenate(d_q)
else:
    data = np.load(args.filename).astype(np.float32)
    np.random.seed(10)
    np.random.shuffle(data)
data, queries = data[:-num_queries], data[-num_queries:]

num_points, num_dims = data.shape
num_clusters = int(args.a * num_points**0.5)
print(f"{num_points=}, {num_dims=}, {num_queries=}, {dims_per_block=}, "
      f"{num_clusters=}")

trus_file = f"trus_{simple_name}_{k_neighbours=}_{num_queries=}_{metric=}.npy"
if os.path.isfile(trus_file) and not args.no_cache:
    with utils.timer(True, f"Loading true neighbours from {trus_file}"):
        true_neighbours = np.load(trus_file)
    num_queries, k_neighbours = true_neighbours.shape
else:
    with utils.timer(True, "Computing true neighbours (TPU brute force)..."):
        true_neighbours = np.asarray(
            knn_brute(queries, data, k_neighbours, metric=metric))
    if not args.no_cache:
        np.save(trus_file, true_neighbours)

pq = FastPQ(dims_per_block, table_dtype=args.table_dtype)
ivf = IVF(metric, num_clusters, pq, scan_impl=args.scan_impl,
          rescore_rows=args.rescore_rows)
fitted = False
fit_time = 0.0


def _ensure_fitted():
    """Coarse KMeans + PQ codebooks, once (60-140s at GloVe scale)."""
    global fitted, fit_time
    if fitted:
        return
    with utils.timer(True, "Fitting index (coarse KMeans + PQ codebooks)..."):
        t_fit0 = time.time()
        ivf.fit(data)
        fit_time = time.time() - t_fit0
    fitted = True

true_sets = [set(t.tolist()) for t in true_neighbours]

for build_probes in range(1, args.max_build_probes):
    # Built-index cache (the reference pickles (pq, ivf) the same way,
    # reference examples/bench.py:88-103): refitting costs minutes at
    # GloVe scale, a load costs seconds.
    ivf_file = (f"ivf_{simple_name}_{metric}_{num_clusters=}_"
                f"{dims_per_block=}_{build_probes=}.npz")
    if os.path.isfile(ivf_file) and not args.no_cache:
        from tinyknn_tpu.io import load_ivf
        with utils.timer(True, f"Loading built index from {ivf_file}"):
            ivf = load_ivf(ivf_file)
        if ivf.scan_impl != args.scan_impl:
            with utils.timer(True, "Switching scan engine..."):
                ivf.set_scan_impl(args.scan_impl)
        # tables are built per-query from the codebooks, so the dtype
        # flips freely on a cached index
        ivf.pq.table_dtype = args.table_dtype
        if args.rescore_rows:
            with utils.timer(True, "Building CSR-ordered raw rows..."):
                ivf.set_rescore_rows(True)
        fitted, build_time = True, 0.0
    else:
        _ensure_fitted()
        with utils.timer(True,
                         f"Adding each point to {build_probes} lists..."):
            t0 = time.time()
            ivf.build(data, n_probes=build_probes)
            build_time = time.time() - t0
        if not args.no_cache:
            from tinyknn_tpu.io import save_ivf
            with utils.timer(True, f"Caching built index to {ivf_file}"):
                save_ivf(ivf_file, ivf)
    print(f"[build] fit={fit_time:.1f}s build={build_time:.1f}s")

    print("Querying (batched)")
    recall = 0.0
    n_probes = 1
    qpss, recalls = [], []
    while recall < args.recall_target and n_probes <= ivf.n_clusters:
        # pass1_mult=0 -> library default (in exact mode pass_1 only
        # widens the fold against slot collisions)
        p1 = (int(args.pass1_mult * ((n_probes + 1) * k_neighbours + 1))
              or None)
        # warm / compile for this shape
        guesses = np.asarray(ivf.query(queries, k=k_neighbours,
                                       n_probes=n_probes, pass_1=p1))
        # best-of-2 timing: remote-relay scheduling jitter otherwise
        # dominates individual measurements
        elapsed = float("inf")
        for _ in range(2):
            start = time.time()
            guesses = np.asarray(ivf.query(queries, k=k_neighbours,
                                           n_probes=n_probes, pass_1=p1))
            elapsed = min(elapsed, time.time() - start)
        qps = num_queries / elapsed
        found = sum(len(true_sets[i] & set(g.tolist()))
                    for i, g in enumerate(guesses))
        recall = found / k_neighbours / num_queries
        sustained = ""
        if args.sustained_reps:
            # steady-state rate: R batches per dispatch (lax.map), so
            # the per-call relay round-trip latency is amortized — what
            # a pipelined serving deployment sees.
            R = args.sustained_reps
            jitter = (np.arange(R, dtype=np.float32)[:, None, None]
                      * 1e-6)
            qb = queries[None] + jitter
            out = np.asarray(ivf.query_stream(
                qb, k=k_neighbours, n_probes=n_probes,
                pass_1=p1))  # warm/compile
            el_s = float("inf")
            for _ in range(2):
                start = time.time()
                out = np.asarray(ivf.query_stream(
                    qb, k=k_neighbours, n_probes=n_probes, pass_1=p1))
                el_s = min(el_s, time.time() - start)
            qps_s = R * num_queries / el_s
            sustained = f"  sustained={qps_s:,.0f}"
            qps = max(qps, qps_s)
        qpss.append(qps)
        recalls.append(recall)
        print(f"Probing {n_probes:>3}/{ivf.n_clusters}: "
              f"recall{k_neighbours}@{k_neighbours}={recall:.5f}  "
              f"QPS={qps:,.2f}{sustained}")
        n_probes += max(int(n_probes**0.5), 1)

    # Area under the QPS-recall curve for recall in [1/2, 1]
    # (same definition as reference examples/bench.py:141-148)
    qpss.append(0.0)
    recalls.append(1.0)
    recall0 = 1 / 2
    qps0 = float(np.interp(recall0, recalls, qpss))
    i = int(np.searchsorted(recalls, recall0))
    xs = [recall0] + recalls[i:]
    ys = [qps0] + qpss[i:]
    auc = float(np.trapezoid(ys, xs))
    print(f"Area under the curve from {recall0} to 1: {auc:.1f}")
