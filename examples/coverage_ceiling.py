#!/usr/bin/env python3
"""Probe-coverage recall ceiling — a pure-NumPy, no-device diagnostic.

For an IVF index archive, computes the best recall@k ANY scan engine
can reach at each n_probes: exact probe selection (true distances to
the active centers) + exact f32 brute force over the union of the
probed lists. Everything above this line is unreachable (the true
neighbor is not in any probed list); the gap between this ceiling and
a measured recall is the engine's own loss (estimate noise, fold
collisions, bf16 rounding, capacity drops).

Runs on plain NumPy/BLAS — no JAX, no TPU — so it works during relay
outages and on any host. On the GloVe-scale archive the full P ladder
takes ~8 minutes on one CPU core.

The reference has no analogue (its per-query loop could compute this,
but never does); closest is the multiprobe recall grid
(reference: examples/multiprobes.py).

Usage:
  python examples/coverage_ceiling.py \
      [--index ivf_....npz] [--probes 1 2 3 4 6 10] [--k 10]
  # dataset is derived from the index filename (clustered-<n>-<d> /
  # random-<n>-<d> synthetic strings, same generator as bench.py),
  # or pass --data file.npy
"""

import argparse
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from tinyknn_tpu import utils  # noqa: E402

parser = argparse.ArgumentParser()
parser.add_argument("--index", default="ivf_clustered-1183514-100_"
                    "angular_num_clusters=1087_dims_per_block=2_"
                    "build_probes=1.npz")
parser.add_argument("--probes", type=int, nargs="+",
                    default=[1, 2, 3, 4, 6, 10])
parser.add_argument("--k", type=int, default=10)
parser.add_argument("--n-queries", type=int, default=10000)
parser.add_argument("--data", default=None,
                    help=".npy dataset (queries = last n-queries rows "
                         "after the bench.py shuffle-free split); "
                         "default: synthesize from the index filename")
parser.add_argument("--trus", default=None,
                    help="ground-truth .npy (default: derived cache "
                         "name next to the index)")
args = parser.parse_args()

z = np.load(args.index)
C = z["active_centers"]
data = z["data"]                       # normalized copy stored at build
tile_off, counts, csr_ids = (z["tile_offsets"], z["list_counts"],
                             z["csr_ids"])
metric = "angular" if "angular" in args.index else "euclidean"
nq, k = args.n_queries, args.k

m = re.search(r"(clustered|random)-(\d+)-(\d+)", args.index)
if args.data is not None:
    raw = np.load(args.data)
    queries = raw[-nq:]
elif m:
    kind, size, dim = m.group(1), int(m.group(2)), int(m.group(3))
    if kind == "clustered":
        d_q = utils.make_clustered(size, dim, nq)
        raw = np.concatenate(d_q)
    else:
        raw = np.random.default_rng(10).standard_normal(
            (size + nq, dim), dtype=np.float32)
    queries = raw[-nq:]
    del raw
else:
    sys.exit("cannot derive the dataset from the index name; "
             "pass --data")

if metric == "angular":
    queries = queries / np.linalg.norm(queries, axis=1, keepdims=True)

trus_file = args.trus
if trus_file is None and m:
    trus_file = (f"trus_{m.group(0)}_k_neighbours={k}_"
                 f"num_queries={nq}_metric='{metric}'.npy")
if not (trus_file and os.path.isfile(trus_file)):
    sys.exit(f"ground-truth file not found ({trus_file}); run the "
             "bench sweep once (it caches it) or pass --trus")
true_sets = [set(t.tolist()) for t in np.load(trus_file)[:, :k]]

# exact probe selection, best-first (library semantics: true distances
# to the active centers — tinyknn_tpu/models/ivf.py probe selection)
P_max = max(args.probes)
if metric == "angular":
    order = np.argsort(-(queries @ C.T), axis=1)[:, :P_max]
else:
    d2 = ((queries ** 2).sum(1)[:, None] - 2 * queries @ C.T
          + (C ** 2).sum(1)[None])
    order = np.argsort(d2, axis=1)[:, :P_max]

lists = [csr_ids[tile_off[c] * 128: tile_off[c] * 128 + counts[c]]
         for c in range(len(counts))]

for P in args.probes:
    found = member = total_pts = 0
    for i in range(nq):
        # unique: a build_probes>=2 archive spills each point into
        # several lists; duplicates would crowd the argpartition top-k
        ids = np.unique(np.concatenate(
            [lists[c] for c in order[i, :P]]))
        total_pts += len(ids)
        member += len(true_sets[i].intersection(ids.tolist()))
        if metric == "angular":
            d = -(data[ids] @ queries[i])
        else:
            d = ((data[ids] - queries[i]) ** 2).sum(1)
        top = ids[np.argpartition(d, min(k - 1, len(ids) - 1))[:k]]
        found += len(true_sets[i].intersection(top.tolist()))
    # membership is the PURE coverage bound (set-based, immune to
    # distance rounding); the brute-recall line matches it now that
    # the stored truth is f64 (round 5 — before that, bf16 matmul
    # noise in the truth capped this line at 0.981 and the gap was
    # misread as coverage; see examples/r5_ceiling_analysis.py)
    print(f"P={P:>2}: membership={member / (k * nq):.4f}  "
          f"union-brute recall{k}@{k} = {found / (k * nq):.4f}  "
          f"(avg {total_pts / nq:,.0f} candidates/query)", flush=True)
