#!/usr/bin/env python3
"""Round-5 high-recall device-consumed probe (ONE long-lived process).

The 0.999+/1.000 exact-engine points (bp=1 P=2 recall 0.9995, P=4 true
kNN) were captured with host-download whole-call timing only
(r5_frontier_probe.py). This re-measures them with bench.py's canonical
methodology — marginal timing between two stream rep counts, with the
device-consumed (device_out=True + scalar checksum) vs host-delivered
split — plus the rescore_rows A/B at each point, so the README's
high-recall row carries the same grade of evidence as the headline.

Reference axis: the recall ladder the reference sweeps via n_probes,
/root/reference/examples/bench.py:116-139.
"""
import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

from tinyknn_tpu import utils
from tinyknn_tpu.io import load_ivf

utils.enable_compilation_cache()

import bench  # marginal-timing helpers (repo root)

size, dim, nq, k = 1183514, 100, 10000, 10
n_clusters = 1087

trus = np.load(f"trus_clustered-{size}-{dim}_k_neighbours={k}"
               f"_num_queries={nq}_metric='angular'.npy")
true_sets = [set(t.tolist()) for t in trus]

_, queries = utils.make_clustered(size, dim, nq)

import jax.numpy as jnp
t0 = time.time()
assert float((jnp.ones((8, 8)) @ jnp.ones((8, 8))).sum()) == 512.0
print(f"chip probe ok in {time.time()-t0:.1f}s", flush=True)

for bp in (1, 2):
    ivf_file = (f"ivf_clustered-{size}-{dim}_angular_"
                f"num_clusters={n_clusters}_dims_per_block=2_"
                f"build_probes={bp}.npz")
    t0 = time.time()
    ivf = load_ivf(ivf_file)
    ivf.set_scan_impl("exact")
    print(f"loaded bp={bp} index + exact tiles in "
          f"{time.time()-t0:.1f}s", flush=True)
    probes = (2, 3, 4) if bp == 1 else (1, 2)
    for p in probes:
        for rr in (False, True):
            ivf.set_rescore_rows(rr)
            qps, dlv, rec = bench._sustained_stream(
                ivf, queries, nq, k, n_probes=p, pass_1=None,
                true_sets=true_sets)
            print(f"bp={bp} exact P={p} rr={int(rr)}: "
                  f"recall10@10={rec:.4f} QPS={qps:,.0f} "
                  f"(delivered {dlv:,.0f})", flush=True)
        ivf.set_rescore_rows(False)
print("done", flush=True)
