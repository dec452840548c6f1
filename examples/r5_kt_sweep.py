#!/usr/bin/env python3
"""Estimate-kernel multi-tile (kt) sweep on hardware.

VERDICT r4 #8: the full-scan estimate kernel issued ONE (q_pad, 16B) x
(16B, 128) MXU contraction per 128-point tile — N=128 is a single MXU
output tile, so the array never pipelines. kt tiles per grid step make
N = kt*128. This measures the marginal per-batch time of the kernel
alone at kt in {1, 2, 4, 8, 16}, then the headline pipeline
(tables + estimate, bench.py methodology) at the best kt.

Methodology: R reps inside one jit (lax.map over jittered tables),
scalar readback; marginal = (t(R2) - t(R1)) / (R2 - R1) to cancel the
relay's fixed dispatch cost.
"""
import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from tinyknn_tpu import FastPQ, utils
from tinyknn_tpu.ops.kernels import estimate_scan_tiled, tile_codes
from tinyknn_tpu.ops.packing import pack_codes

utils.enable_compilation_cache()

n, d, Q = 16000, 128, 1000
rng = np.random.default_rng(0)
X = rng.standard_normal((n, d), dtype=np.float32)
qs = rng.standard_normal((Q, d), dtype=np.float32)

pq = FastPQ(2, rotate_dim=None)
data = pq.fit_transform(X)
codes_tiled = tile_codes(pack_codes(jnp.asarray(np.asarray(data.codes))))
tables = np.asarray(pq.distance_table(qs).tables, dtype=np.int8)
B = tables.shape[1]
print(f"n={n} B={B} Q={Q}; tiles={codes_tiled.shape}", flush=True)

t0 = time.time()
assert float((jnp.ones((8, 8)) @ jnp.ones((8, 8))).sum()) == 512.0
print(f"chip probe ok in {time.time()-t0:.1f}s", flush=True)


def marginal(kt, R1=20, R2=60):
    def run(R):
        jt = (jnp.asarray(tables)[None]
              + jnp.zeros((R, 1, 1, 1), jnp.int8))

        @jax.jit
        def f(jt):
            def body(t):
                return estimate_scan_tiled(codes_tiled, t, kt=kt).sum()
            return jax.lax.map(body, jt).sum()

        f(jt).block_until_ready()  # compile+warm
        el = float("inf")
        for _ in range(3):
            t0 = time.time()
            f(jt).block_until_ready()
            el = min(el, time.time() - t0)
        return el

    e1, e2 = run(R1), run(R2)
    return (e2 - e1) / (R2 - R1)


work_gops = 2 * Q * 16 * B * (codes_tiled.shape[0] * 128) / 1e9
for kt in (1, 2, 4, 8, 16):
    ms = marginal(kt) * 1000
    print(f"kt={kt:>2}: {ms:7.3f} ms/batch  "
          f"{Q/ms*1000:,.0f} QPS  "
          f"{work_gops/ms:6.1f} effective TOPS", flush=True)
print("done", flush=True)
