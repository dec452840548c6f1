#!/usr/bin/env python3
"""Headline decomposition: tables-build vs estimate-scan marginals.

The full-scan headline (bench.py fastpq_fullscan) = distance-table
build + estimate scan. The round-5 kt sweep puts the scan alone at
~0.17 ms / 1k queries (189 effective TOPS); this probe measures the
tables marginal and the combined pipeline to find where the remaining
~0.11 ms lives.
"""
import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from tinyknn_tpu import FastPQ, utils
from tinyknn_tpu.models.fast_pq import _build_tables
from tinyknn_tpu.ops.scan import estimate_scan

utils.enable_compilation_cache()

n, d, Q = 16000, 128, 1000
rng = np.random.default_rng(0)
X = rng.standard_normal((n, d), dtype=np.float32)
qs = rng.standard_normal((Q, d), dtype=np.float32)

pq = FastPQ(2, rotate_dim=None)
data = pq.fit_transform(X)

t0 = time.time()
assert float((jnp.ones((8, 8)) @ jnp.ones((8, 8))).sum()) == 512.0
print(f"chip probe ok in {time.time()-t0:.1f}s", flush=True)


def marginal(make_fn, R1=20, R2=60):
    def run(R):
        jq = (jnp.asarray(qs)[None]
              + jnp.arange(R, dtype=jnp.float32)[:, None, None] * 1e-6)
        f = jax.jit(make_fn)
        f(jq).block_until_ready()
        el = float("inf")
        for _ in range(3):
            t0 = time.time()
            f(jq).block_until_ready()
            el = min(el, time.time() - t0)
        return el
    e1, e2 = run(R1), run(R2)
    return (e2 - e1) / (R2 - R1) * 1000


codes = data.packed
cb, backend = pq.center_blocks, pq.backend


def tables_only(jq):
    def body(q):
        qt = _build_tables(q, cb, None, 2, True)
        return qt.tables.astype(jnp.int32)[0, 0, 0] + qt.tables[-1, -1, -1]
    return jax.lax.map(body, jq).sum()


def full(jq):  # bench.py fastpq_fullscan body, verbatim semantics
    def body(q):
        qt = _build_tables(q, cb, None, 2, True)
        est = estimate_scan(codes, qt.tables, backend, packed=True)
        return est[0, 0] + est[n - 1, n - 1] * 0 + est[Q - 1, n - 1]
    return jax.lax.map(body, jq).sum()


print(f"tables-only marginal: {marginal(tables_only):7.3f} ms/batch",
      flush=True)
ms = marginal(full)
print(f"tables+estimate marginal: {ms:7.3f} ms/batch -> "
      f"{Q/ms*1000:,.0f} QPS", flush=True)
print("done", flush=True)
