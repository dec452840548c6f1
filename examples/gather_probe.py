#!/usr/bin/env python3
"""Pin the cost of each decode/rescore gather at GloVe P=10 shapes.

rescore_bench showed the (Q, 444) row gather costs ~100 ms whether
rows are 400 B f32 or 200 B bf16 — gather-ISSUE-bound (~44 gathered
rows/us), not bandwidth-bound. The select stage's decode has two more
multi-million-element gathers (csr_ids[rows] and the rowbase
take_along_axis); this measures each op alone to decide which to
defer until after the final top-k.

Usage: python examples/gather_probe.py
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax                                         # noqa: E402
import jax.numpy as jnp                            # noqa: E402

from tinyknn_tpu import utils                      # noqa: E402

parser = argparse.ArgumentParser()
parser.add_argument("--q", type=int, default=10000)
parser.add_argument("--p1", type=int, default=444)
parser.add_argument("--rows", type=int, default=9469056 // 8)
parser.add_argument("--d", type=int, default=100)
parser.add_argument("--iters", type=int, nargs=2, default=[2, 8])
args = parser.parse_args()

utils.enable_compilation_cache()
rng = np.random.default_rng(0)
Q, p1, n_rows, d = args.q, args.p1, args.rows, args.d
csr_ids = jnp.asarray(rng.integers(0, 10**6, n_rows).astype(np.int32))
rows = jnp.asarray(rng.integers(0, n_rows, (Q, p1)).astype(np.int32))
base = jnp.asarray(rng.integers(0, n_rows, (Q, 10)).astype(np.int32))
probe_of = jnp.asarray(rng.integers(0, 10, (Q, p1)).astype(np.int32))
pool = jnp.asarray(rng.integers(0, 2**30, (Q, 4608)).astype(np.int32))
top_pos = jnp.asarray(
    rng.integers(0, 4608, (Q, p1)).astype(np.int32))
data = jnp.asarray(rng.standard_normal((10**6 + 10**4, d),
                                       dtype=np.float32))
jax.block_until_ready((csr_ids, rows, base, data))
N1, N2 = args.iters


def timed(name, fn, *arrs, n1=N1, n2=N2):
    def loop(nn):
        @jax.jit
        def run(x0, *a):
            return jax.lax.fori_loop(
                0, nn, lambda i, acc: fn(acc, *a) + i, x0)
        return run
    run1, run2 = loop(n1), loop(n2)
    for attempt in range(3):
        try:
            jax.block_until_ready(run1(jnp.int32(1), *arrs))
            jax.block_until_ready(run2(jnp.int32(1), *arrs))
            break
        except Exception as e:
            if attempt == 2:
                raise
            print(f"  (retrying {name}: {type(e).__name__})", flush=True)
            time.sleep(90)
    t1 = t2 = float("inf")
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(run1(jnp.int32(1), *arrs))
        t1 = min(t1, time.time() - t0)
        t0 = time.time()
        jax.block_until_ready(run2(jnp.int32(1), *arrs))
        t2 = min(t2, time.time() - t0)
    ms = (t2 - t1) / (n2 - n1) * 1000
    print(f"{name:<46} {ms:8.2f} ms", flush=True)
    return ms


def g_elem(acc, rows_a, ids_a):
    r2 = rows_a.at[0, 0].set(acc % 7)
    return jnp.sum(ids_a[r2])


def g_takealong(acc, probe_a, base_a):
    p2 = probe_a.at[0, 0].set(acc % 7)
    return jnp.sum(jnp.take_along_axis(base_a, p2, axis=1))


def g_pool_takealong(acc, pos_a, pool_a):
    p2 = pos_a.at[0, 0].set(acc % 7)
    return jnp.sum(jnp.take_along_axis(pool_a, p2, axis=1))


def g_rowgather(acc, rows_a, data_a):
    r2 = rows_a.at[0, 0].set(acc % 7)
    g = data_a[r2 % (10**6)]
    return jnp.sum(g).astype(jnp.int32)


def g_arith(acc, pos_a, base_a):
    p2 = pos_a.at[0, 0].set(acc % 7)
    x = (p2 & 4095) + jnp.where(p2 < 2304, 0, 1)
    return jnp.sum(jnp.minimum(x, 12345))


timed(f"element gather ids[rows] (Q={Q}, p1={p1})", g_elem,
      rows, csr_ids)
timed(f"take_along base(Q,10) by (Q,{p1})", g_takealong,
      probe_of, base)
timed(f"take_along pool(Q,4608) by (Q,{p1})", g_pool_takealong,
      top_pos, pool)
timed(f"row gather data[rows] (Q,{p1},{d})", g_rowgather,
      rows, data)
timed("arith-only decode ops", g_arith, top_pos, base)
