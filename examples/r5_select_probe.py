#!/usr/bin/env python3
"""Race candidate-selection variants for _select_pool_enc on device.

Selection is the dominant stage of BOTH engines (docs/PERFORMANCE.md
stage tables: 7.5 of 14 ms at exact P=1, ~100 of 213 ms at PQ P=10),
and it runs far below HBM bandwidth (~12 GB/s effective) — the cost
is the approx_max_k PartialReduce lowering, not data movement. This
probe races drop-in variants at both production pool shapes:

  A: exact engine P=1 — pool (10000, 2304) int32, p1=40
  B: PQ path P=10    — pool (10000, 4608) int32, p1=444

Variants (all return the selected encodings + positions, the same
contract as _select_pool_enc):

  approx95   bitcast approx_max_k, recall_target=0.95 (CURRENT)
  approx80   bitcast approx_max_k, recall_target=0.80
  approx60   bitcast approx_max_k, recall_target=0.60
  int_topk   lax.top_k on the negated int32 pool
  tile{m}    two-stage: per-128-lane-tile top_k(m) then global
             top_k(p1) over T*m survivors (lossy when >m of the
             true top-p1 share one tile)

Each variant also reports selection QUALITY on the same pools:
  ov@p1  mean fraction of the true p1 smallest encodings recovered
  ov@10  mean fraction of the true 10 smallest recovered (the ones
         the final top-k actually needs; rescore forgives the rest)

Timing is fori_loop-marginal (body perturbs one pool element via the
carry so XLA cannot hoist; Delta time / Delta reps cancels the
~28.5 ms relay constant — docs/PERFORMANCE.md methodology).

Usage: python examples/r5_select_probe.py [--shapes A B] [--iters 2 8]
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
from tinyknn_tpu.models.ivf import ENC_INVALID     # noqa: E402

parser = argparse.ArgumentParser()
parser.add_argument("--shapes", nargs="+", default=["A", "B"])
parser.add_argument("--iters", type=int, nargs=2, default=[2, 8])
parser.add_argument("--q", type=int, default=10000)
args = parser.parse_args()

utils.enable_compilation_cache()

SHAPES = {
    # name -> (n_cols, p1, tile stage-1 widths to try)
    "A": (2304, 40, (4, 8)),
    "B": (4608, 444, (16, 24)),
}


def make_pool(rng, q, n):
    """Realistic encoded pool: non-negative int32, ~15% empty slots."""
    v = rng.integers(0, 1 << 30, size=(q, n), dtype=np.int64)
    empty = rng.random((q, n)) < 0.15
    v[empty] = ENC_INVALID
    return jnp.asarray(v.astype(np.int32))


def as_f(pool):
    f = jax.lax.bitcast_convert_type(pool, jnp.float32)
    return jnp.where(pool >= jnp.int32(0x7F800000), jnp.inf, f)


def mk_approx(p1, rt):
    def sel(pool):
        f = as_f(pool)
        negv, pos = jax.lax.approx_max_k(-f, p1, recall_target=rt)
        enc = jax.lax.bitcast_convert_type(-negv, jnp.int32)
        return enc, pos
    return sel


def mk_int_topk(p1):
    def sel(pool):
        negv, pos = jax.lax.top_k(-pool, p1)
        return -negv, pos
    return sel


def mk_tile(p1, m):
    def sel(pool):
        qn, n = pool.shape
        t = n // 128
        f = as_f(pool).reshape(qn, t, 128)
        negv, lpos = jax.lax.top_k(-f, m)              # (Q, T, m)
        gpos = (jnp.arange(t, dtype=jnp.int32)[None, :, None] * 128
                + lpos.astype(jnp.int32)).reshape(qn, t * m)
        cand = (-negv).reshape(qn, t * m)
        negv2, ppos = jax.lax.top_k(-cand, p1)         # (Q, p1)
        enc = jax.lax.bitcast_convert_type(-negv2, jnp.int32)
        enc = jnp.where(enc >= jnp.int32(0x7F800000),
                        jnp.int32(ENC_INVALID), enc)
        pos = jnp.take_along_axis(gpos, ppos, axis=1)
        return enc, pos
    return sel


def timed(name, sel, pool, n1, n2, _retries=2):
    def loop(n):
        @jax.jit
        def run(x0, pl):
            def body(i, acc):
                p2 = pl.at[0, 0].set(acc & jnp.int32(0x3FFFFFFF))
                enc, pos = sel(p2)
                return jnp.sum(enc) + jnp.sum(pos) + i
            return jax.lax.fori_loop(0, n, body, x0)
        return run
    run1, run2 = loop(n1), loop(n2)
    for attempt in range(_retries + 1):
        try:
            jax.block_until_ready(run1(jnp.int32(1), pool))
            jax.block_until_ready(run2(jnp.int32(1), pool))
            break
        except Exception as e:          # flaky remote compile service
            if attempt == _retries:
                raise
            print(f"  (retrying {name}: {type(e).__name__})", flush=True)
            time.sleep(90)
    t1 = t2 = float("inf")
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(run1(jnp.int32(1), pool))
        t1 = min(t1, time.time() - t0)
        t0 = time.time()
        jax.block_until_ready(run2(jnp.int32(1), pool))
        t2 = min(t2, time.time() - t0)
    return (t2 - t1) / (n2 - n1) * 1000


@jax.jit
def overlap(enc_sel, truth):
    """Mean fraction of `truth` rows present in enc_sel rows."""
    hit = jnp.any(truth[:, :, None] == enc_sel[:, None, :], axis=2)
    return jnp.mean(hit.astype(jnp.float32))


rng = np.random.default_rng(7)
N1, N2 = args.iters
for shape in args.shapes:
    n, p1, tile_ms = SHAPES[shape]
    pool = make_pool(rng, args.q, n)
    # device-side exact ground truth (int top_k = true smallest)
    truth_p1, _ = mk_int_topk(p1)(pool)
    truth_10, _ = mk_int_topk(10)(pool)
    jax.block_until_ready(truth_p1)
    variants = [
        ("approx95 (current)", mk_approx(p1, 0.95)),
        ("approx80", mk_approx(p1, 0.80)),
        ("approx60", mk_approx(p1, 0.60)),
        ("int_topk", mk_int_topk(p1)),
    ] + [(f"tile{m}", mk_tile(p1, m)) for m in tile_ms]
    print(f"\n== shape {shape}: pool ({args.q}, {n}) int32, p1={p1} ==",
          flush=True)
    for name, sel in variants:
        ms = timed(name, sel, pool, N1, N2)
        enc, _ = jax.jit(sel)(pool)
        ov1 = float(overlap(enc, truth_p1))
        ov10 = float(overlap(enc, truth_10))
        print(f"{name:<20} {ms:8.2f} ms   ov@p1={ov1:.4f} "
              f"ov@10={ov10:.4f}", flush=True)
