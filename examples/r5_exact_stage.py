#!/usr/bin/env python3
"""Per-stage timing of the EXACT-engine IVF query at GloVe scale.

The exact engine (scan_impl='exact') is the flagship serving engine
(recall 0.97-1.0, docs/PERFORMANCE.md) but only end-to-end marginals
exist for it — the per-stage table in docs/PERFORMANCE.md covers the
PQ path. Same methodology as examples/stage_ablation.py: each stage
runs inside a jitted lax.fori_loop whose carry perturbs the stage
input (a data dependency XLA cannot hoist), timed at the margin so
the ~28.5 ms relay dispatch constant cancels.

Stages (the exact path of models/ivf.py _ivf_query):
  1. query augmentation ([-2q, 1, 1, ||q||^2] bf16 — replaces tables)
  2. probe top-P (exact d2c on MXU, HIGHEST)
  3. round-0 exact scan (scan_exact_csr over the nearest clusters)
  4. tail exact scan (P > 1 only)
  5. encoded select + survivor decode (bitcast approx_max_k)
  6. thin exact f32 rescore + final top-k

Usage: python examples/r5_exact_stage.py [--probes 1] [--iters 2 8]
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
from tinyknn_tpu.io import load_ivf                # noqa: E402
from tinyknn_tpu.models import ivf as ivfmod       # noqa: E402
from tinyknn_tpu.ops.kernels import LANE_TILE      # noqa: E402

parser = argparse.ArgumentParser()
parser.add_argument("--probes", type=int, default=1)
parser.add_argument("--k", type=int, default=10)
parser.add_argument("--pass-1", type=int, default=None,
                    help="rescore-sliver width (default 4*k*P)")
parser.add_argument("--iters", type=int, nargs=2, default=[2, 8])
parser.add_argument("--index", default="ivf_clustered-1183514-100_"
                    "angular_num_clusters=1087_dims_per_block=2_"
                    "build_probes=1.npz")
args = parser.parse_args()

utils.enable_compilation_cache()
print("loading index...", flush=True)
ivf = load_ivf(args.index)
ivf.set_scan_impl("exact")

size, dim, nq = 1183514, 100, 10000
_, queries = utils.make_clustered(size, dim, nq)

k = args.k
P = args.probes
k, P, pass_1, r, r_tail, qc, qc0 = ivfmod._query_params(
    ivf, nq, k, P, args.pass_1)
fold_mult = getattr(ivf, "fold_mult", ivfmod.FOLD_MULT)
w0 = ivfmod._fold_tiles(r, ivf.max_tiles, fold_mult)
wt = ivfmod._fold_tiles(r_tail, ivf.max_tiles, fold_mult)
f = min(getattr(ivf, "build_probes", 2), P)
print(f"P={P} pass_1={pass_1} r={r} r_tail={r_tail} qc={qc} qc0={qc0} "
      f"W0={w0} Wt={wt} tiles max={ivf.max_tiles}", flush=True)

q = jnp.asarray(queries)
q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
ac = ivf.active_centers
C = ivf.tile_offsets.shape[0]
cap = ivf.max_tiles * LANE_TILE

# ---- precompute each stage's input once (on device)
tables_flat = ivfmod._augment_queries(q)             # (Q, d_aug) bf16
qn = jnp.einsum("qd,qd->q", q, q,
                precision=jax.lax.Precision.HIGHEST)
cn = jnp.einsum("cd,cd->c", ac, ac,
                precision=jax.lax.Precision.HIGHEST)
d2c = (qn[:, None] + cn[None, :]
       - 2.0 * jax.lax.dot_general(
           q, ac, (((1,), (1,)), ((), ())),
           preferred_element_type=jnp.float32,
           precision=jax.lax.Precision.HIGHEST))
_, probe_sel = jax.lax.top_k(-d2c, P)

enc0, base0, _ = ivfmod._bucket_scan_round(
    probe_sel[:, :1], tables_flat, ivf.csr_vecs, ivf.csr_ids,
    ivf.tile_offsets, ivf.list_counts, ivf.scan_map, qc=qc0, r=r,
    method="approx", scan_impl="exact", max_tiles=ivf.max_tiles,
    fold_mult=fold_mult)
pools = [enc0]
bases = [base0]
if P > 1:
    enc1, base1, _ = ivfmod._bucket_scan_round(
        probe_sel[:, 1:], tables_flat, ivf.csr_vecs, ivf.csr_ids,
        ivf.tile_offsets, ivf.list_counts, ivf.scan_map, qc=qc,
        r=r_tail, method="approx", scan_impl="exact",
        max_tiles=ivf.max_tiles, fold_mult=fold_mult)
    pools.append(enc1)
    bases.append(base1)
p1 = min(f * pass_1, sum(p.shape[1] * p.shape[2] for p in pools))
cand, _rows, _enc = ivfmod._select_pool_enc(pools, bases, p1, "approx",
                                            16, ivf.csr_ids)
jax.block_until_ready(cand)
print(f"pool width={sum(p.shape[1] * p.shape[2] for p in pools)} "
      f"p1={p1}", flush=True)


def timed(name, body, n1, n2, *arrs, _retries=2):
    """Marginal per-iteration time of ``body(acc, *arrs) -> acc``.

    Big arrays MUST ride in ``arrs`` (jit arguments): a closure embeds
    them as constants in the remote-compile payload; the bf16 tile
    archive alone is ~265 MB -> HTTP 413 from the compile service."""
    def loop(n):
        @jax.jit
        def run(x0, *a):
            return jax.lax.fori_loop(
                0, n, lambda i, acc: body(acc, *a) + i, x0)
        return run
    run1, run2 = loop(n1), loop(n2)
    for attempt in range(_retries + 1):
        try:
            jax.block_until_ready(run1(jnp.int32(1), *arrs))
            jax.block_until_ready(run2(jnp.int32(1), *arrs))
            break
        except Exception as e:          # flaky remote compile service
            if attempt == _retries:
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


N1, N2 = args.iters

# Checksums SUM the whole stage output (element reads would let XLA
# dead-code-eliminate the gathers feeding them).
def s_augment(acc):
    qq = q + acc.astype(jnp.float32) * 1e-9
    t = ivfmod._augment_queries(qq)
    return jnp.sum(t.astype(jnp.float32)).astype(jnp.int32)

def s_probe(acc):
    qq = q + acc.astype(jnp.float32) * 1e-9
    d2 = (jnp.einsum("qd,qd->q", qq, qq,
                     precision=jax.lax.Precision.HIGHEST)[:, None]
          + cn[None, :]
          - 2.0 * jax.lax.dot_general(
              qq, ac, (((1,), (1,)), ((), ())),
              preferred_element_type=jnp.float32,
              precision=jax.lax.Precision.HIGHEST))
    _, sel = jax.lax.top_k(-d2, P)
    return jnp.sum(sel)

def mk_scan(sub, qc_r, r_r):
    def s_scan(acc, vecs_a, ids_a):
        tf = tables_flat + (acc & 1).astype(jnp.bfloat16) * 1e-9
        enc, base, dropped = ivfmod._bucket_scan_round(
            sub, tf, vecs_a, ids_a, ivf.tile_offsets,
            ivf.list_counts, ivf.scan_map, qc=qc_r, r=r_r,
            method="approx", scan_impl="exact",
            max_tiles=ivf.max_tiles, fold_mult=fold_mult)
        return (jax.lax.reduce(enc, jnp.int32(0), jax.lax.min, (0, 1, 2))
                + jnp.sum(base) + dropped)
    return s_scan

def s_select(acc, ids_a):
    p0 = pools[0].at[0, 0, 0].set(acc)
    cand2, rows2, _ = ivfmod._select_pool_enc(
        [p0] + pools[1:], bases, p1, "approx", 16, ids_a)
    return jnp.sum(cand2) + jnp.sum(rows2)

def s_rescore(acc, cand_a, q_a, data_a):
    c2 = cand_a.at[0, 0].set(acc % 7)
    gathered = data_a[jnp.maximum(c2, 0)]
    diff = gathered - q_a[:, None, :]
    d2 = jnp.einsum("qrd,qrd->qr", diff, diff,
                    precision=jax.lax.Precision.HIGHEST)
    d2 = jnp.where(c2 >= 0, d2, jnp.inf)
    _, best = jax.lax.top_k(-d2, k)
    out = jnp.take_along_axis(c2, best, axis=1)
    return jnp.sum(out)


total = 0.0
total += timed("query augment (bf16 layout)", s_augment, N1, N2)
total += timed("probe top-P (exact d2c)", s_probe, N1, N2)
total += timed(f"round-0 exact scan (qc0={qc0}, W={w0})",
               mk_scan(probe_sel[:, :1], qc0, r), N1, N2,
               ivf.csr_vecs, ivf.csr_ids)
if P > 1:
    total += timed(f"tail exact scan (qc={qc}, W={wt})",
                   mk_scan(probe_sel[:, 1:], qc, r_tail), N1, N2,
                   ivf.csr_vecs, ivf.csr_ids)
total += timed(f"encoded select+decode (p1={p1})", s_select, N1, N2,
               ivf.csr_ids)
total += timed(f"thin f32 rescore (p1={p1})", s_rescore, N1, N2,
               cand, q, ivf.data)
print(f"{'TOTAL (sum of stages)':<46} {total:8.2f} ms", flush=True)
