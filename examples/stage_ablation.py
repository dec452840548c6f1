#!/usr/bin/env python3
"""Per-stage timing of the fused IVF query at GloVe scale.

Each stage runs inside a jitted lax.fori_loop whose carry perturbs the
stage input (a data dependency XLA cannot hoist), timed at the margin
(Delta time / Delta iterations) so the ~28.5 ms relay dispatch constant
cancels. This is the methodology behind the "Where the time goes"
table in docs/PERFORMANCE.md; the round-2 version of that table was
derived by subtracting whole-pipeline variants, which mis-attributed
costs that only appear in combination.

Usage: python examples/stage_ablation.py [--probes 10] [--mult 4]
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
from tinyknn_tpu.models.fast_pq import _build_tables  # noqa: E402
from tinyknn_tpu.models import ivf as ivfmod       # noqa: E402
from tinyknn_tpu.ops.kernels import (              # noqa: E402
    LANE_TILE, permute_tables_csr)

parser = argparse.ArgumentParser()
parser.add_argument("--probes", type=int, default=10)
parser.add_argument("--mult", type=float, default=4.0)
parser.add_argument("--k", type=int, default=10)
parser.add_argument("--iters", type=int, nargs=2, default=[2, 8])
parser.add_argument("--index", default="ivf_clustered-1183514-100_"
                    "angular_num_clusters=1087_dims_per_block=2_"
                    "build_probes=1.npz")
args = parser.parse_args()

utils.enable_compilation_cache()
print("loading index...", flush=True)
ivf = load_ivf(args.index)

size, dim, nq = 1183514, 100, 10000
_, queries = utils.make_clustered(size, dim, nq)

k = args.k
P = args.probes
pass_1 = int(args.mult * ((P + 1) * k + 1))
k, P, pass_1, r, r_tail, qc, qc0 = ivfmod._query_params(
    ivf, nq, k, P, pass_1)
fold_mult = getattr(ivf, "fold_mult", ivfmod.FOLD_MULT)
print(f"P={P} pass_1={pass_1} r={r} r_tail={r_tail} qc={qc} qc0={qc0} "
      f"fold_mult={fold_mult}", flush=True)

q = jnp.asarray(queries)
q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
cb, Rm, dpb = ivf.pq.center_blocks, ivf.pq.R, ivf.pq.dims_per_block
ac = ivf.active_centers
B = cb.shape[0]
cap = ivf.max_tiles * LANE_TILE

# ---- precompute each stage's input once (on device)
tables = _build_tables(q, cb, Rm, dpb, True, ivf.pq.table_dtype).tables
tables_flat = permute_tables_csr(tables.reshape(nq, B * 16), B)
qn = jnp.einsum("qd,qd->q", q, q)
cn = jnp.einsum("cd,cd->c", ac, ac)
d2c = qn[:, None] + cn[None, :] - 2.0 * q @ ac.T
_, probe_sel = jax.lax.top_k(-d2c, P)

enc0, base0, _ = ivfmod._bucket_scan_round(
    probe_sel[:, :1], tables_flat, ivf.csr_codes, ivf.csr_ids,
    ivf.tile_offsets, ivf.list_counts, ivf.scan_map, qc=qc0, r=r,
    method="approx", scan_impl="fused", max_tiles=ivf.max_tiles,
    fold_mult=fold_mult)
pools = [enc0]
bases = [base0]
if P > 1:
    enc1, base1, _ = ivfmod._bucket_scan_round(
        probe_sel[:, 1:], tables_flat, ivf.csr_codes, ivf.csr_ids,
        ivf.tile_offsets, ivf.list_counts, ivf.scan_map, qc=qc,
        r=r_tail, method="approx", scan_impl="fused",
        max_tiles=ivf.max_tiles, fold_mult=fold_mult)
    pools.append(enc1)
    bases.append(base1)
col_bits = max(1, (cap - 1).bit_length())
p1 = min(pass_1, sum(p.shape[1] * p.shape[2] for p in pools))
cand, _rows, _enc = ivfmod._select_pool_enc(pools, bases, p1, "approx",
                                            col_bits, ivf.csr_ids)
jax.block_until_ready(cand)

data_dev = ivf.data


def timed(name, body, n1, n2, *arrs, _retries=2):
    """Marginal per-iteration time of ``body(acc, *arrs) -> acc``.

    Big arrays MUST ride in ``arrs`` (jit arguments): a closure embeds
    them as constants in the remote-compile payload, and the raw-data
    array alone is 473 MB -> HTTP 413 from the compile service."""
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
    print(f"{name:<42} {ms:8.2f} ms", flush=True)
    return ms


N1, N2 = args.iters

# Checksums SUM the whole stage output: element reads would let XLA
# dead-code-eliminate everything not feeding those elements (gathers
# especially), silently timing a sliver of the stage.
def s_tables(acc):
    qq = q + acc.astype(jnp.float32) * 1e-9
    t = _build_tables(qq, cb, Rm, dpb, True, ivf.pq.table_dtype).tables
    tf = permute_tables_csr(t.reshape(nq, B * 16), B)
    return jnp.sum(tf.astype(jnp.int32))

# S2: probe selection (exact top-P over (Q, C))
def s_probe(acc):
    qq = q + acc.astype(jnp.float32) * 1e-9
    d2 = (jnp.einsum("qd,qd->q", qq, qq)[:, None] + cn[None, :]
          - 2.0 * qq @ ac.T)
    _, sel = jax.lax.top_k(-d2, P)
    return jnp.sum(sel)

# S3/S4: one bucketed scan round (bucketing + t_sel gather + Pallas
# fold kernel + per-pair pool gather), input perturbed via the tables
def mk_scan(sub, qc_r, r_r):
    def s_scan(acc):
        tf = tables_flat + (acc & 1).astype(jnp.int8)
        enc, base, dropped = ivfmod._bucket_scan_round(
            sub, tf, ivf.csr_codes, ivf.csr_ids, ivf.tile_offsets,
            ivf.list_counts, ivf.scan_map, qc=qc_r, r=r_r,
            method="approx", scan_impl="fused",
            max_tiles=ivf.max_tiles, fold_mult=fold_mult)
        return (jax.lax.reduce(enc, jnp.int32(0), jax.lax.min,
                               (0, 1, 2))
                + jnp.sum(base) + dropped)
    return s_scan

# S5: global encoded select + survivor decode
def s_select(acc):
    p0 = pools[0].at[0, 0, 0].set(acc)
    cand2, rows2, _ = ivfmod._select_pool_enc(
        [p0] + pools[1:], bases, p1, "approx", col_bits, ivf.csr_ids)
    return jnp.sum(cand2) + jnp.sum(rows2)

# S6: exact rescore + final top-k (data/cand ride as jit arguments)
def s_rescore(acc, cand_a, q_a, data_a):
    c2 = cand_a.at[0, 0].set(acc % 7)
    gathered = data_a[jnp.maximum(c2, 0)]
    diff = gathered - q_a[:, None, :]
    d2 = jnp.einsum("qrd,qrd->qr", diff, diff)
    d2 = jnp.where(c2 >= 0, d2, jnp.inf)
    _, best = jax.lax.top_k(-d2, k)
    out = jnp.take_along_axis(c2, best, axis=1)
    return jnp.sum(out)


total = 0.0
total += timed("tables + permute", s_tables, N1, N2)
total += timed("probe top-P", s_probe, N1, N2)
total += timed(f"round-0 scan (qc0={qc0}, W={ivfmod._fold_tiles(r, ivf.max_tiles, fold_mult)})",
               mk_scan(probe_sel[:, :1], qc0, r), N1, N2)
if P > 1:
    total += timed(f"tail scan (qc={qc}, W={ivfmod._fold_tiles(r_tail, ivf.max_tiles, fold_mult)})",
                   mk_scan(probe_sel[:, 1:], qc, r_tail), N1, N2)
total += timed(f"encoded select+decode (p1={p1})", s_select, N1, N2)
total += timed(f"exact rescore (p1={p1})", s_rescore, N1, N2,
               cand, q, data_dev)
print(f"{'TOTAL (sum of stages)':<42} {total:8.2f} ms", flush=True)
