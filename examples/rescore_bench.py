#!/usr/bin/env python3
"""Rescore-stage variants + tournament-select recall at GloVe scale.

select_bench.py showed the exact rescore (a (Q, p1) random row gather
of ~400 B rows) runs at ~2% of HBM peak and now co-dominates the query
with selection. Variants timed here, all producing identical top-k
semantics (exact distances on the survivors):

  dense-f32   — current: data[cand] with data in original row order
  dense-bf16  — same gather at half the bytes (f32 norms + bf16 cross
                term keep ranking error ~1e-3 relative)
  csr-f32     — vectors stored in CSR tile order; candidates of one
                query cluster into its ~P probed lists -> locality
  csr-bf16    — both

Also measures end-to-end recall of tournament take-all selection
(O(n) group-min, no sort) vs approx_max_k at several widths — the
collision-loss cost that decides whether the 25x cheaper select can be
the default.

Usage: python examples/rescore_bench.py [--probes 10]
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

trus_file = ("trus_clustered-1183514-100_k_neighbours=10_"
             "num_queries=10000_metric='angular'.npy")
trus = np.load(trus_file) if os.path.isfile(trus_file) else None

k = args.k
P = args.probes
pass_1 = int(args.mult * ((P + 1) * k + 1))
k, P, pass_1, r, r_tail, qc, qc0 = ivfmod._query_params(
    ivf, nq, k, P, pass_1)
fold_mult = getattr(ivf, "fold_mult", ivfmod.FOLD_MULT)

q = jnp.asarray(queries)
q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
cb, Rm, dpb = ivf.pq.center_blocks, ivf.pq.R, ivf.pq.dims_per_block
ac = ivf.active_centers
B = cb.shape[0]
cap = ivf.max_tiles * LANE_TILE
col_bits = max(1, (cap - 1).bit_length())

tables = _build_tables(q, cb, Rm, dpb, True, ivf.pq.table_dtype).tables
tables_flat = permute_tables_csr(tables.reshape(nq, B * 16), B)
cn = jnp.einsum("cd,cd->c", ac, ac)
d2c = (jnp.einsum("qd,qd->q", q, q)[:, None] + cn[None, :]
       - 2.0 * q @ ac.T)
_, probe_sel = jax.lax.top_k(-d2c, P)

enc0, base0, _ = ivfmod._bucket_scan_round(
    probe_sel[:, :1], tables_flat, ivf.csr_codes, ivf.csr_ids,
    ivf.tile_offsets, ivf.list_counts, ivf.scan_map, qc=qc0, r=r,
    method="approx", scan_impl="fused", max_tiles=ivf.max_tiles,
    fold_mult=fold_mult)
pools, bases = [enc0], [base0]
if P > 1:
    enc1, base1, _ = ivfmod._bucket_scan_round(
        probe_sel[:, 1:], tables_flat, ivf.csr_codes, ivf.csr_ids,
        ivf.tile_offsets, ivf.list_counts, ivf.scan_map, qc=qc,
        r=r_tail, method="approx", scan_impl="fused",
        max_tiles=ivf.max_tiles, fold_mult=fold_mult)
    pools.append(enc1)
    bases.append(base1)
pool = jnp.concatenate([p.reshape(nq, -1) for p in pools], axis=1)
base = jnp.concatenate(bases, axis=1)
jax.block_until_ready(pool)
n = pool.shape[1]
p1 = min(pass_1, n)
print(f"pool width n={n}, p1={p1}", flush=True)

# survivors of the current (approx) selection, for rescore timing
cand, rows, _enc = ivfmod._select_pool_enc(pools, bases, p1, "approx",
                                           col_bits, ivf.csr_ids)
jax.block_until_ready(cand)

data_dev = ivf.data
csr_ids = ivf.csr_ids
# CSR-ordered raw vectors: one device gather at "build" time
csr_vecs = data_dev[jnp.maximum(csr_ids, 0)]
csr_norms = jnp.einsum("nd,nd->n", csr_vecs, csr_vecs)
data_bf16 = data_dev.astype(jnp.bfloat16)
csr_bf16 = csr_vecs.astype(jnp.bfloat16)
jax.block_until_ready(csr_bf16)
N1, N2 = args.iters


def timed(name, fn, *arrs, n1=N1, n2=N2):
    def loop(n_):
        @jax.jit
        def run(x0, *a):
            return jax.lax.fori_loop(
                0, n_, lambda i, acc: fn(acc, *a) + i, x0)
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


# ---- rescore variants (identical output contract: exact top-k ids)
def resc_dense_f32(acc, cand, q, data):
    c2 = cand.at[0, 0].set(acc % 7)
    g = data[jnp.maximum(c2, 0)]
    diff = g - q[:, None, :]
    d2 = jnp.einsum("qrd,qrd->qr", diff, diff)
    d2 = jnp.where(c2 >= 0, d2, jnp.inf)
    _, best = jax.lax.top_k(-d2, k)
    return jnp.sum(jnp.take_along_axis(c2, best, axis=1))


def resc_dense_bf16(acc, cand, q, data16):
    c2 = cand.at[0, 0].set(acc % 7)
    g = data16[jnp.maximum(c2, 0)]                 # (Q, p1, d) bf16
    # expanded form: f32 norms + bf16 cross with f32 accumulation
    xn = jnp.einsum("qrd,qrd->qr", g, g,
                    preferred_element_type=jnp.float32)
    cross = jnp.einsum("qrd,qd->qr", g, q.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
    d2 = xn - 2.0 * cross
    d2 = jnp.where(c2 >= 0, d2, jnp.inf)
    _, best = jax.lax.top_k(-d2, k)
    return jnp.sum(jnp.take_along_axis(c2, best, axis=1))


def resc_csr_f32(acc, rows, cand, q, vecs):
    r2 = rows.at[0, 0].set(acc % 7)
    g = vecs[r2]
    diff = g - q[:, None, :]
    d2 = jnp.einsum("qrd,qrd->qr", diff, diff)
    d2 = jnp.where(cand >= 0, d2, jnp.inf)
    _, best = jax.lax.top_k(-d2, k)
    return jnp.sum(jnp.take_along_axis(cand, best, axis=1))


def resc_csr_bf16(acc, rows, cand, q, vecs16, norms):
    r2 = rows.at[0, 0].set(acc % 7)
    g = vecs16[r2]
    xn = norms[r2]
    cross = jnp.einsum("qrd,qd->qr", g, q.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
    d2 = xn - 2.0 * cross
    d2 = jnp.where(cand >= 0, d2, jnp.inf)
    _, best = jax.lax.top_k(-d2, k)
    return jnp.sum(jnp.take_along_axis(cand, best, axis=1))


timed(f"rescore dense f32  (w={p1})", resc_dense_f32, cand, q, data_dev)
timed(f"rescore dense bf16 (w={p1})", resc_dense_bf16, cand, q,
      data_bf16)
timed(f"rescore csr   f32  (w={p1})", resc_csr_f32, rows, cand, q,
      csr_vecs)
timed(f"rescore csr   bf16 (w={p1})", resc_csr_bf16, rows, cand, q,
      csr_bf16, csr_norms)


# ---- tournament take-all: recall + end-to-end shape
def tournament(p, G):
    nq_, n_ = p.shape
    g = -(-n_ // G)
    g = 1 << (g - 1).bit_length()
    padded = jnp.full((nq_, G * g), jnp.int32(ivfmod.ENC_INVALID))
    padded = jax.lax.dynamic_update_slice(padded, p, (0, 0))
    vals = padded.reshape(nq_, G, g)
    idx = jnp.broadcast_to(
        jnp.arange(G * g, dtype=jnp.int32).reshape(1, G, g),
        vals.shape)
    while vals.shape[2] > 1:
        h = vals.shape[2] // 2
        a, b = vals[:, :, :h], vals[:, :, h:]
        ia, ib = idx[:, :, :h], idx[:, :, h:]
        take_a = a <= b
        vals = jnp.where(take_a, a, b)
        idx = jnp.where(take_a, ia, ib)
    return vals[:, :, 0], idx[:, :, 0]


def decode(enc_sel, top_pos):
    pos = enc_sel & jnp.int32((1 << col_bits) - 1)
    S0 = pools[0].shape[1] * pools[0].shape[2]
    St = pools[1].shape[2] if len(pools) > 1 else 1
    probe_of = jnp.where(top_pos < S0, 0,
                         1 + (top_pos - S0) // St).astype(jnp.int32)
    probe_of = jnp.minimum(probe_of, base.shape[1] - 1)
    rowbase = jnp.take_along_axis(base, probe_of, axis=1)
    rows_ = jnp.minimum(rowbase + pos, csr_ids.shape[0] - 1)
    valid = enc_sel < jnp.int32(ivfmod.ENC_INVALID)
    rows_ = jnp.where(valid, rows_, 0)
    return jnp.where(valid, csr_ids[rows_], -1), rows_


def _rescore_ids(c, rws, q, vecs, ids):
    g = vecs[rws]
    diff = g - q[:, None, :]
    d2 = jnp.einsum("qrd,qrd->qr", diff, diff)
    d2 = jnp.where(c >= 0, d2, jnp.inf)
    _, best = jax.lax.top_k(-d2, k)
    out = jnp.take_along_axis(c, best, axis=1)
    d2b = jnp.take_along_axis(d2, best, axis=1)
    return jnp.where(jnp.isfinite(d2b), out, -1)


from functools import partial                      # noqa: E402


@partial(jax.jit, static_argnums=(4,))
def query_tournament(pool, base, q, vecs, G, ids):
    vals, idx = tournament(pool, G)
    c, rws = decode(vals, idx)
    return _rescore_ids(c, rws, q, vecs, ids)


@jax.jit
def query_approx(cand, rows, q, vecs, ids):
    return _rescore_ids(cand, rows, q, vecs, ids)


def recall_of(out):
    if trus is None:
        return float("nan")
    out = np.asarray(out)
    return np.mean([len(set(t.tolist()) & set(g_.tolist())) / k
                    for t, g_ in zip(trus, out)])


print(f"recall approx top-{p1} baseline: "
      f"{recall_of(query_approx(cand, rows, q, csr_vecs, csr_ids)):.4f}",
      flush=True)
for G in (512, 1024, 2048):
    G_ = min(G, n)
    rec = recall_of(query_tournament(pool, base, q, csr_vecs, G_,
                                     csr_ids))
    print(f"recall tournament take-all G={G_}: {rec:.4f}", flush=True)
