#!/usr/bin/env python3
"""Selection-stage experiments at GloVe scale (the round-3 hot spot).

Round-3 stage ablation: at P=10/Q=10k the global pass-1 selection
(approx_max_k over the (Q, ~4.6k) encoded pool, k=444) costs ~156 ms
of a ~170 ms pipeline — XLA lowers large-k top-k to a full per-row
variadic sort. But pass-1 selection feeds an exact rescore that
re-ranks anyway, so it needs neither ordering nor exactness — just a
good candidate *set*. This times the alternatives on the real shapes:

  full        — whole _ivf_query, marginal in-jit (ground truth)
  approx-f32  — current: approx_max_k on the f32-converted pool
  topk-int    — lax.top_k on the int32 pool
  tourn+topk  — O(n) tournament group-min (val,idx) to ~G slots, then
                top_k on the reduced pool
  tourn-all   — tournament straight to the rescore width (no sort)
  rescore     — exact-rescore stage alone at two pool widths

Usage: python examples/select_bench.py [--probes 10] [--iters 2 8]
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
print(f"P={P} pass_1={pass_1} r={r} r_tail={r_tail} qc={qc} qc0={qc0}",
      flush=True)

q = jnp.asarray(queries)
q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
cb, Rm, dpb = ivf.pq.center_blocks, ivf.pq.R, ivf.pq.dims_per_block
ac = ivf.active_centers
B = cb.shape[0]
cap = ivf.max_tiles * LANE_TILE
col_bits = max(1, (cap - 1).bit_length())

# ---- build the real encoded pool once (on device)
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
pool = jnp.concatenate([p.reshape(nq, -1) for p in pools], axis=1)
base = jnp.concatenate(bases, axis=1)
jax.block_until_ready(pool)
n = pool.shape[1]
p1 = min(pass_1, n)
print(f"pool width n={n}, p1={p1}", flush=True)

data_dev = ivf.data
csr_ids = ivf.csr_ids
N1, N2 = args.iters


def timed(name, fn, *arrs, n1=N1, n2=N2):
    """fn(acc, *arrs) -> int32 checksum; arrays ride as jit ARGUMENTS
    (a closure would embed them as constants in the remote-compile
    payload — 473 MB of raw vectors gets HTTP 413)."""
    def loop(n):
        @jax.jit
        def run(x0, *a):
            return jax.lax.fori_loop(
                0, n, lambda i, acc: fn(acc, *a) + i, x0)
        return run
    run1, run2 = loop(n1), loop(n2)
    for attempt in range(3):
        try:
            jax.block_until_ready(run1(jnp.int32(1), *arrs))
            jax.block_until_ready(run2(jnp.int32(1), *arrs))
            break
        except Exception as e:          # flaky remote compile service
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


# ---- E1: the full pipeline, marginal (ground truth for stage sums)
def full(acc, q, cb_, Rm_, ac_, codes, ids, toff, counts, *smap_data):
    smap, data = smap_data[:-1], smap_data[-1]
    qq = q + acc.astype(jnp.float32) * 1e-9
    out, dropped = ivfmod._ivf_query(
        qq, cb_, Rm_, ac_, codes, ids, toff, counts, smap, data,
        dpb=dpb, metric="angular", k=k, n_probes=P, pass_1=pass_1,
        r=r, r_tail=r_tail, qc=qc, qc0=qc0, method="approx",
        scan_impl="fused", max_tiles=ivf.max_tiles, build_probes=1,
        table_dtype=ivf.pq.table_dtype, fold_mult=fold_mult)
    return jnp.sum(out) + dropped.astype(jnp.int32)


timed("FULL _ivf_query", full, q, cb, Rm, ac, ivf.csr_codes,
      ivf.csr_ids, ivf.tile_offsets, ivf.list_counts, *ivf.scan_map,
      data_dev)


# ---- E2: selection variants on the pool
def sel_approx(acc, pool, base, ids):
    p = pool.at[0, 0].set(acc)
    _, top_pos = jax.lax.approx_max_k(-p.astype(jnp.float32), p1)
    enc_sel = jnp.take_along_axis(p, top_pos, axis=1)
    return jnp.sum(enc_sel) + jnp.sum(top_pos)


def sel_topk_int(acc, pool, base, ids):
    p = pool.at[0, 0].set(acc)
    neg, top_pos = jax.lax.top_k(-p, p1)
    return jnp.sum(neg) + jnp.sum(top_pos)


def sel_bitcast(acc, pool, base, ids):
    """approx_max_k over the BITCAST pool: encodings are >= 0, so the
    IEEE f32 view of the int32 bits is order-identical — exact-order
    selection on the fast PartialReduce lowering, and the returned
    values bitcast straight back (no survivor re-gather)."""
    p = pool.at[0, 0].set(acc)
    f = jax.lax.bitcast_convert_type(p, jnp.float32)
    # mirror the production clamp (inf/NaN-bit sliver, not just the
    # sentinel) so the timed kernel matches _select_pool_enc
    f = jnp.where(p >= jnp.int32(0x7F800000), jnp.inf, f)
    negv, top_pos = jax.lax.approx_max_k(-f, p1)
    enc_sel = jax.lax.bitcast_convert_type(-negv, jnp.int32)
    return jnp.sum(enc_sel) + jnp.sum(top_pos)


def sel_bitcast_decode(acc, pool, base, ids):
    """The full stage: bitcast approx select + position decode + id
    gather (what _select_pool_enc must produce)."""
    p = pool.at[0, 0].set(acc)
    f = jax.lax.bitcast_convert_type(p, jnp.float32)
    f = jnp.where(p >= jnp.int32(0x7F800000), jnp.inf, f)
    negv, top_pos = jax.lax.approx_max_k(-f, p1)
    enc_sel = jax.lax.bitcast_convert_type(-negv, jnp.int32)
    valid = enc_sel < jnp.int32(0x7F800000)
    pos = enc_sel & jnp.int32((1 << col_bits) - 1)
    S0 = pools[0].shape[1] * pools[0].shape[2]
    if len(pools) > 1:
        St = pools[1].shape[2]
        probe_of = jnp.where(top_pos < S0, 0,
                             1 + (top_pos - S0) // St).astype(jnp.int32)
    else:
        probe_of = jnp.zeros_like(top_pos)
    rowbase = jnp.take_along_axis(base, probe_of, axis=1)
    rows = jnp.minimum(rowbase + pos, ids.shape[0] - 1)
    rows = jnp.where(valid, rows, 0)
    cand = jnp.where(valid, ids[rows], -1)
    return jnp.sum(cand) + jnp.sum(rows)


def tournament(p, G):
    """O(n) group-min (value, pool-index) reduction to G slots."""
    nq_, n_ = p.shape
    g = -(-n_ // G)
    g = 1 << (g - 1).bit_length()       # pow2 so halving is exact
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


def mk_tournament(G, then_topk):
    def sel(acc, pool, base, ids):
        p = pool.at[0, 0].set(acc)
        vals, idx = tournament(p, G)
        if then_topk:
            neg, tp = jax.lax.top_k(-vals, p1)
            idx = jnp.take_along_axis(idx, tp, axis=1)
            vals = -neg
        return jnp.sum(vals) + jnp.sum(idx)
    return sel


timed(f"select approx_max_k f32 (n={n}, k={p1})", sel_approx,
      pool, base, csr_ids)
timed(f"select top_k int32    (n={n}, k={p1})", sel_topk_int,
      pool, base, csr_ids)
timed(f"select bitcast approx (n={n}, k={p1})", sel_bitcast,
      pool, base, csr_ids)
timed(f"select bitcast + full decode (k={p1})", sel_bitcast_decode,
      pool, base, csr_ids)
G2 = min(n, max(128, -(-2 * p1 // 128) * 128))
G4 = min(n, max(128, -(-4 * p1 // 128) * 128))
timed(f"tournament->G={G4} + top_k {p1}",
      mk_tournament(G4, True), pool, base, csr_ids)
timed(f"tournament->G={G2} + top_k {p1}",
      mk_tournament(G2, True), pool, base, csr_ids)
timed(f"tournament->G={G2} take-all (no sort)",
      mk_tournament(G2, False), pool, base, csr_ids)


# ---- E3: rescore stage at two widths (data as argument, not constant)
def mk_rescore(width):
    def resc(acc, cand, q, data):
        c2 = cand[:, :width].at[0, 0].set(acc % 7)
        gathered = data[jnp.maximum(c2, 0)]
        diff = gathered - q[:, None, :]
        d2 = jnp.einsum("qrd,qrd->qr", diff, diff)
        d2 = jnp.where(c2 >= 0, d2, jnp.inf)
        _, best = jax.lax.top_k(-d2, k)
        out = jnp.take_along_axis(c2, best, axis=1)
        return jnp.sum(out)
    return resc


cand, _rows, _enc = ivfmod._select_pool_enc(pools, bases, min(2 * p1, n),
                                      "approx", col_bits, csr_ids)
jax.block_until_ready(cand)
timed(f"rescore width {p1}", mk_rescore(p1), cand, q, data_dev)
timed(f"rescore width {min(2 * p1, n)}", mk_rescore(min(2 * p1, n)),
      cand, q, data_dev)
