#!/usr/bin/env python3
"""Cumulative prefix timing of the real IVF query pipeline.

stage_ablation.py times each stage in ISOLATION (own fori_loop); the
isolated sum (213 ms at P=10/Q=10k) under-counts the end-to-end
marginal (302 ms) because costs appear only in composition (fusion,
layout assignment, rematerialization). This times PREFIXES of the
actual pipeline — front / +scan0 / +scan1 / +select / +rescore — so
consecutive deltas are the in-situ stage costs and the last prefix IS
the end-to-end number.

``--scan-impl exact`` times the exact engine's pipeline instead
(augmented bf16 queries replace PQ tables; codes arg = csr_vecs;
tail-scan prefix skipped at P=1), attributing the gap between the
stage-isolated sum (~14 ms at P=1, examples/r5_exact_stage.py) and
the ~30 ms end-to-end marginal.

Usage: python examples/prefix_probe.py [--probes 10] [--rescore-rows]
       [--scan-impl exact]
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
from tinyknn_tpu.ops.topk import dedup_candidates  # noqa: E402

parser = argparse.ArgumentParser()
parser.add_argument("--probes", type=int, default=10)
parser.add_argument("--mult", type=float, default=4.0)
parser.add_argument("--k", type=int, default=10)
parser.add_argument("--iters", type=int, nargs=2, default=[2, 8])
parser.add_argument("--rescore-rows", action="store_true")
parser.add_argument("--scan-impl", default="fused",
                    choices=["fused", "exact"])
parser.add_argument("--pass-1", type=int, default=None)
parser.add_argument("--index", default="ivf_clustered-1183514-100_"
                    "angular_num_clusters=1087_dims_per_block=2_"
                    "build_probes=1.npz")
args = parser.parse_args()

utils.enable_compilation_cache()
print("loading index...", flush=True)
ivf = load_ivf(args.index)
ivf.set_scan_impl(args.scan_impl)
if args.rescore_rows:
    ivf.set_rescore_rows(True)

size, dim, nq = 1183514, 100, 10000
_, queries = utils.make_clustered(size, dim, nq)

k = args.k
P = args.probes
exact = args.scan_impl == "exact"
if args.pass_1 is not None:
    pass_1 = args.pass_1
elif exact:
    pass_1 = None            # engine default sliver (4kP)
else:
    pass_1 = int(args.mult * ((P + 1) * k + 1))
k, P, pass_1, r, r_tail, qc, qc0 = ivfmod._query_params(
    ivf, nq, k, P, pass_1)
fold_mult = getattr(ivf, "fold_mult", ivfmod.FOLD_MULT)
print(f"P={P} pass_1={pass_1} r={r} r_tail={r_tail} qc={qc} qc0={qc0} "
      f"rescore_rows={ivf.csr_raw is not None}", flush=True)

cb, Rm, dpb = ivf.pq.center_blocks, ivf.pq.R, ivf.pq.dims_per_block
B = cb.shape[0]
cap = ivf.max_tiles * LANE_TILE
col_bits = 16 if exact else max(1, (cap - 1).bit_length())
f = min(getattr(ivf, "build_probes", 1) or 1, P)
N1, N2 = args.iters


def pipeline_prefix(stop):
    """The real pipeline, truncated after `stop` stages."""
    def run(acc, q, data, csr_raw, codes, ids, toff, counts, *smap):
        q = q + acc.astype(jnp.float32) * 1e-9
        q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
        if exact:
            tables_flat = ivfmod._augment_queries(q)
            hi = jax.lax.Precision.HIGHEST
            qn = jnp.einsum("qd,qd->q", q, q, precision=hi)
            cn = jnp.einsum("cd,cd->c", ivf.active_centers,
                            ivf.active_centers, precision=hi)
            d2c = (qn[:, None] + cn[None, :]
                   - 2.0 * jax.lax.dot_general(
                       q, ivf.active_centers, (((1,), (1,)), ((), ())),
                       preferred_element_type=jnp.float32,
                       precision=hi))
        else:
            tables = _build_tables(q, cb, Rm, dpb, True,
                                   ivf.pq.table_dtype).tables
            tables_flat = permute_tables_csr(
                tables.reshape(nq, B * 16), B)
            qn = jnp.einsum("qd,qd->q", q, q)
            cn = jnp.einsum("cd,cd->c", ivf.active_centers,
                            ivf.active_centers)
            d2c = (qn[:, None] + cn[None, :]
                   - 2.0 * q @ ivf.active_centers.T)
        _, probe_sel = jax.lax.top_k(-d2c, P)
        if stop == 1:
            return jnp.sum(probe_sel) + jnp.sum(
                tables_flat.astype(jnp.float32)).astype(jnp.int32)
        v0, rows0, drop0 = ivfmod._bucket_scan_round(
            probe_sel[:, :1], tables_flat, codes, ids, toff, counts,
            smap, qc=qc0, r=r, method="approx",
            scan_impl=args.scan_impl,
            max_tiles=ivf.max_tiles, fold_mult=fold_mult)
        if stop == 2:
            return (jax.lax.reduce(v0, jnp.int32(0), jax.lax.min,
                                   (0, 1, 2)) + jnp.sum(rows0) + drop0)
        if P > 1:
            v1, rows1, drop1 = ivfmod._bucket_scan_round(
                probe_sel[:, 1:], tables_flat, codes, ids, toff,
                counts, smap, qc=qc, r=r_tail, method="approx",
                scan_impl=args.scan_impl,
                max_tiles=ivf.max_tiles, fold_mult=fold_mult)
            if stop == 3:
                return (jax.lax.reduce(v0, jnp.int32(0), jax.lax.min,
                                       (0, 1, 2))
                        + jax.lax.reduce(v1, jnp.int32(0), jax.lax.min,
                                         (0, 1, 2))
                        + jnp.sum(rows0) + jnp.sum(rows1))
            pools = [v0, v1]
            bases = [rows0, rows1]
        else:
            pools = [v0]
            bases = [rows0]
        width = sum(p.shape[1] * p.shape[2] for p in pools)
        p1 = min(f * pass_1, width)
        cand, rows_sel, enc_sel = ivfmod._select_pool_enc(
            pools, bases, p1, "approx", col_bits, ids,
            decode_ids=csr_raw is None)
        if stop == 4:
            s = jnp.sum(rows_sel) + jnp.sum(enc_sel)
            return s + (jnp.sum(cand) if cand is not None else 0)
        if csr_raw is not None:
            valid = enc_sel < jnp.int32(ivfmod.ENC_INVALID)
            g = csr_raw[rows_sel]
            diff = g - q[:, None, :]
            d2 = jnp.einsum("qrd,qrd->qr", diff, diff,
                            precision=jax.lax.Precision.HIGHEST)
            d2 = jnp.where(valid, d2, jnp.inf)
            _, best = jax.lax.top_k(-d2, k)
            rows_b = jnp.take_along_axis(rows_sel, best, axis=1)
            out_d2 = jnp.take_along_axis(d2, best, axis=1)
            out = jnp.where(jnp.isfinite(out_d2), ids[rows_b], -1)
        else:
            g = data[jnp.maximum(cand, 0)]
            diff = g - q[:, None, :]
            d2 = jnp.einsum("qrd,qrd->qr", diff, diff,
                            precision=jax.lax.Precision.HIGHEST)
            d2 = jnp.where(cand >= 0, d2, jnp.inf)
            _, best = jax.lax.top_k(-d2, k)
            out = jnp.take_along_axis(cand, best, axis=1)
            out_d2 = jnp.take_along_axis(d2, best, axis=1)
            out = jnp.where(jnp.isfinite(out_d2), out, -1)
        return jnp.sum(out)
    return run


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
    print(f"{name:<36} {ms:8.2f} ms", flush=True)
    return ms


q_dev = jnp.asarray(queries)
csr_raw = ivf.csr_raw if ivf.csr_raw is not None else jnp.zeros(
    (1, dim), jnp.float32)
use_raw = ivf.csr_raw is not None
codes_arg = ivf.csr_vecs if exact else ivf.csr_codes
stages = [(1, "front (tables+probe)"), (2, "+ round-0 scan")]
if P > 1:
    stages.append((3, "+ tail scan"))
stages += [(4, "+ select"), (5, "+ rescore (full)")]
prev = 0.0
for stop, name in stages:
    def fn(acc, *a, _stop=stop):
        return pipeline_prefix(_stop)(
            acc, a[0], a[1], a[2] if use_raw else None, *a[3:])
    ms = timed(name, fn, q_dev, ivf.data, csr_raw, codes_arg,
               ivf.csr_ids, ivf.tile_offsets, ivf.list_counts,
               *ivf.scan_map)
    print(f"{'':>36}   delta {ms - prev:8.2f} ms", flush=True)
    prev = ms
