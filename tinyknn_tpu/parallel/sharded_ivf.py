"""Cluster-sharded IVF over a device mesh.

The reference is strictly single-process (SURVEY.md §2.13); scaling the
corpus beyond one chip's HBM is the TPU build's analogue of model
parallelism. Design (BASELINE config 5):

  * the padded list grids — codes (C, cap, B), ids (C, cap) and raw
    vectors (C, cap, d) for rescore — are sharded over the mesh on the
    cluster axis; PQ codebooks, coarse centers and the query batch are
    replicated (KB-scale);
  * each device runs the same bucketed scan as the single-chip path,
    but only over the probed clusters it owns; probe selection is
    computed redundantly on every device (tiny) so no communication is
    needed until the end;
  * rescore is local too (each device holds its lists' raw vectors), so
    the only collective is an ``all_gather`` of per-device (Q, k)
    results over ICI, followed by a replicated merge —
    k * n_devices * 12 bytes per query on the wire;
  * a second mesh axis can shard the query batch (pure data
    parallelism) — compose by sharding ``q`` on dim 0; the collectives
    ride the cluster axis only.

Also here: ``lloyd_step_dp``, a data-parallel KMeans step (local
accumulation + psum) — the index-build "training step" sharded over the
mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..models.ivf import IVF
from ..ops.topk import dedup_candidates
from .mesh import make_mesh, replicate, shard_on_axis0

CLUSTER_CHUNK = 8


class ShardedIVF(IVF):
    """IVF with its inverted lists sharded over a 1-D device mesh.

    fit/build run like the base class (single host), then ``shard()``
    places the grids over the mesh; ``query`` runs the shard_map step.
    """

    def __init__(self, metric, n_clusters, pq=None, mesh=None, axis="shards",
                 **kw):
        super().__init__(metric, n_clusters, pq, **kw)
        self.mesh = mesh if mesh is not None else make_mesh(axis=axis)
        self.axis = axis
        self.list_vecs = None

    def build(self, X, n_probes=2, verbose=False):
        super().build(X, n_probes, verbose)
        n_dev = self.mesh.devices.size
        C, cap, B = self.list_codes.shape
        # Pad cluster count to a multiple of the mesh size and build the
        # per-list raw-vector grid — all on device (no host readback).
        C_pad = C + (-C) % n_dev
        codes = jnp.pad(self.list_codes, ((0, C_pad - C), (0, 0), (0, 0)))
        ids = jnp.pad(self.list_ids, ((0, C_pad - C), (0, 0)),
                      constant_values=-1)
        vecs = jax.jit(lambda d, i: d[jnp.maximum(i, 0)])(self.data, ids)
        centers = jnp.pad(self.active_centers, ((0, C_pad - C), (0, 0)),
                          # padding centers sit far away: never probed
                          constant_values=1e9)
        self.list_codes, self.list_ids, self.list_vecs = shard_on_axis0(
            self.mesh, codes, ids, vecs, axis=self.axis)
        self.active_centers = replicate(self.mesh, centers)
        self._n_active_real = C
        return self

    def query(self, q, k, n_probes=1, pass_1=None):
        q = np.asarray(q, dtype=np.float32)
        single = q.ndim == 1
        if single:
            q = q[None]
        n_probes = min(n_probes, self._n_active_real)
        k = min(k, int(self.data.shape[0]))
        cap = self.list_codes.shape[1]
        if pass_1 is None:
            pass_1 = (n_probes + 1) * k + 1
        # deep per-pair budget (the per-shard scan splits the cost
        # across devices; see models/ivf.py for the depth rationale)
        r = min(pass_1, cap)
        pass_1 = min(pass_1, n_probes * r)
        n_dev = self.mesh.devices.size
        C_pad = self.list_codes.shape[0]
        qc = self.queries_per_cluster or max(
            8, 8 * ((4 * q.shape[0] * n_probes * n_dev // max(C_pad, 1)) // 8 + 1))

        dtable = self.pq._table(q, signed=True)
        qj = replicate(self.mesh, jnp.asarray(q))
        tables = replicate(self.mesh, dtable.qt.tables)
        out = _sharded_query(
            qj, tables, self.active_centers, self.list_codes,
            self.list_ids, self.list_vecs, mesh=self.mesh, axis=self.axis,
            metric=self.metric, k=k, n_probes=n_probes, pass_1=pass_1,
            r=r, qc=qc)
        return out[0] if single else out


@partial(jax.jit,
         static_argnames=("mesh", "axis", "metric", "k", "n_probes",
                          "pass_1", "r", "qc"))
def _sharded_query(q, tables, centers, list_codes, list_ids, list_vecs,
                   *, mesh, axis, metric, k, n_probes, pass_1, r, qc):
    spec_s = P(axis)
    spec_r = P()

    step = partial(_shard_local_query, axis=axis, metric=metric, k=k,
                   n_probes=n_probes, pass_1=pass_1, r=r, qc=qc)
    # check_vma=False: outputs are replicated by construction (they come
    # out of an all_gather + identical replicated math), which the
    # varying-axes checker cannot infer statically.
    ids, d2 = jax.shard_map(
        step, mesh=mesh,
        in_specs=(spec_r, spec_r, spec_r, spec_s, spec_s, spec_s),
        out_specs=(spec_r, spec_r), check_vma=False,
    )(q, tables, centers, list_codes, list_ids, list_vecs)
    return ids


def _shard_local_query(q, tables, centers, codes_l, ids_l, vecs_l, *,
                       axis, metric, k, n_probes, pass_1, r, qc):
    """Per-shard body: local bucketed scan + local rescore + gather-merge."""
    Q, d = q.shape
    Cl, cap, B = codes_l.shape
    P_ = n_probes
    me = jax.lax.axis_index(axis)
    n_dev = jax.lax.axis_size(axis)

    if metric == "angular":
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=1, keepdims=True), 1e-12)

    # ---- global probe selection (replicated compute, no comm)
    qn = jnp.einsum("qd,qd->q", q, q)
    cn = jnp.einsum("cd,cd->c", centers, centers)
    d2c = qn[:, None] + cn[None, :] - 2.0 * jax.lax.dot_general(
        q, centers, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    _, probe_sel = jax.lax.top_k(-d2c, P_)           # (Q, P) global ids

    # ---- map to local cluster index; non-local pairs -> sentinel Cl
    local_c = probe_sel - me * Cl
    is_local = (local_c >= 0) & (local_c < Cl)
    pairs = jnp.where(is_local, local_c, Cl).reshape(-1)
    q_of_pair = jnp.arange(Q * P_, dtype=jnp.int32) // P_
    order = jnp.argsort(pairs, stable=True)
    sorted_c = pairs[order]
    sorted_q = q_of_pair[order]
    pos = jnp.arange(Q * P_, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_c[1:] != sorted_c[:-1]])
    run_start = jax.lax.cummax(jnp.where(is_start, pos, 0), axis=0)
    slot = pos - run_start
    in_cap = (slot < qc) & (sorted_c < Cl)
    qgrid = jnp.full((Cl, qc), -1, jnp.int32)
    qgrid = qgrid.at[jnp.where(in_cap, sorted_c, Cl),
                     jnp.minimum(slot, qc - 1)].set(sorted_q, mode="drop")
    slot_orig = jnp.zeros((Q * P_,), jnp.int32).at[order].set(slot)
    slot_orig = slot_orig.reshape(Q, P_)

    # ---- local bucketed scan, collecting (val, global id, flat position)
    M = B * 16
    tables_flat = tables.reshape(Q, M)
    n_chunks = -(-Cl // CLUSTER_CHUNK)
    Cl_pad = n_chunks * CLUSTER_CHUNK
    codes_g = jnp.pad(codes_l, ((0, Cl_pad - Cl), (0, 0), (0, 0)))
    ids_g = jnp.pad(ids_l, ((0, Cl_pad - Cl), (0, 0)), constant_values=-1)
    qgrid_g = jnp.pad(qgrid, ((0, Cl_pad - Cl), (0, 0)), constant_values=-1)

    def scan_chunk(i, carry):
        vals_acc, ids_acc, pos_acc = carry
        codes_k = jax.lax.dynamic_slice_in_dim(codes_g, i * CLUSTER_CHUNK,
                                               CLUSTER_CHUNK, 0)
        ids_k = jax.lax.dynamic_slice_in_dim(ids_g, i * CLUSTER_CHUNK,
                                             CLUSTER_CHUNK, 0)
        qgrid_k = jax.lax.dynamic_slice_in_dim(qgrid_g, i * CLUSTER_CHUNK,
                                               CLUSTER_CHUNK, 0)
        onehot = jax.nn.one_hot(codes_k, 16, dtype=jnp.int8)
        onehot = onehot.reshape(CLUSTER_CHUNK, cap, M)
        t_sel = tables_flat[jnp.maximum(qgrid_k, 0)]
        est = jax.lax.dot_general(
            t_sel, onehot, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32).astype(jnp.float32)
        est = jnp.where(ids_k[:, None, :] >= 0, est, jnp.inf)
        vals, idx = jax.lax.top_k(-est, r)            # (CH, qc, r)
        cand_ids = jnp.take_along_axis(
            jnp.broadcast_to(ids_k[:, None, :], est.shape), idx, axis=2)
        # flat position into the local (Cl_pad * cap) vector grid
        crange = (i * CLUSTER_CHUNK
                  + jax.lax.broadcasted_iota(jnp.int32,
                                             (CLUSTER_CHUNK, qc, r), 0))
        flat_pos = crange * cap + idx
        vals_acc = jax.lax.dynamic_update_slice_in_dim(
            vals_acc, -vals, i * CLUSTER_CHUNK, 0)
        ids_acc = jax.lax.dynamic_update_slice_in_dim(
            ids_acc, cand_ids, i * CLUSTER_CHUNK, 0)
        pos_acc = jax.lax.dynamic_update_slice_in_dim(
            pos_acc, flat_pos, i * CLUSTER_CHUNK, 0)
        return vals_acc, ids_acc, pos_acc

    init = jax.lax.pcast(
        (jnp.zeros((Cl_pad, qc, r), jnp.float32),
         jnp.zeros((Cl_pad, qc, r), jnp.int32),
         jnp.zeros((Cl_pad, qc, r), jnp.int32)),
        (axis,), to="varying")
    cand_vals, cand_ids, cand_pos = jax.lax.fori_loop(
        0, n_chunks, scan_chunk, init)

    # ---- gather-back per query (flattened single-index gather; the
    # two-index form faults the TPU runtime at large shapes)
    lc = jnp.clip(local_c, 0, Cl_pad - 1)
    sl = jnp.minimum(slot_orig, qc - 1)
    ok = is_local & (slot_orig < qc)
    pair_idx = lc * qc + sl
    my_vals = jnp.where(ok[:, :, None],
                        cand_vals.reshape(Cl_pad * qc, r)[pair_idx], jnp.inf)
    my_ids = jnp.where(ok[:, :, None],
                       cand_ids.reshape(Cl_pad * qc, r)[pair_idx], -1)
    my_pos = jnp.where(ok[:, :, None],
                       cand_pos.reshape(Cl_pad * qc, r)[pair_idx], 0)
    flat_vals = my_vals.reshape(Q, P_ * r)
    flat_ids = my_ids.reshape(Q, P_ * r)
    flat_pos = my_pos.reshape(Q, P_ * r)
    flat_vals = jnp.where(flat_ids >= 0, flat_vals, jnp.inf)
    # local dedup of build-spill duplicates
    dd_ids, dd_vals = dedup_candidates(flat_ids, flat_vals)
    _, top_pos = jax.lax.top_k(-dd_vals, pass_1)
    cand = jnp.take_along_axis(dd_ids, top_pos, axis=1)
    cand_p = jnp.take_along_axis(flat_pos, top_pos, axis=1)

    # ---- local exact rescore from the sharded vector grid
    vflat = vecs_l.reshape(Cl * cap, -1)
    gathered = vflat[jnp.clip(cand_p, 0, Cl * cap - 1)]
    diff = gathered - q[:, None, :]
    d2 = jnp.einsum("qrd,qrd->qr", diff, diff)
    d2 = jnp.where(cand >= 0, d2, jnp.inf)
    _, best = jax.lax.top_k(-d2, k)
    loc_ids = jnp.take_along_axis(cand, best, axis=1)   # (Q, k)
    loc_d2 = jnp.take_along_axis(d2, best, axis=1)

    # ---- merge across shards: the only collective
    all_ids = jax.lax.all_gather(loc_ids, axis)         # (S, Q, k)
    all_d2 = jax.lax.all_gather(loc_d2, axis)
    all_ids = jnp.moveaxis(all_ids, 0, 1).reshape(Q, -1)
    all_d2 = jnp.moveaxis(all_d2, 0, 1).reshape(Q, -1)
    # cross-shard dedup (a spilled point can surface on two shards)
    all_ids, all_d2 = dedup_candidates(all_ids, all_d2)
    _, best = jax.lax.top_k(-all_d2, k)
    out_ids = jnp.take_along_axis(all_ids, best, axis=1)
    out_d2 = jnp.take_along_axis(all_d2, best, axis=1)
    out_ids = jnp.where(jnp.isfinite(out_d2), out_ids, -1)
    return out_ids, out_d2


def lloyd_step_dp(X, centers, mesh, axis: str = "shards"):
    """One data-parallel Lloyd iteration over the mesh.

    ``X`` sharded on dim 0, ``centers`` replicated; local partial
    sums/counts are combined with psum — the canonical TPU training-step
    shape (local compute + ICI collective).
    """
    def step(Xl, C):
        d2 = (jnp.einsum("nd,nd->n", Xl, Xl)[:, None]
              + jnp.einsum("kd,kd->k", C, C)[None, :]
              - 2.0 * jax.lax.dot_general(
                  Xl, C, (((1,), (1,)), ((), ())),
                  preferred_element_type=jnp.float32))
        assign = jnp.argmin(d2, axis=1)
        onehot = jax.nn.one_hot(assign, C.shape[0], dtype=jnp.float32)
        sums = jax.lax.dot_general(
            onehot, Xl, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        counts = jnp.sum(onehot, axis=0)
        inertia = jnp.sum(jnp.min(d2, axis=1))
        sums = jax.lax.psum(sums, axis)
        counts = jax.lax.psum(counts, axis)
        inertia = jax.lax.psum(inertia, axis)
        newC = jnp.where(counts[:, None] > 0,
                         sums / jnp.maximum(counts[:, None], 1.0), C)
        return newC, inertia

    return jax.jit(jax.shard_map(
        step, mesh=mesh, in_specs=(P(axis), P()), out_specs=(P(), P())))(
            X, centers)
