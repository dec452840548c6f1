"""Index persistence: save/load FastPQ and IVF as npz archives.

The reference's only persistence is an ad-hoc pickle in its benchmark
script (reference: examples/bench.py:88-103). Here it is a first-class
API: after padding, a whole index is a handful of dense arrays, so a
single compressed npz (portable, mmap-able, no code execution on load)
is the right format.
"""

from __future__ import annotations

import json

import jax.numpy as jnp
import numpy as np

from .models.fast_pq import FastPQ
from .models.ivf import IVF

# v2: list_codes stored nibble-packed (uint8, two 4-bit codes/byte);
# v1 archives (one code per byte) are packed on load.
_FORMAT_VERSION = 2


def _pq_state(pq: FastPQ) -> dict:
    state = {
        "pq_center_blocks": np.asarray(pq.center_blocks),
        "pq_meta": np.frombuffer(json.dumps({
            "dims_per_block": pq.dims_per_block,
            "use_kmeans": pq.use_kmeans,
            "rotate_dim": pq.rotate_dim,
            "seed": pq.seed,
            "backend": pq.backend,
            "kmeans_iters": pq.kmeans_iters,
            "kmeans_n_init": pq.kmeans_n_init,
            "table_dtype": pq.table_dtype,
        }).encode(), dtype=np.uint8),
    }
    if pq.R is not None:
        state["pq_R"] = np.asarray(pq.R)
    return state


def _pq_restore(data) -> FastPQ:
    meta = json.loads(bytes(data["pq_meta"]).decode())
    pq = FastPQ(dims_per_block=meta["dims_per_block"],
                use_kmeans=meta["use_kmeans"],
                rotate_dim=meta["rotate_dim"], seed=meta["seed"],
                backend=meta["backend"],
                kmeans_iters=meta.get("kmeans_iters", 25),
                kmeans_n_init=meta.get("kmeans_n_init", 2),
                table_dtype=meta.get("table_dtype", "int8"))
    cb = jnp.asarray(data["pq_center_blocks"])
    pq.center_blocks = cb
    B, _, dpb = cb.shape
    pq.centers = jnp.asarray(
        np.asarray(cb).transpose(1, 0, 2).reshape(16, B * dpb))
    pq.sqrt_n_blocks = float(np.sqrt(B))
    if "pq_R" in data:
        pq.R = jnp.asarray(data["pq_R"])
    return pq


def save_pq(path, pq: FastPQ):
    assert pq.centers is not None, "save_pq: PQ not fitted"
    np.savez_compressed(path, format=np.int32(_FORMAT_VERSION),
                        kind=np.frombuffer(b"fastpq", np.uint8),
                        **_pq_state(pq))


def load_pq(path) -> FastPQ:
    with np.load(path) as data:
        return _pq_restore(data)


def save_ivf(path, ivf: IVF):
    """Persist a built IVF (or ShardedIVF: the mesh-padded grids are
    stripped to their true cluster count, so the archive is
    mesh-shape-independent and can be re-sharded on load)."""
    assert ivf.list_codes is not None, "save_ivf: index not built"
    n_real = getattr(ivf, "_n_active_real", None)
    if n_real is not None:  # sharded: strip mesh padding, drop the
        import copy         # derivable raw-vector grid
        ivf = copy.copy(ivf)
        ivf.list_codes = np.asarray(ivf.list_codes)[:n_real]
        ivf.list_ids = np.asarray(ivf.list_ids)[:n_real]
        ivf.list_counts = np.asarray(ivf.list_counts)[:n_real]
        ivf.active_centers = np.asarray(ivf.active_centers)[:n_real]
    state = _pq_state(ivf.pq)
    np.savez_compressed(
        path, format=np.int32(_FORMAT_VERSION),
        kind=np.frombuffer(b"ivf", np.uint8),
        ivf_meta=np.frombuffer(json.dumps({
            "metric": ivf.metric,
            "n_clusters": ivf.n_clusters,
            "seed": ivf.seed,
            "kmeans_iters": ivf.kmeans_iters,
            "queries_per_cluster": ivf.queries_per_cluster,
            "pass1_method": ivf.pass1_method,
            "scan_impl": ivf.scan_impl,
        }).encode(), dtype=np.uint8),
        all_centers=np.asarray(ivf.all_centers),
        active_centers=np.asarray(ivf.active_centers),
        list_codes=np.asarray(ivf.list_codes),
        list_ids=np.asarray(ivf.list_ids),
        list_counts=np.asarray(ivf.list_counts),
        data=np.asarray(ivf.data),
        **state)


def load_ivf(path) -> IVF:
    with np.load(path) as data:
        meta = json.loads(bytes(data["ivf_meta"]).decode())
        pq = _pq_restore(data)
        ivf = IVF.__new__(IVF)
        ivf.metric = meta["metric"]
        ivf.n_clusters = meta["n_clusters"]
        ivf.seed = meta["seed"]
        ivf.kmeans_iters = meta.get("kmeans_iters", 30)
        ivf.queries_per_cluster = meta.get("queries_per_cluster")
        ivf.pass1_method = meta.get("pass1_method", "auto")
        ivf.scan_impl = meta.get("scan_impl", "auto")
        ivf.pq = pq
        ivf.all_centers = np.asarray(data["all_centers"])
        ivf.active_centers = jnp.asarray(data["active_centers"])
        codes = jnp.asarray(data["list_codes"])
        if int(data["format"]) < 2:  # v1: unpacked, one code per byte
            from .ops.packing import pack_codes
            codes = pack_codes(codes)
        ivf.list_codes = codes
        ivf.list_ids = jnp.asarray(data["list_ids"])
        if "list_counts" in data:
            ivf.list_counts = jnp.asarray(data["list_counts"])
        else:  # older archives: recover from the id grid
            ivf.list_counts = jnp.sum(ivf.list_ids >= 0, axis=1,
                                      dtype=jnp.int32)
        ivf.data = jnp.asarray(data["data"])
        return ivf


def load_sharded_ivf(path, mesh=None, axis="shards", query_axis=None,
                     **kw):
    """Load an IVF archive (sharded or single-device) as a ShardedIVF
    placed over ``mesh`` — the mesh shape need not match the one the
    index was saved from (grids are stored unpadded)."""
    from .parallel.sharded_ivf import ShardedIVF

    base = load_ivf(path)
    sivf = ShardedIVF.__new__(ShardedIVF)
    sivf.__dict__.update(base.__dict__)
    from .parallel.mesh import make_mesh
    sivf.mesh = mesh if mesh is not None else make_mesh(axis=axis)
    sivf.axis = axis
    sivf.query_axis = query_axis
    sivf.list_vecs = None
    sivf._place(base.list_codes, base.list_ids, base.list_counts,
                jnp.asarray(base.active_centers))
    return sivf
