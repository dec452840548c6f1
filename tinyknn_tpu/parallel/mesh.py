"""Device-mesh helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, axis: str = "shards") -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        assert n_devices <= len(devs), (
            f"need {n_devices} devices, have {len(devs)}")
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def make_mesh_2d(shape, axis_names=("queries", "shards")) -> Mesh:
    """2-D mesh: axis 0 shards the query batch (pure data parallelism),
    axis 1 shards the inverted lists (the index's model parallelism).
    Collectives ride axis 1 only; axis 0 needs no communication."""
    n = shape[0] * shape[1]
    devs = jax.devices()
    assert n <= len(devs), f"need {n} devices, have {len(devs)}"
    return Mesh(np.array(devs[:n]).reshape(shape), tuple(axis_names))


def shard_on_axis0(mesh: Mesh, *arrays, axis: str = "shards"):
    """Place arrays with dim-0 sharded over the mesh axis."""
    out = []
    for a in arrays:
        spec = P(axis, *([None] * (a.ndim - 1)))
        out.append(jax.device_put(a, NamedSharding(mesh, spec)))
    return out if len(out) > 1 else out[0]


def replicate(mesh: Mesh, *arrays):
    """Fully replicate arrays over the mesh."""
    out = [jax.device_put(a, NamedSharding(mesh, P())) for a in arrays]
    return out if len(out) > 1 else out[0]
