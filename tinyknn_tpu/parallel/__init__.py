"""Multi-chip sharding: mesh helpers and the sharded IVF index."""

from .mesh import make_mesh, make_mesh_2d, replicate, shard_on_axis0
from .sharded_ivf import ShardedIVF, lloyd_step_dp
from .sharded_pq import ShardedFastPQ

__all__ = ["make_mesh", "make_mesh_2d", "replicate", "shard_on_axis0",
           "ShardedIVF", "ShardedFastPQ", "lloyd_step_dp"]
