"""Multi-chip sharding: mesh helpers and the sharded IVF index."""

from .mesh import make_mesh, replicate, shard_on_axis0
from .sharded_ivf import ShardedIVF, lloyd_step_dp

__all__ = ["make_mesh", "replicate", "shard_on_axis0", "ShardedIVF",
           "lloyd_step_dp"]
