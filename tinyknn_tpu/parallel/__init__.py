"""Multi-chip sharding: mesh helpers and the sharded IVF index."""
