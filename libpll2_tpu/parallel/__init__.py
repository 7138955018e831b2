from .sharding import (SITES_AXIS, ShardedRepeatsEngine, clv_sharding,
                       make_mesh, replicated, scaler_sharding,
                       shard_partition, site_vector_sharding)

__all__ = ["SITES_AXIS", "make_mesh", "shard_partition", "clv_sharding",
           "scaler_sharding", "site_vector_sharding", "replicated",
           "ShardedRepeatsEngine"]
