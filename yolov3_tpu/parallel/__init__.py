"""Multi-chip parallelism: batch-data-parallel sharding over a device mesh."""
from .sharding import (batch_sharding, make_mesh, replicate, shard_params,
                       sharded_pipeline)

__all__ = ["make_mesh", "batch_sharding", "replicate", "shard_params",
           "sharded_pipeline"]
