"""Multi-chip parallelism: batch-DP (throughput) + spatial TP (latency)."""
from .sharding import (batch_sharding, make_mesh, replicate, shard_params,
                       sharded_pipeline)
from .spatial import (make_spatial_mesh, plan_spatial, spatial_pipeline,
                      SpatialPlan)

__all__ = ["make_mesh", "batch_sharding", "replicate", "shard_params",
           "sharded_pipeline", "make_spatial_mesh", "plan_spatial",
           "spatial_pipeline", "SpatialPlan"]
