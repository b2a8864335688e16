from .mesh import (data_parallel_shardings, make_mesh, replicate, shard_batch)

__all__ = ["make_mesh", "shard_batch", "replicate",
           "data_parallel_shardings"]
