from .mesh import (data_parallel_shardings, make_mesh, replicate,
                   shard_batch, shard_params_model_axis)

__all__ = ["make_mesh", "shard_batch", "replicate",
           "data_parallel_shardings", "shard_params_model_axis"]
