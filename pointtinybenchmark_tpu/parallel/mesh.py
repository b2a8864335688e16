"""Device mesh + sharding helpers — the TPU-native replacement for the
reference's DDP/NCCL substrate (SURVEY.md §2.10/§5.8).

The reference's only parallelism is data parallelism (torch.distributed
launch + MMDistributedDataParallel, apis/train.py:79-83). Here a single
controller owns a `jax.sharding.Mesh`; batches are sharded over the `data`
axis, parameters are replicated, and XLA inserts the gradient psum over ICI
during jit compilation — no explicit allreduce code.

A `model` axis is provisioned for intra-layer sharding of wide heads on
larger meshes (unused at mesh shape (N, 1), which matches the reference's
capability envelope).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_batch", "replicate", "data_parallel_shardings"]


def make_mesh(num_data: Optional[int] = None, num_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if num_data is None:
        num_data = n // num_model
    assert num_data * num_model == n, \
        f"mesh {num_data}x{num_model} != {n} devices"
    dev_array = np.asarray(devices).reshape(num_data, num_model)
    return Mesh(dev_array, axis_names=("data", "model"))


def data_parallel_shardings(mesh: Mesh) -> Tuple[NamedSharding, NamedSharding]:
    """(batch_sharding, replicated_sharding)."""
    return (NamedSharding(mesh, P("data")), NamedSharding(mesh, P()))


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Put every array leaf onto the mesh sharded along its leading (batch)
    axis; non-array entries (img_metas) pass through on host."""
    bs = NamedSharding(mesh, P("data"))
    out = {}
    for k, v in batch.items():
        if hasattr(v, "shape") and getattr(v, "ndim", 0) >= 1:
            out[k] = jax.device_put(v, bs)
        else:
            out[k] = v
    return out


def replicate(tree, mesh: Mesh):
    rs = NamedSharding(mesh, P())
    return jax.device_put(tree, rs)


def shard_params_model_axis(params, mesh: Mesh,
                            match: str = "bbox_head") -> Any:
    """Tensor-parallel placement: shard the output-channel axis of large
    kernels under `match` over the `model` mesh axis; everything else
    replicated. XLA inserts the activation all-gathers — the sharding
    annotation is the whole "implementation" (scaling-book recipe).

    The reference has no TP (SURVEY §2.10); this extends the capability
    envelope for wide heads on larger meshes.
    """
    tp = mesh.devices.shape[1]
    rs = NamedSharding(mesh, P())

    def place(path, x):
        keys = "/".join(getattr(p, "key", str(p)) for p in path)
        if (match in keys and getattr(x, "ndim", 0) >= 2
                and x.shape[-1] % tp == 0 and x.shape[-1] >= 2 * tp):
            spec = [None] * (x.ndim - 1) + ["model"]
            return jax.device_put(x, NamedSharding(mesh, P(*spec)))
        return jax.device_put(x, rs)

    return jax.tree_util.tree_map_with_path(place, params)
