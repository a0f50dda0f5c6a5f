"""Device mesh and sharding helpers.

The reference's entire distribution story is one replica per GPU plus a
thread-safe CPU latent grid (SURVEY §2.4). The TPU-native replacement:

  * ``data`` mesh axis — independent tasks within an alternation round
    (spatial: frames; temporal: target cameras) and training batches
  * ``model`` mesh axis — tensor parallelism over attention heads / FFN
    inner dims via GSPMD param sharding (used by training and available
    for giant inference configs)

Collectives ride ICI automatically via pjit/GSPMD; there is no NCCL/MPI
analog to port.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: int | None = None, model: int = 1, devices=None
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} needs more than {n} devices")
    dev_array = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))


def task_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis task/batch sharding."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params_for_tp(params, mesh: Mesh, min_size: int = 2**16):
    """Tensor-parallel GSPMD layout: shard large kernels' output dim over
    'model'; biases/norms replicated. Returns params placed on the mesh.

    This is intentionally coarse — XLA propagates the rest. With
    model=1 it degenerates to replication."""

    def spec_for(path, x):
        if x.ndim >= 2 and x.size >= min_size:
            # shard the output (last) dimension
            return P(*([None] * (x.ndim - 1) + ["model"]))
        return P()

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    placed = []
    for path, x in flat:
        sh = NamedSharding(mesh, spec_for(path, x))
        placed.append(jax.device_put(x, sh))
    return jax.tree_util.tree_unflatten(treedef, placed)
