"""Device mesh + sharding utilities.

TPU-native replacement for the reference's HF-Accelerate DDP layer
(`/root/reference/naturalspeech2_pytorch/naturalspeech2_pytorch.py:1723-1931`,
SURVEY.md §2.6): a `jax.sharding.Mesh` with a ``data`` axis (batch sharded
over ICI; gradient all-reduce is the psum XLA inserts for the sharded jitted
step) and an optional ``model`` axis for tensor parallelism of attention
heads / FFN at the scaled configs. Host-side gating uses
``jax.process_index() == 0`` instead of ``is_main_process``; no explicit
barriers are needed (dispatch order serializes).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a ``(data, model)`` mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model == len(devices), (
        f"{n_data}×{n_model} mesh does not cover {len(devices)} devices"
    )
    dev_array = np.array(devices).reshape(n_data, n_model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim sharded over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch (pytree of arrays) sharded over the data axis."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def is_main_process() -> bool:
    return jax.process_index() == 0
