"""Tensor-parallel sharding rules (GSPMD-style, over the ``model`` axis).

The reference has no model parallelism (SURVEY.md §2.6 — DP only via
Accelerate); this module is the TPU-native extension for the scaled configs
(BASELINE config 4: dim 512 / depth 12): Megatron-pattern sharding expressed
purely as parameter `PartitionSpec`s — XLA's SPMD partitioner derives the
activation shardings and inserts the all-reduces:

- attention q/kv projections: column-parallel (heads split over ``model``)
- attention output projection: row-parallel (all-reduce after)
- feed-forward in / out projections: column- / row-parallel
- everything else (norms, convs, embeddings, codec): replicated

The rules key on parameter *path suffixes*, so they apply uniformly to
params, EMA shadows, and Adam mu/nu (which mirror the param tree).
"""

from __future__ import annotations

import re
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from naturalspeech2_tpu.parallel.mesh import MODEL_AXIS

# (path regex, ndim, spec) — first match wins
TP_RULES = [
    # column-parallel: output features sharded
    (re.compile(r"(to_q|to_kv)/kernel$"), 2, P(None, MODEL_AXIS)),
    (re.compile(r"ff_\d+/Dense_0/kernel$"), 2, P(None, MODEL_AXIS)),
    (re.compile(r"ff_\d+/Dense_0/bias$"), 1, P(MODEL_AXIS)),
    # row-parallel: input features sharded, output all-reduced
    (re.compile(r"to_out/kernel$"), 2, P(MODEL_AXIS, None)),
    (re.compile(r"ff_\d+/Dense_1/kernel$"), 2, P(MODEL_AXIS, None)),
]


def _path_str(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "name"):
            parts.append(str(k.name))
        else:
            parts.append(str(k))
    return "/".join(parts)


def spec_for_path(path_str: str, leaf, axis_size: int = 1) -> P:
    """Spec for a parameter path. Dimensions that do not divide by the model
    axis size (e.g. GEGLU's ``int(dim·mult·2/3)`` inner width) fall back to
    replication — correctness first, sharding where the shapes allow."""
    ndim = getattr(leaf, "ndim", 0)
    shape = getattr(leaf, "shape", ())
    for pattern, want_ndim, spec in TP_RULES:
        if pattern.search(path_str) and ndim == want_ndim:
            if axis_size > 1:
                divisible = all(
                    ax is None or shape[i] % axis_size == 0
                    for i, ax in enumerate(spec)
                )
                if not divisible:
                    return P()
            return spec
    return P()


def state_shardings(mesh: Mesh, tree: Any):
    """NamedSharding pytree for any state tree (params / EMA / optimizer
    states included — rules match on trailing param paths)."""
    if MODEL_AXIS not in mesh.axis_names or mesh.shape[MODEL_AXIS] == 1:
        rep = NamedSharding(mesh, P())
        return jax.tree_util.tree_map(lambda _: rep, tree)
    axis_size = mesh.shape[MODEL_AXIS]
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(
            mesh, spec_for_path(_path_str(path), leaf, axis_size)
        ),
        tree,
    )


def shard_state(mesh: Mesh, state):
    """device_put a TrainState (or any pytree) with TP+replication layout."""
    return jax.device_put(state, state_shardings(mesh, state))
