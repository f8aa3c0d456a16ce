"""Monotonic alignment search (MAS) as jittable lax.scans.

TPU-native counterpart of the reference's pure-Python dynamic program
(`/root/reference/naturalspeech2_pytorch/aligner.py:88-122`) — the hot
sequential loop of training-side alignment. Forward pass: a `lax.scan` over
mel frames carrying the per-phoneme best cumulative score; backtrack: a
reverse `lax.scan` carrying the current phoneme index and emitting one-hot
path rows. Semantics match the reference DP exactly (stay-vs-advance with
``v1 >= v0`` tie-breaking toward "stay", unmasked direction = stay, path
zeroed outside the joint mask).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG = -1e9


def maximum_path(
    value: jax.Array, mask: jax.Array, *, unroll: int = 4
) -> jax.Array:
    """Best monotonic phoneme→frame path.

    value: ``[b, t_x, t_y]`` alignment scores (phoneme i at frame j),
    mask: same shape, 1 inside (text_len × mel_len). Returns a 0/1 path of
    the same shape where each valid frame is assigned exactly one phoneme.

    ``unroll`` fuses that many frames per `lax.scan` iteration, amortizing
    the fixed while-loop overhead over the tiny [b, t_x] VPU work of one DP
    step. Measured on-device at the conditional-train shape (b16, 100x300,
    `examples/probe_cond_train.py` chained timing): 0.98 ms at unroll=1 ->
    0.88 ms at unroll=4 (1.11x), flat again at 8. The same probe shows MAS
    is ~0.3% of the 294 ms conditional train step - the reference's
    "hot sequential loop" (aligner.py:88-122) is a non-issue once it is a
    scan. The math is iteration-order-identical for any unroll.
    """
    value = value * mask
    b, t_x, t_y = value.shape
    x_range = jnp.arange(t_x, dtype=jnp.float32)[None, :]  # [1, t_x]

    def forward(v, inputs):
        value_j, j = inputs  # [b, t_x], scalar
        v0 = jnp.pad(v, ((0, 0), (1, 0)), constant_values=NEG)[:, :-1]  # from i-1
        v1 = v  # stay at i
        stay = v1 >= v0
        v_max = jnp.where(stay, v1, v0)
        v_new = jnp.where(x_range <= j, v_max + value_j, NEG)
        return v_new, stay

    _, direction = jax.lax.scan(
        forward,
        jnp.zeros((b, t_x), jnp.float32),
        (value.transpose(2, 0, 1), jnp.arange(t_y, dtype=jnp.float32)),
        unroll=unroll,
    )  # direction: [t_y, b, t_x] bool (True = stay)

    direction = jnp.where(
        mask.transpose(2, 0, 1) > 0, direction, True
    ).astype(jnp.int32)

    # backtrack from the last phoneme (text_len − 1) over frames t_y−1 … 0.
    # The scan only carries/emits the [b] phoneme index; the one-hot path
    # tensor is built vectorized afterwards (cheaper per sequential step
    # than emitting [b, t_x] one-hot rows from inside the loop).
    index0 = mask[:, :, 0].sum(axis=1).astype(jnp.int32) - 1  # [b]
    batch_range = jnp.arange(b)

    def backward(index, direction_j):
        step = direction_j[batch_range, index]  # 1 = stay, 0 = advance
        return index + step - 1, index

    _, idx = jax.lax.scan(
        backward, index0, direction, reverse=True, unroll=unroll
    )  # idx: [t_y, b]
    path = (
        idx.T[:, None, :] == jnp.arange(t_x, dtype=jnp.int32)[None, :, None]
    ).astype(value.dtype)  # [b, t_x, t_y]
    return path * mask.astype(path.dtype)


def maximum_path_numpy(value, mask):
    """Slow numpy DP with the exact semantics of the reference Python loops
    (aligner.py:88-122), used as the test oracle."""
    import numpy as np

    value = np.asarray(value, dtype=np.float64) * np.asarray(mask)
    mask = np.asarray(mask)
    b, t_x, t_y = value.shape
    direction = np.zeros((b, t_x, t_y), dtype=np.int64)
    v = np.zeros((b, t_x))
    x_range = np.arange(t_x)[None, :]
    for j in range(t_y):
        v0 = np.concatenate([np.full((b, 1), NEG), v[:, :-1]], axis=1)
        stay = v >= v0
        v_max = np.where(stay, v, v0)
        direction[:, :, j] = stay
        v = np.where(x_range <= j, v_max + value[:, :, j], NEG)
    direction = np.where(mask > 0, direction, 1)
    path = np.zeros((b, t_x, t_y), dtype=np.float32)
    index = mask[:, :, 0].sum(axis=1).astype(np.int64) - 1
    batch_range = np.arange(b)
    for j in range(t_y - 1, -1, -1):
        path[batch_range, index, j] = 1
        index = index + direction[batch_range, index, j] - 1
    return path * mask
