"""Pure-functional tensor/mask utilities.

TPU-native re-design of the helper layer of the reference
(`/root/reference/naturalspeech2_pytorch/naturalspeech2_pytorch.py:42-104` and
`/root/reference/naturalspeech2_pytorch/utils/utils.py`). Everything here is
shape-static and jittable: where the reference computed data-dependent output
shapes (e.g. ``generate_mask_from_repeats`` sizing its mask by ``.item()``),
the JAX version takes the output length as a static argument and masks.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp


def exists(x: Any) -> bool:
    return x is not None


def default(val, d):
    if exists(val):
        return val
    return d() if callable(d) else d


def divisible_by(num: int, den: int) -> bool:
    return (num % den) == 0


def identity(t, *args, **kwargs):
    return t


# ---------------------------------------------------------------------------
# masks / lengths
# ---------------------------------------------------------------------------


def create_mask(lengths: jax.Array, max_len: int) -> jax.Array:
    """Boolean key-padding mask ``[b, max_len]``: True where position < length.

    Parity with reference ``utils/utils.py:28-33`` (there built via arange
    expand + comparison); here a single broadcasted comparison.
    """
    seq = jnp.arange(max_len, dtype=lengths.dtype)
    return seq[None, :] < lengths[:, None]


def lengths_from_mask(mask: jax.Array) -> jax.Array:
    return mask.sum(axis=-1)


def pad_or_curtail_to_length(t: jax.Array, length: int, axis: int = 1) -> jax.Array:
    """Pad with zeros or slice ``t`` so that ``t.shape[axis] == length``.

    The reference (`naturalspeech2_pytorch.py:70-77`) operates on the last dim
    of channel-first tensors; our canonical layout is ``[b, n, d]`` so the
    time axis defaults to 1. ``length`` must be static under jit.
    """
    axis = axis % t.ndim
    cur = t.shape[axis]
    if cur == length:
        return t
    if cur > length:
        return jax.lax.slice_in_dim(t, 0, length, axis=axis)
    pad = [(0, 0)] * t.ndim
    pad[axis] = (0, length - cur)
    return jnp.pad(t, pad)


def prob_mask_like(key: jax.Array, shape: Sequence[int], prob: float) -> jax.Array:
    """Bernoulli(prob) boolean mask — classifier-free-guidance dropout.

    Reference `naturalspeech2_pytorch.py:79-85`; randomness is an explicit
    PRNG key here. ``prob`` may be a traced scalar; the 0/1 fast paths of the
    reference are recovered automatically because ``uniform < 0`` is all-False
    and ``uniform < 1`` is all-True (uniform samples in [0, 1)).
    """
    return jax.random.uniform(key, tuple(shape)) < prob


def generate_mask_from_repeats(repeats: jax.Array, max_length: int) -> jax.Array:
    """Expand integer durations to a phoneme→frame alignment mask.

    ``repeats``: ``[b, t_x]`` integer durations. Returns boolean
    ``[b, t_x, max_length]`` where row ``i`` is True on the half-open frame
    interval assigned to phoneme ``i``. The reference
    (`naturalspeech2_pytorch.py:87-104`) sizes the mask dynamically with
    ``lengths.amax().item()``; under jit the frame budget ``max_length`` is
    static and frames beyond the total length stay False.
    """
    repeats = repeats.astype(jnp.int32)
    lengths = repeats.sum(axis=-1)  # [b]
    cumsum = jnp.cumsum(repeats, axis=-1)  # inclusive  [b, t_x]
    cumsum_exclusive = cumsum - repeats
    seq = jnp.arange(max_length, dtype=jnp.int32)  # [n]
    seq = seq[None, None, :]
    mask = (
        (seq < cumsum[..., None])
        & (seq >= cumsum_exclusive[..., None])
        & (seq < lengths[:, None, None])
    )
    return mask


def average_over_durations(values: jax.Array, durs: jax.Array) -> jax.Array:
    """Average frame-level values over per-phoneme duration segments.

    ``values``: ``[b, 1, t_frames]`` (e.g. frame pitch),
    ``durs``: ``[b, t_phonemes]`` integer durations.
    Returns ``[b, 1, t_phonemes]`` segment means (0 where duration == 0).

    Matches reference ``utils/utils.py:4-26`` (cumsum + gather of padded
    cumulative sums / counts); implemented with an exclusive-padded cumsum so
    a segment mean is ``(csum[end] - csum[start]) / (cnt[end] - cnt[start])``.
    """
    durs_cums_ends = jnp.cumsum(durs, axis=1).astype(jnp.int32)  # [b, tp]
    durs_cums_starts = jnp.pad(durs_cums_ends[:, :-1], ((0, 0), (1, 0)))
    t_frames = values.shape[-1]
    values_nonzero = jnp.where(values != 0.0, 1.0, 0.0)
    # exclusive cumsum padded with a leading zero → gather at segment bounds
    values_cums = jnp.pad(jnp.cumsum(values, axis=-1), ((0, 0), (0, 0), (1, 0)))
    cnt_cums = jnp.pad(jnp.cumsum(values_nonzero, axis=-1), ((0, 0), (0, 0), (1, 0)))

    idx_end = jnp.clip(durs_cums_ends, 0, t_frames)  # [b, tp]
    idx_start = jnp.clip(durs_cums_starts, 0, t_frames)

    gather = jax.vmap(lambda c, i: c[:, i])  # over batch: [1, t+1], [tp] -> [1, tp]
    sums = gather(values_cums, idx_end) - gather(values_cums, idx_start)
    cnts = gather(cnt_cums, idx_end) - gather(cnt_cums, idx_start)
    return jnp.where(cnts > 0, sums / jnp.maximum(cnts, 1.0), 0.0)


# ---------------------------------------------------------------------------
# math helpers
# ---------------------------------------------------------------------------


def safe_log(t: jax.Array, eps: float = 1e-20) -> jax.Array:
    """log with clamped argument (reference `naturalspeech2_pytorch.py:1119`)."""
    return jnp.log(jnp.clip(t, min=eps))


def safe_div(numer: jax.Array, denom: jax.Array) -> jax.Array:
    """Division with denominator clamped to 1e-10 (reference :1122)."""
    return numer / jnp.clip(denom, min=1e-10)


def right_pad_dims_to(x: jax.Array, t: jax.Array) -> jax.Array:
    """Append singleton dims to ``t`` until it has ``x.ndim`` dims (ref :1125)."""
    padding_dims = x.ndim - t.ndim
    if padding_dims <= 0:
        return t
    return t.reshape(t.shape + (1,) * padding_dims)
