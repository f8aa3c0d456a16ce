"""Attention backend — TPU-native counterpart of the reference's `Attend`
(`/root/reference/naturalspeech2_pytorch/attend.py:35-155`).

Two paths with identical semantics:

- ``xla``: plain dot-product attention; XLA fuses the softmax chain and maps
  the two matmuls onto the MXU. O(n²) memory but fine at the reference's
  sequence lengths; used as the numerical reference for the Pallas kernel.
- ``flash``: blockwise online-softmax Pallas kernel
  (`naturalspeech2_tpu.ops.flash_attention`) — O(n) memory, VMEM-resident
  tiles; the equivalent of the reference's
  ``F.scaled_dot_product_attention`` flash path (attend.py:102-108).

Masking follows the reference contract: ``mask`` is a boolean key-padding
mask ``[b, kv_len]`` (True = attend); ``causal`` adds the upper-triangular
mask. Dropout on attention probabilities runs inside whichever backend is
active — in-kernel counter-based threefry on the flash path (the
reference's flash path likewise delegates dropout to the fused SDPA
kernel, attend.py:102-108).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def attend_xla(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    mask: Optional[jax.Array] = None,
    causal: bool = False,
    scale: Optional[float] = None,
    dropout: float = 0.0,
    dropout_key: Optional[jax.Array] = None,
) -> jax.Array:
    """Dot-product attention. q,k,v: ``[b, h, n, d]`` (k/v may be ``[b, n, d]``
    for single-head kv, broadcast over heads like attend.py:83-87)."""
    if k.ndim == 3:
        k = k[:, None]
    if v.ndim == 3:
        v = v[:, None]
    if scale is None:
        scale = q.shape[-1] ** -0.5

    # logits in f32 regardless of input dtype (MXU accumulates f32)
    sim = jnp.einsum(
        "bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32
    ) * scale

    if mask is not None:
        sim = jnp.where(mask[:, None, None, :], sim, NEG_INF)

    if causal:
        i, j = sim.shape[-2], sim.shape[-1]
        causal_mask = jnp.tril(jnp.ones((i, j), dtype=bool), j - i)
        sim = jnp.where(causal_mask, sim, NEG_INF)

    attn = jax.nn.softmax(sim, axis=-1)

    if dropout > 0.0 and dropout_key is not None:
        keep = jax.random.bernoulli(dropout_key, 1.0 - dropout, attn.shape)
        attn = jnp.where(keep, attn / (1.0 - dropout), 0.0)

    attn = attn.astype(v.dtype)
    return jnp.einsum("bhij,bhjd->bhid", attn, v)


def attend(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    mask: Optional[jax.Array] = None,
    causal: bool = False,
    scale: Optional[float] = None,
    dropout: float = 0.0,
    dropout_key: Optional[jax.Array] = None,
    backend: str = "auto",
) -> jax.Array:
    """Dispatching attention (reference Attend.forward, attend.py:112-155).

    backend: 'xla' | 'flash' | 'auto'. 'auto' picks flash on TPU for
    sequences long enough to benefit, else xla.
    """
    if backend == "auto":
        use_flash = (
            q.shape[-2] >= 256
            and k.shape[-2] >= 256
            and jax.default_backend() == "tpu"
        )
        backend = "flash" if use_flash else "xla"

    if backend == "flash":
        from naturalspeech2_tpu.ops.flash_attention import flash_attention

        if k.ndim == 3:
            k = k[:, None]
        if v.ndim == 3:
            v = v[:, None]
        if k.shape[1] == 1 and q.shape[1] != 1:
            k = jnp.broadcast_to(k, (*k.shape[:1], q.shape[1], *k.shape[2:]))
            v = jnp.broadcast_to(v, (*v.shape[:1], q.shape[1], *v.shape[2:]))
        # attention-probability dropout runs IN the kernel (counter-based
        # threefry regenerated in the backward), so training keeps the
        # flash path — no silent XLA reroute
        return flash_attention(
            q, k, v, mask=mask, causal=causal, scale=scale,
            dropout=dropout, dropout_key=dropout_key,
        )

    return attend_xla(
        q, k, v, mask=mask, causal=causal, scale=scale,
        dropout=dropout, dropout_key=dropout_key,
    )
