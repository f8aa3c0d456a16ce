"""Multi-resolution STFT reconstruction loss (jittable).

The reference delegates codec training entirely to the external
audiolm-pytorch/Encodec stack; a complete framework must be able to train
its own codec. This is the standard multi-resolution spectral loss
(spectral-convergence + log-magnitude L1 over several FFT sizes,
SoundStream/Encodec-style) built on the JAX STFT from `ops.mel`.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from naturalspeech2_tpu.ops.mel import stft

DEFAULT_RESOLUTIONS: Tuple[Tuple[int, int, int], ...] = (
    # (n_fft, hop, win)
    (512, 128, 512),
    (1024, 256, 1024),
    (2048, 512, 2048),
)


def stft_magnitude(audio: jax.Array, n_fft: int, hop: int, win: int) -> jax.Array:
    spec = stft(audio, n_fft=n_fft, hop_length=hop, win_length=win)
    return jnp.abs(spec)


def multi_resolution_stft_loss(
    pred: jax.Array,
    target: jax.Array,
    resolutions: Sequence[Tuple[int, int, int]] = DEFAULT_RESOLUTIONS,
    eps: float = 1e-7,
) -> jax.Array:
    """Σ over resolutions of spectral convergence + log-magnitude L1."""
    total = 0.0
    for n_fft, hop, win in resolutions:
        m_pred = stft_magnitude(pred, n_fft, hop, win)
        m_tgt = stft_magnitude(target, n_fft, hop, win)
        sc = jnp.linalg.norm(m_tgt - m_pred) / jnp.maximum(
            jnp.linalg.norm(m_tgt), eps
        )
        log_mag = jnp.abs(
            jnp.log(m_pred + eps) - jnp.log(m_tgt + eps)
        ).mean()
        total = total + sc + log_mag
    return total / len(resolutions)
