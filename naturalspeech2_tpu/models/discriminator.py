"""Multi-scale STFT discriminators for adversarial codec training.

The reference's audio quality comes from a *pretrained* Encodec
(`/root/reference/naturalspeech2_pytorch/naturalspeech2_pytorch.py:23`);
training an equivalent codec from scratch requires the adversarial recipe
of SoundStream/Encodec (Défossez et al. 2022): a set of discriminators,
one per STFT resolution, operating on the complex spectrogram (real/imag
as channels), with feature-matching loss over their intermediate
activations. All 2D convs run channels-last (NHWC — XLA TPU's native conv
layout).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from naturalspeech2_tpu.ops.mel import stft

# (n_fft, hop) per scale — Encodec uses five dyadic scales
DEFAULT_SCALES: Tuple[Tuple[int, int], ...] = (
    (1024, 256),
    (512, 128),
    (256, 64),
)


class STFTDiscriminator(nn.Module):
    """One discriminator over one STFT resolution.

    Input ``[b, T]`` waveform → complex STFT → ``[b, frames, bins, 2]``
    (real/imag) → strided LeakyReLU conv stack → logits map. Returns the
    logits and every intermediate feature map (for feature matching)."""

    n_fft: int
    hop: int
    channels: int = 32
    n_layers: int = 4

    @nn.compact
    def __call__(self, audio: jax.Array):
        spec = stft(audio, n_fft=self.n_fft, hop_length=self.hop,
                    win_length=self.n_fft)  # [b, bins, frames] complex
        x = jnp.stack([spec.real, spec.imag], axis=-1)  # [b, bins, frames, 2]
        x = jnp.swapaxes(x, 1, 2)  # [b, frames, bins, 2]

        features: List[jax.Array] = []
        ch = self.channels
        x = nn.Conv(ch, (3, 9), padding="SAME")(x)
        x = nn.leaky_relu(x, 0.2)
        features.append(x)
        for i in range(self.n_layers - 1):
            # stride along frequency: each scale halves the bin count
            x = nn.Conv(ch, (3, 9), strides=(1, 2), padding="SAME")(x)
            x = nn.leaky_relu(x, 0.2)
            features.append(x)
        x = nn.Conv(ch, (3, 3), padding="SAME")(x)
        x = nn.leaky_relu(x, 0.2)
        features.append(x)
        logits = nn.Conv(1, (3, 3), padding="SAME")(x)  # [b, f, b', 1]
        return logits, features


class MultiScaleSTFTDiscriminator(nn.Module):
    """Encodec-style ensemble: one `STFTDiscriminator` per scale."""

    scales: Sequence[Tuple[int, int]] = DEFAULT_SCALES
    channels: int = 32

    @nn.compact
    def __call__(self, audio: jax.Array):
        logits, features = [], []
        for n_fft, hop in self.scales:
            lg, ft = STFTDiscriminator(
                n_fft=n_fft, hop=hop, channels=self.channels,
                name=f"disc_{n_fft}",
            )(audio)
            logits.append(lg)
            features.append(ft)
        return logits, features


# ------------------------------------------------------------------ losses


def discriminator_hinge_loss(real_logits, fake_logits) -> jax.Array:
    """L_D = Σ_k E[relu(1 − D_k(x))] + E[relu(1 + D_k(x̂))]."""
    total = 0.0
    for r, f in zip(real_logits, fake_logits):
        total = total + jnp.mean(nn.relu(1.0 - r)) + jnp.mean(nn.relu(1.0 + f))
    return total / len(real_logits)


def generator_hinge_loss(fake_logits) -> jax.Array:
    """L_G = Σ_k E[relu(1 − D_k(x̂))] (hinge form used by Encodec)."""
    total = 0.0
    for f in fake_logits:
        total = total + jnp.mean(nn.relu(1.0 - f))
    return total / len(fake_logits)


def feature_matching_loss(real_features, fake_features) -> jax.Array:
    """Σ_k Σ_l ‖D_k^l(x) − D_k^l(x̂)‖₁ / mean‖D_k^l(x)‖₁."""
    total = 0.0
    count = 0
    for rs, fs in zip(real_features, fake_features):
        for r, f in zip(rs, fs):
            denom = jnp.maximum(jnp.abs(r).mean(), 1e-6)
            total = total + jnp.abs(r - f).mean() / denom
            count += 1
    return total / max(count, 1)
