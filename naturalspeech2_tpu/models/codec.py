"""Neural audio codec (SoundStream/Encodec-class) — jittable JAX, RVQ fused.

TPU-native replacement for the external codec the reference imports from
`audiolm_pytorch` (`EncodecWrapper` / `SoundStream`,
`/root/reference/naturalspeech2_pytorch/naturalspeech2_pytorch.py:23`).
Exposes the exact contract the diffusion layer consumes (SURVEY.md §2.5):

- ``__call__(audio_2d, return_encoded=True, curtail_from_left=...) →
  (latents [b, n, codebook_dim], codes [b, n, Q], None)``  (ref :1445, :1611)
- ``decode(latents) → audio [b, T]``                        (ref :1496)
- ``rq(latents, codes) → (quantized, ce_loss)``             (ref :1682)
- attrs ``target_sample_hz`` (24 kHz), ``seq_len_multiple_of`` (hop 320),
  ``codebook_dim`` (128)                                    (ref :1213-1244)

Architecture (ours, not a translation): strided-conv encoder with ELU
residual units, strides (2, 4, 5, 8) → 320× temporal compression at 24 kHz;
mirror transposed-conv decoder; residual VQ through the fused Pallas kernel
(`naturalspeech2_tpu.ops.rvq`) with straight-through gradients. Weights are
randomly initialised (no pretrained Encodec on TPU); training losses for the
codec itself (reconstruction + commitment) are provided via ``codec_loss``.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from naturalspeech2_tpu.ops.rvq import rvq_cross_entropy, rvq_quantize, rvq_xla


class ResidualUnit(nn.Module):
    """Two ELU convs (dilated k=7, then k=1) with residual."""

    chan: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.elu(x)
        h = nn.Conv(self.chan, (7,), kernel_dilation=(self.dilation,), padding="SAME")(h)
        h = nn.elu(h)
        h = nn.Conv(self.chan, (1,))(h)
        return x + h


class EncoderBlock(nn.Module):
    chan_out: int
    stride: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = ResidualUnit(x.shape[-1], dilation=1)(x)
        x = ResidualUnit(x.shape[-1], dilation=3)(x)
        x = nn.elu(x)
        return nn.Conv(
            self.chan_out, (2 * self.stride,), strides=(self.stride,), padding="SAME"
        )(x)


class DecoderBlock(nn.Module):
    chan_out: int
    stride: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.elu(x)
        x = nn.ConvTranspose(
            self.chan_out, (2 * self.stride,), strides=(self.stride,), padding="SAME"
        )(x)
        x = ResidualUnit(self.chan_out, dilation=1)(x)
        x = ResidualUnit(self.chan_out, dilation=3)(x)
        return x


class SoundStream(nn.Module):
    """Jittable codec. Audio in/out is ``[b, T]`` float in [-1, 1]."""

    codebook_dim: int = 128
    channels: int = 32
    strides: Sequence[int] = (2, 4, 5, 8)
    num_quantizers: int = 8
    codebook_size: int = 1024
    target_sample_hz: int = 24000
    use_pallas_rvq: bool = True

    @property
    def seq_len_multiple_of(self) -> int:
        return math.prod(self.strides)

    # downsample factor (hop): 2·4·5·8 = 320 samples per latent frame,
    # matching the reference codec contract (README.md:60,68 — 327680
    # samples ↔ 1024 latent frames).

    def setup(self):
        chans = [self.channels * (2**i) for i in range(len(self.strides))]
        self.encoder_stem = nn.Conv(self.channels, (7,), padding="SAME")
        self.encoder_blocks = [
            EncoderBlock(chan_out=c, stride=s) for c, s in zip(chans, self.strides)
        ]
        self.encoder_head = nn.Conv(self.codebook_dim, (3,), padding="SAME")

        rev_chans = list(reversed(chans))
        self.decoder_stem = nn.Conv(rev_chans[0], (7,), padding="SAME")
        self.decoder_blocks = [
            DecoderBlock(chan_out=c, stride=s)
            for c, s in zip(rev_chans[1:] + [self.channels], reversed(self.strides))
        ]
        self.decoder_head = nn.Conv(1, (7,), padding="SAME")

        self.codebooks = self.param(
            "codebooks",
            nn.initializers.normal(1.0),
            (self.num_quantizers, self.codebook_size, self.codebook_dim),
        )

    # ------------------------------------------------------------------ #

    def encode_latents(self, audio: jax.Array) -> jax.Array:
        """audio ``[b, T]`` (T divisible by hop) → latents ``[b, n, d]``."""
        x = audio[..., None]
        x = self.encoder_stem(x)
        for blk in self.encoder_blocks:
            x = blk(x)
        return self.encoder_head(x)

    def quantize(self, latents: jax.Array) -> Tuple[jax.Array, jax.Array]:
        b, n, d = latents.shape
        flat = latents.reshape(b * n, d)
        if self.use_pallas_rvq:
            quantized, codes = rvq_quantize(flat, self.codebooks)
        else:
            quantized, codes = rvq_xla(flat, self.codebooks)
        # straight-through already applied to quantized via custom_vjp for the
        # pallas path; make the xla path match:
        if not self.use_pallas_rvq:
            quantized = flat + jax.lax.stop_gradient(quantized - flat)
        return (
            quantized.reshape(b, n, d),
            codes.reshape(b, n, self.num_quantizers),
        )

    def decode(self, latents: jax.Array) -> jax.Array:
        """latents ``[b, n, d]`` → audio ``[b, n·hop]`` (ref decode :1496)."""
        x = self.decoder_stem(latents)
        for blk in self.decoder_blocks:
            x = blk(x)
        x = self.decoder_head(x)
        return x[..., 0]

    def decode_from_codes(self, codes: jax.Array) -> jax.Array:
        """codes ``[b, n, Q]`` → audio, summing per-stage codebook entries."""
        latents = self.dequantize(codes)
        return self.decode(latents)

    def dequantize(self, codes: jax.Array) -> jax.Array:
        total = jnp.zeros((*codes.shape[:2], self.codebook_dim), self.codebooks.dtype)
        for qi in range(self.num_quantizers):
            total = total + self.codebooks[qi][codes[..., qi]]
        return total

    def rq(self, latents: jax.Array, codes: jax.Array):
        """(quantized, ce_loss) against given codes (ref ``codec.rq`` :1682)."""
        b, n, d = latents.shape
        flat = latents.reshape(b * n, d)
        ce = rvq_cross_entropy(flat, self.codebooks, codes.reshape(b * n, -1))
        quantized = self.dequantize(codes)
        return quantized, ce

    def __call__(
        self,
        audio: jax.Array,
        return_encoded: bool = False,
        curtail_from_left: bool = False,
    ):
        """Reference codec call contract (`naturalspeech2_pytorch.py:1445,1611`).

        Trims ``T`` to a hop multiple (from the left for prompts), encodes,
        quantizes. With ``return_encoded``: ``(latents, codes, None)`` where
        ``latents`` are the *unquantized* encoder outputs the diffusion
        operates on (continuous latents per NaturalSpeech 2). Without:
        reconstructed audio.
        """
        hop = self.seq_len_multiple_of
        t = audio.shape[-1]
        t_use = (t // hop) * hop
        if t_use != t:
            audio = audio[..., t - t_use :] if curtail_from_left else audio[..., :t_use]

        latents = self.encode_latents(audio)
        quantized, codes = self.quantize(latents)

        if return_encoded:
            return latents, codes, None
        return self.decode(quantized)

    def codec_loss(self, audio: jax.Array) -> dict:
        """Training losses for the codec itself: waveform L1 + latent
        commitment ‖latents − sg(quantized)‖²  (SoundStream-style)."""
        latents = self.encode_latents(audio)
        quantized, codes = self.quantize(latents)
        recon = self.decode(latents + jax.lax.stop_gradient(quantized - latents))
        recon_loss = jnp.abs(recon - audio).mean()
        commit = ((latents - jax.lax.stop_gradient(quantized)) ** 2).mean()
        return {"recon": recon_loss, "commitment": commit}
