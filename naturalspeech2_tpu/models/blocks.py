"""Core neural building blocks (flax.linen, ``[b, n, d]`` layout).

TPU-native counterparts of the reference blocks in
`/root/reference/naturalspeech2_pytorch/naturalspeech2_pytorch.py`:
RMSNorm (+ adaptive/conditional variant) :727-746, LearnedSinusoidalPosEmb
:108-120, CausalConv1d :583-595, Block/ResnetBlock/ConvBlock :345-410, and
GEGLU/FeedForward :1004-1025.

Everything stays channels-last (NLC) — the native layout for XLA TPU convs —
instead of the reference's channel-first rearranges. Weight init follows
flax defaults (lecun-normal) except where noted; the adaptive RMSNorm's
γ-head is initialised so γ≈1, β≈0 at init (identity modulation — a deliberate
improvement over the reference's uniform Linear init).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def ada_rmsnorm(
    x: jax.Array, gamma: jax.Array, beta: jax.Array, dim: int
) -> jax.Array:
    """Adaptive RMSNorm ``x/‖x‖·√d·γ+β`` with per-sample [b, d] γ/β —
    the ConditionableTransformer norm (ref :744-746). Shared by the fused
    attention/FF block kernels and their unfused fallbacks."""
    norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
    x = x / jnp.maximum(norm, 1e-12) * math.sqrt(dim)
    # γ/β follow the activation dtype: the time-conditioning FiLM stays f32
    # even under bf16 params (sinusoidal t is f32), and letting it promote
    # would silently run the whole block — and the dtype-strict causal conv
    # downstream — in f32
    return (
        x * gamma[:, None, :].astype(x.dtype)
        + beta[:, None, :].astype(x.dtype)
    )


class _DenseParams(nn.Module):
    """Parameter-only stand-in for ``nn.Dense``: identical param paths
    (``<name>/kernel``, ``<name>/bias``), shapes and inits, but returns the
    raw arrays so callers can either matmul them (bit-identical to Dense)
    or hand them to a fused Pallas kernel."""

    features: int

    @nn.compact
    def __call__(self, dim_in: int) -> Tuple[jax.Array, jax.Array]:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (dim_in, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class _ConvParams(nn.Module):
    """Parameter-only stand-in for ``nn.Conv`` (1-D)."""

    kernel_size: int
    features: int

    @nn.compact
    def __call__(self, dim_in: int) -> Tuple[jax.Array, jax.Array]:
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, dim_in, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class _CausalConvParams(nn.Module):
    """Parameter tree twin of `CausalConv1d` (child ``Conv_0``)."""

    kernel_size: int
    features: int

    @nn.compact
    def __call__(self, dim_in: int) -> Tuple[jax.Array, jax.Array]:
        return _ConvParams(
            self.kernel_size, self.features, name="Conv_0"
        )(dim_in)


class RMSNorm(nn.Module):
    """x/‖x‖·√dim·γ with optional per-sample FiLM conditioning (ref :727-746)."""

    dim: int
    scale: bool = True
    dim_cond: Optional[int] = None

    @nn.compact
    def __call__(self, x: jax.Array, cond: Optional[jax.Array] = None) -> jax.Array:
        norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
        out = x / jnp.maximum(norm, 1e-12) * math.sqrt(self.dim)
        if self.scale:
            gamma = self.param("gamma", nn.initializers.ones, (self.dim,))
            out = out * gamma
        if self.dim_cond is None:
            return out
        assert cond is not None, "conditional RMSNorm requires cond"
        # init: gamma-part bias 1, beta-part 0 → identity modulation at init
        gb = nn.Dense(
            self.dim * 2,
            kernel_init=nn.initializers.zeros,
            bias_init=lambda key, shape, dtype=jnp.float32: jnp.concatenate(
                [jnp.ones((self.dim,), dtype), jnp.zeros((self.dim,), dtype)]
            ),
            name="to_gamma_beta",
        )(cond)
        gamma, beta = jnp.split(gb, 2, axis=-1)
        gamma = gamma[:, None, :]
        beta = beta[:, None, :]
        return out * gamma + beta


class LearnedSinusoidalPosEmb(nn.Module):
    """Learned-frequency Fourier time embedding, output dim ``dim+1`` (ref :108-120)."""

    dim: int

    @nn.compact
    def __call__(self, t: jax.Array) -> jax.Array:
        assert self.dim % 2 == 0
        half_dim = self.dim // 2
        weights = self.param(
            "weights", nn.initializers.normal(1.0), (half_dim,)
        )
        t = t[:, None]
        freqs = t * weights[None, :] * 2 * math.pi
        return jnp.concatenate([t, jnp.sin(freqs), jnp.cos(freqs)], axis=-1)


class CausalConv1d(nn.Module):
    """1-D conv with left padding ``dilation·(kernel−1)`` (ref :583-595).

    Input/output ``[b, n, d]``; stride fixed at 1 like the reference assert.
    """

    features: int
    kernel_size: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        pad = self.dilation * (self.kernel_size - 1)
        return nn.Conv(
            self.features,
            kernel_size=(self.kernel_size,),
            kernel_dilation=(self.dilation,),
            padding=[(pad, 0)],
        )(x)


class ConvUnit(nn.Module):
    """Conv(k, same) → GroupNorm(groups) → SiLU → dropout (ref ``Block`` :345-365)."""

    dim_out: int
    kernel: int = 3
    groups: int = 8
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        x = nn.Conv(self.dim_out, (self.kernel,), padding=self.kernel // 2)(x)
        # epsilon follows torch nn.GroupNorm (1e-5; flax defaults to 1e-6) so
        # the shared-weights oracle parity holds at tight tolerances
        x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5)(x)
        x = nn.silu(x)
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


class ResnetBlock(nn.Module):
    """num_convs × ConvUnit with a 1×1-projected residual (ref :367-401)."""

    dim_out: int
    kernel: int
    dropout: float = 0.0
    groups: int = 8
    num_convs: int = 2

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        h = x
        for _ in range(self.num_convs):
            h = ConvUnit(
                self.dim_out, self.kernel, groups=self.groups, dropout=self.dropout
            )(h, deterministic=deterministic)
        if x.shape[-1] != self.dim_out:
            x = nn.Conv(self.dim_out, (1,))(x)
        return h + x


class ConvBlock(nn.Module):
    """Conv(k, same) → SiLU → dropout, no norm (ref :403-410)."""

    dim_out: int
    kernel: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        x = nn.Conv(self.dim_out, (self.kernel,), padding=self.kernel // 2)(x)
        x = nn.silu(x)
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


class FeedForward(nn.Module):
    """GEGLU MLP: Dense(2·inner) → gelu-gated → [causal conv] → Dense(dim).

    ``inner = int(dim·mult·2/3)`` like ref :1009-1025; the optional
    CausalConv1d(3) between gate and out-projection is the denoiser variant.
    """

    dim: int
    mult: int = 4
    causal_conv: bool = False
    # tanh-approximate gelu is the TPU-fast default: the exact erf form
    # (torch F.gelu) costs ~28 µs per FFN on v5e (~9% of the flagship
    # denoise step), while the measured flagship 100-step CFG latent MSE vs
    # the exact-erf oracle is 1.8e-08 with the approximation (1.3e-12 with
    # exact) — both five-plus orders inside the <1e-3 north star. Set
    # False for bit-level reference parity (tests/test_reference_parity.py).
    gelu_approximate: bool = True
    # route pre-norm residual blocks to the fused Pallas kernel
    # (`ops.ff_block_kernel`) — one launch for norm+GEGLU+conv+out+residual
    use_fused: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        pre_norm: Optional[Tuple[jax.Array, jax.Array]] = None,
        residual: bool = False,
    ) -> jax.Array:
        """``pre_norm=(γ, β)`` ([b, dim] each) applies the adaptive RMSNorm
        inside this module and ``residual=True`` adds the raw input back —
        the denoiser-layer configuration that fuses into one kernel."""
        dim_inner = int(self.dim * self.mult * 2 / 3)
        raw_x = x

        w1, b1 = _DenseParams(dim_inner * 2, name="Dense_0")(x.shape[-1])
        wc = bc = None
        if self.causal_conv:
            wc, bc = _CausalConvParams(3, dim_inner, name="CausalConv1d_0")(
                dim_inner
            )
        w2, b2 = _DenseParams(self.dim, name="Dense_1")(dim_inner)

        if (
            pre_norm is not None
            and residual
            and self.use_fused
            and self.causal_conv
            and self.gelu_approximate
        ):
            from naturalspeech2_tpu.ops.ff_block_kernel import (
                fits_fused_ff_block,
                fused_ff_block,
            )

            if fits_fused_ff_block(x.shape[1], self.dim, dim_inner):
                return fused_ff_block(
                    x, pre_norm[0], pre_norm[1], w1, b1, wc, bc, w2, b2,
                    approximate=True,
                )

        if pre_norm is not None:
            x = ada_rmsnorm(x, pre_norm[0], pre_norm[1], self.dim)

        x = x @ w1 + b1
        x, gate = jnp.split(x, 2, axis=-1)
        x = nn.gelu(gate, approximate=self.gelu_approximate) * x
        if self.causal_conv:
            x = jax.lax.conv_general_dilated(
                x, wc.astype(x.dtype), (1,), [(2, 0)],
                dimension_numbers=("NWC", "WIO", "NWC"),
            ) + bc.astype(x.dtype)
        x = x @ w2 + b2
        return x + raw_x if residual else x
