"""WaveNet stack of the denoiser (flax.linen, ``[b, n, d]`` layout).

TPU-native counterpart of the reference's `WavenetResBlock` / `WavenetStack`
/ `Wavenet` (`/root/reference/naturalspeech2_pytorch/naturalspeech2_pytorch.py:597-725`):
dilated causal convs with FiLM time conditioning and gated tanh·sigmoid
activations. Structure preserved exactly — stack s>0's block i consumes the
residual output of stack s−1's block i (a list-threaded "lane" per dilation),
and only the last stack emits skip outputs, which are summed before the
final 1×1 conv. All convs run channels-last via XLA's native NLC conv path
(no channel-first rearranges)."""

from __future__ import annotations

from typing import List, Optional, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from naturalspeech2_tpu.models.blocks import CausalConv1d


class WavenetResBlock(nn.Module):
    dim: int
    dilation: int
    kernel_size: int = 3
    skip_conv: bool = False
    dim_cond_mult: Optional[int] = None

    @nn.compact
    def __call__(self, x: jax.Array, t: Optional[jax.Array] = None):
        res = CausalConv1d(self.dim, 1, name="res_conv")(x)

        h = CausalConv1d(
            self.dim, self.kernel_size, dilation=self.dilation, name="conv"
        )(x)

        if self.dim_cond_mult is not None:
            assert t is not None
            film = nn.Dense(self.dim * 2, name="to_time_cond")(t)  # [b, 2d]
            t_gamma, t_beta = jnp.split(film, 2, axis=-1)
            h = h * t_gamma[:, None, :] + t_beta[:, None, :]

        h = jnp.tanh(h) * jax.nn.sigmoid(h)
        h = h + res

        skip = None
        if self.skip_conv:
            skip = CausalConv1d(self.dim, 1, name="skip_conv")(h)
        return h, skip


class WavenetStack(nn.Module):
    """`layers` blocks at dilations 2⁰..2^(layers−1) (ref :645-688).

    Input: a single tensor (fanned to every block) or a list of per-block
    residuals from the previous stack. Returns the residual list, or the
    stacked skips for the final stack."""

    dim: int
    layers: int
    kernel_size: int = 3
    has_skip: bool = False
    dim_cond_mult: Optional[int] = None

    @nn.compact
    def __call__(
        self,
        x: Union[jax.Array, List[jax.Array]],
        t: Optional[jax.Array] = None,
    ):
        if isinstance(x, jax.Array):
            x = [x] * self.layers

        residuals, skips = [], []
        for i, block_input in enumerate(x):
            residual, skip = WavenetResBlock(
                dim=self.dim,
                dilation=2**i,
                kernel_size=self.kernel_size,
                skip_conv=self.has_skip,
                dim_cond_mult=self.dim_cond_mult,
                name=f"block_{i}",
            )(block_input, t)
            residuals.append(residual)
            skips.append(skip)

        if self.has_skip:
            return jnp.stack(skips)
        return residuals


class FusedWavenet(nn.Module):
    """Same computation as `Wavenet` with stacked parameters, executed as a
    single fused Pallas kernel (`ops.wavenet_kernel`) — one launch instead of
    ~33 small convs. Time conditioning (all blocks' FiLM projections) is one
    einsum. ``use_pallas=False`` runs the numerically-equivalent XLA twin
    (also the gradient path)."""

    dim: int
    stacks: int
    layers: int
    init_conv_kernel: int = 3
    dim_cond_mult: Optional[int] = None
    use_pallas: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, t: Optional[jax.Array] = None) -> jax.Array:
        from naturalspeech2_tpu.ops.wavenet_kernel import (
            fused_wavenet_body,
            wavenet_body_xla,
        )

        d, S, L = self.dim, self.stacks, self.layers
        x = CausalConv1d(d, self.init_conv_kernel, name="init_conv")(x)
        b = x.shape[0]

        stacked_init = nn.initializers.variance_scaling(
            1.0, "fan_in", "truncated_normal", in_axis=-2, out_axis=-1,
        )
        conv_w = self.param("conv_w", stacked_init, (S, L, 3 * d, d))
        conv_b = self.param("conv_b", nn.initializers.zeros, (S, L, d))
        res_w = self.param("res_w", stacked_init, (S, L, d, d))
        res_b = self.param("res_b", nn.initializers.zeros, (S, L, d))
        skip_w = self.param("skip_w", stacked_init, (L, d, d))
        skip_b = self.param("skip_b", nn.initializers.zeros, (L, d))

        if self.dim_cond_mult is not None:
            assert t is not None
            dim_time = d * self.dim_cond_mult
            film_w = self.param(
                "film_w", stacked_init, (S, L, dim_time, 2 * d)
            )
            film_b = self.param(
                "film_b",
                lambda key, shape: jnp.concatenate(
                    [jnp.ones(shape[:-1] + (d,)), jnp.zeros(shape[:-1] + (d,))],
                    axis=-1,
                ),
                (S, L, 2 * d),
            )
            film = jnp.einsum("bt,sltc->bslc", t, film_w) + film_b
        else:
            film = jnp.broadcast_to(
                jnp.concatenate([jnp.ones((d,)), jnp.zeros((d,))]),
                (b, S, L, 2 * d),
            )

        body = fused_wavenet_body if self.use_pallas else wavenet_body_xla
        skip = body(x, conv_w, conv_b, res_w, res_b, skip_w, skip_b, film)
        return CausalConv1d(d, 1, name="final_conv")(skip)


class Wavenet(nn.Module):
    """Init causal conv → stacks (last with skips) → sum skips → 1×1 (ref :690-725)."""

    dim: int
    stacks: int
    layers: int
    init_conv_kernel: int = 3
    dim_cond_mult: Optional[int] = None

    @nn.compact
    def __call__(self, x: jax.Array, t: Optional[jax.Array] = None) -> jax.Array:
        x = CausalConv1d(self.dim, self.init_conv_kernel, name="init_conv")(x)

        for s in range(self.stacks):
            is_last = s == self.stacks - 1
            x = WavenetStack(
                dim=self.dim,
                layers=self.layers,
                dim_cond_mult=self.dim_cond_mult,
                has_skip=is_last,
                name=f"stack_{s}",
            )(x, t)

        return CausalConv1d(self.dim, 1, name="final_conv")(x.sum(axis=0))
