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
