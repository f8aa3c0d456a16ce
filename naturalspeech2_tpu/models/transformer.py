"""Multi-head attention and transformer stacks (flax.linen).

TPU-native counterparts of the reference's `Attention` (:1029-1069),
`Transformer` (:1073-1115) and `ConditionableTransformer` (:748-809) in
`/root/reference/naturalspeech2_pytorch/naturalspeech2_pytorch.py`.
The attention math itself lives in `naturalspeech2_tpu.ops.attention`
(XLA-dot or Pallas flash kernel).

Divergence from the reference worth noting: with
``cross_attn_include_queries`` the reference concatenates queries into the
context but forwards the caller's key-padding mask unchanged, which only
works when the mask is None. Here the mask is left-padded with True for the
prepended query positions, so masked cross-attention works.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from naturalspeech2_tpu.ops.attention import attend


class _ProjParams(nn.Module):
    """Parameter-only stand-in for ``nn.Dense(use_bias=False)``: identical
    param path (``<name>/kernel``), shape and lecun-normal init, but returns
    the raw kernel so the caller can either matmul it (the standard path —
    numerically identical to Dense) or hand it to a fused Pallas kernel."""

    features: int

    @nn.compact
    def __call__(self, dim_in: int) -> jax.Array:
        return self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (dim_in, self.features),
        )


class Attention(nn.Module):
    dim: int
    dim_context: Optional[int] = None
    causal: bool = False
    dim_head: int = 64
    heads: int = 8
    dropout: float = 0.0
    use_flash: bool = False
    cross_attn_include_queries: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        context: Optional[jax.Array] = None,
        mask: Optional[jax.Array] = None,
        deterministic: bool = True,
        pre_norm: Optional[Tuple[jax.Array, jax.Array]] = None,
        residual: bool = False,
    ) -> jax.Array:
        """``pre_norm=(γ, β)`` ([b, dim] each) applies the adaptive RMSNorm
        inside this module and ``residual=True`` adds the raw input back —
        letting the whole pre-norm block fuse into ONE Pallas kernel
        (`ops.attn_block_kernel`) on the mask-free non-causal self-attention
        path (the denoiser sampling hot loop)."""
        h = self.heads
        has_context = context is not None
        raw_x = x
        dim_inner = self.dim_head * h

        wq = _ProjParams(dim_inner, name="to_q")(x.shape[-1])
        ctx_dim = context.shape[-1] if has_context else x.shape[-1]
        wkv = _ProjParams(dim_inner * 2, name="to_kv")(ctx_dim)
        wo = _ProjParams(self.dim, name="to_out")(dim_inner)

        dropout_active = self.dropout > 0.0 and not deterministic

        if pre_norm is not None and residual and not has_context:
            from naturalspeech2_tpu.ops.attn_block_kernel import (
                fits_fused_attn_block,
                fused_attn_block,
            )

            if (
                self.use_flash
                and mask is None
                and not self.causal
                and not dropout_active
                and fits_fused_attn_block(x.shape[1], self.dim, self.dim_head)
            ):
                return fused_attn_block(
                    x, pre_norm[0], pre_norm[1], wq, wkv, wo,
                    heads=h, dim_head=self.dim_head,
                    scale=self.dim_head**-0.5,
                )

        if pre_norm is not None and residual and has_context:
            from naturalspeech2_tpu.ops.attn_block_kernel import (
                fits_fused_cross_attn_block,
                fused_cross_attn_block,
            )

            if (
                self.use_flash
                and mask is None
                and not self.causal
                and not dropout_active
                and not self.cross_attn_include_queries
                and fits_fused_cross_attn_block(
                    x.shape[1], context.shape[1], self.dim,
                    context.shape[-1], self.dim_head,
                )
            ):
                return fused_cross_attn_block(
                    x, context, pre_norm[0], pre_norm[1], wq, wkv, wo,
                    heads=h, dim_head=self.dim_head,
                    scale=self.dim_head**-0.5,
                )

        if pre_norm is not None:
            from naturalspeech2_tpu.models.blocks import ada_rmsnorm

            x = ada_rmsnorm(x, pre_norm[0], pre_norm[1], self.dim)

        ctx = context if has_context else x

        if has_context and self.cross_attn_include_queries:
            ctx = jnp.concatenate([x, ctx], axis=-2)
            if mask is not None:
                mask = jnp.pad(
                    mask, ((0, 0), (x.shape[-2], 0)), constant_values=True
                )

        q = x @ wq
        kv = ctx @ wkv
        k, v = jnp.split(kv, 2, axis=-1)

        def split_heads(t):
            b, n, _ = t.shape
            return t.reshape(b, n, h, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = map(split_heads, (q, k, v))

        dropout_key = None
        if dropout_active:
            dropout_key = self.make_rng("dropout")

        out = attend(
            q, k, v,
            mask=mask,
            causal=self.causal,
            scale=self.dim_head**-0.5,
            dropout=self.dropout if not deterministic else 0.0,
            dropout_key=dropout_key,
            backend="flash" if self.use_flash else "xla",
        )

        b, _, n, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, dim_inner)
        out = out @ wo
        return out + raw_x if residual else out


class Transformer(nn.Module):
    """Pre-norm encoder: depth × [RMSNorm→attn, RMSNorm→FF] (ref :1073-1115)."""

    dim: int
    depth: int
    causal: bool = False
    dim_head: int = 64
    heads: int = 8
    use_flash: bool = False
    dropout: float = 0.0
    ff_mult: int = 4
    final_norm: bool = False
    gelu_approximate: bool = True  # False = exact erf (reference parity)

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        mask: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        from naturalspeech2_tpu.models.blocks import FeedForward, RMSNorm

        for i in range(self.depth):
            attn_in = RMSNorm(self.dim, name=f"attn_norm_{i}")(x)
            x = Attention(
                dim=self.dim,
                causal=self.causal,
                dim_head=self.dim_head,
                heads=self.heads,
                dropout=self.dropout,
                use_flash=self.use_flash,
                name=f"attn_{i}",
            )(attn_in, mask=mask, deterministic=deterministic) + x
            ff_in = RMSNorm(self.dim, name=f"ff_norm_{i}")(x)
            x = FeedForward(
                self.dim, mult=self.ff_mult,
                gelu_approximate=self.gelu_approximate, name=f"ff_{i}",
            )(ff_in) + x

        if self.final_norm:
            x = RMSNorm(self.dim, name="final_norm")(x)
        return x


class _CTLayer(nn.Module):
    """One ConditionableTransformer layer, shaped for `nn.scan` over depth:
    ``__call__(x, (ada, context)) -> (x, ())``. Adaptive γ/β arrive
    precomputed per layer (the parent's stacked einsum), so scanning does
    not change the parameter layout of the conditioning projections."""

    dim: int
    dim_head: int
    heads: int
    ff_mult: int
    ff_causal_conv: bool
    cond: bool
    cross_attn: bool
    use_flash: bool
    deterministic: bool = True
    gelu_approximate: bool = True

    @nn.compact
    def __call__(self, x, xs):
        from naturalspeech2_tpu.models.blocks import FeedForward, RMSNorm

        ada, context = xs
        scale = math.sqrt(self.dim)

        def norm(h, idx, name):
            if not self.cond:
                return RMSNorm(self.dim, name=name)(h)
            n = jnp.linalg.norm(h, axis=-1, keepdims=True)
            h = h / jnp.maximum(n, 1e-12) * scale
            gamma = ada[idx, :, None, : self.dim]
            beta = ada[idx, :, None, self.dim :]
            return h * gamma + beta

        if self.cond:
            # norm + residual handed to Attention so the whole pre-norm
            # self-attention block can run as one fused Pallas kernel
            x = Attention(
                dim=self.dim, dim_head=self.dim_head, heads=self.heads,
                use_flash=self.use_flash, name="attn",
            )(
                x, deterministic=self.deterministic,
                pre_norm=(ada[0, :, : self.dim], ada[0, :, self.dim :]),
                residual=True,
            )
        else:
            res = x
            x = norm(x, 0, "attn_norm")
            x = Attention(
                dim=self.dim, dim_head=self.dim_head, heads=self.heads,
                use_flash=self.use_flash, name="attn",
            )(x, deterministic=self.deterministic) + res

        if self.cross_attn:
            if self.cond:
                # norm + residual handed in so the whole pre-norm
                # cross-attention block (to the fixed-size prompt latents)
                # can run as one fused Pallas kernel too
                x = Attention(
                    dim=self.dim, dim_head=self.dim_head, heads=self.heads,
                    use_flash=self.use_flash, name="cross_attn",
                )(
                    x, context=context, deterministic=self.deterministic,
                    pre_norm=(ada[1, :, : self.dim], ada[1, :, self.dim :]),
                    residual=True,
                )
            else:
                res = x
                x = norm(x, 1, "cross_attn_norm")
                x = Attention(
                    dim=self.dim, dim_head=self.dim_head, heads=self.heads,
                    use_flash=self.use_flash, name="cross_attn",
                )(x, context=context, deterministic=self.deterministic) + res

        if self.cond:
            idx = 2 if self.cross_attn else 1
            x = FeedForward(
                self.dim, mult=self.ff_mult, causal_conv=self.ff_causal_conv,
                gelu_approximate=self.gelu_approximate,
                use_fused=self.use_flash, name="ff",
            )(
                x,
                pre_norm=(ada[idx, :, : self.dim], ada[idx, :, self.dim :]),
                residual=True,
            )
        else:
            res = x
            x = norm(x, 2 if self.cross_attn else 1, "ff_norm")
            x = FeedForward(
                self.dim, mult=self.ff_mult, causal_conv=self.ff_causal_conv,
                gelu_approximate=self.gelu_approximate, name="ff",
            )(x) + res
        return x, ()


class ConditionableTransformer(nn.Module):
    """Adaptive-RMSNorm transformer with optional cross-attention (ref :748-809).

    Each layer: adaRMSNorm(t)→self-attn → [adaRMSNorm(t)→cross-attn(context)]
    → adaRMSNorm(t)→FF(causal-conv), all residual; head = RMSNorm + Dense.

    ``scan_layers=True`` runs depth under one `nn.scan` (stacked per-layer
    params, program traced once — required for the dim512/depth12 scaled
    config whose unrolled 100-step sampling program overwhelms the compile
    service); ``remat=True`` adds per-layer rematerialization for training
    memory. Both are numerically identical to the unrolled path
    (tests/test_scan_layers.py).
    """

    dim: int
    depth: int
    dim_head: int = 64
    heads: int = 8
    ff_mult: int = 4
    ff_causal_conv: bool = False
    dim_cond_mult: Optional[int] = None
    cross_attn: bool = False
    use_flash: bool = False
    scan_layers: bool = False
    remat: bool = False
    gelu_approximate: bool = True  # False = exact erf (reference parity)

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        times: Optional[jax.Array] = None,
        context: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        from naturalspeech2_tpu.models.blocks import FeedForward, RMSNorm

        cond = self.dim_cond_mult is not None
        norms_per_layer = 3 if self.cross_attn else 2
        if self.cross_attn:
            # fail here, not as an opaque shape error deep inside the scan
            # path (which substitutes a zeros placeholder for scan xs)
            assert context is not None, "cross_attn=True requires context"

        if cond:
            # one stacked projection computes every adaptive norm's γ/β for
            # the whole network (depth × norms_per_layer tiny matmuls fused
            # into a single einsum per step)
            assert times is not None
            n_norms = self.depth * norms_per_layer
            dim_cond = self.dim * self.dim_cond_mult
            ada_w = self.param(
                "ada_norm_w", nn.initializers.zeros,
                (n_norms, dim_cond, 2 * self.dim),
            )
            ada_b = self.param(
                "ada_norm_b",
                lambda key, shape: jnp.concatenate(
                    [jnp.ones(shape[:-1] + (self.dim,)),
                     jnp.zeros(shape[:-1] + (self.dim,))], axis=-1,
                ),
                (n_norms, 2 * self.dim),
            )
            ada = jnp.einsum("bt,ntc->bnc", times, ada_w) + ada_b  # [b, n, 2d]
            gammas = ada[..., : self.dim][:, :, None, :]  # [b, n_norms, 1, d]
            betas = ada[..., self.dim :][:, :, None, :]
            scale = math.sqrt(self.dim)

            def ada_norm(h, idx):
                norm = jnp.linalg.norm(h, axis=-1, keepdims=True)
                h = h / jnp.maximum(norm, 1e-12) * scale
                return h * gammas[:, idx] + betas[:, idx]
        else:
            ada = None

            def ada_norm(h, idx):
                raise AssertionError("unconditional path uses RMSNorm modules")

        if self.scan_layers:
            x = self._scan_body(x, ada, context, deterministic, norms_per_layer)
            x = RMSNorm(self.dim, name="pred_norm")(x)
            return nn.Dense(self.dim, use_bias=False, name="to_pred")(x)

        def maybe_norm(h, name, idx):
            if cond:
                return ada_norm(h, idx)
            return RMSNorm(self.dim, name=name)(h)

        for i in range(self.depth):
            base = i * norms_per_layer
            if cond:
                # fused pre-norm self-attention block (norm+residual inside)
                x = Attention(
                    dim=self.dim,
                    dim_head=self.dim_head,
                    heads=self.heads,
                    use_flash=self.use_flash,
                    name=f"attn_{i}",
                )(
                    x, deterministic=deterministic,
                    pre_norm=(ada[:, base, : self.dim], ada[:, base, self.dim :]),
                    residual=True,
                )
            else:
                res = x
                x = maybe_norm(x, f"attn_norm_{i}", base)
                x = Attention(
                    dim=self.dim,
                    dim_head=self.dim_head,
                    heads=self.heads,
                    use_flash=self.use_flash,
                    name=f"attn_{i}",
                )(x, deterministic=deterministic) + res

            if self.cross_attn:
                assert context is not None
                if cond:
                    # norm + residual inside → fused cross-attention block
                    x = Attention(
                        dim=self.dim,
                        dim_head=self.dim_head,
                        heads=self.heads,
                        use_flash=self.use_flash,
                        name=f"cross_attn_{i}",
                    )(
                        x, context=context, deterministic=deterministic,
                        pre_norm=(
                            ada[:, base + 1, : self.dim],
                            ada[:, base + 1, self.dim :],
                        ),
                        residual=True,
                    )
                else:
                    res = x
                    x = maybe_norm(x, f"cross_attn_norm_{i}", base + 1)
                    x = Attention(
                        dim=self.dim,
                        dim_head=self.dim_head,
                        heads=self.heads,
                        use_flash=self.use_flash,
                        name=f"cross_attn_{i}",
                    )(x, context=context, deterministic=deterministic) + res

            if cond:
                idx = base + norms_per_layer - 1
                x = FeedForward(
                    self.dim, mult=self.ff_mult,
                    causal_conv=self.ff_causal_conv,
                    gelu_approximate=self.gelu_approximate,
                    use_fused=self.use_flash, name=f"ff_{i}",
                )(
                    x,
                    pre_norm=(ada[:, idx, : self.dim], ada[:, idx, self.dim :]),
                    residual=True,
                )
            else:
                res = x
                x = maybe_norm(x, f"ff_norm_{i}", base + norms_per_layer - 1)
                x = FeedForward(
                    self.dim, mult=self.ff_mult,
                    causal_conv=self.ff_causal_conv,
                    gelu_approximate=self.gelu_approximate, name=f"ff_{i}",
                )(x) + res

        x = RMSNorm(self.dim, name="pred_norm")(x)
        return nn.Dense(self.dim, use_bias=False, name="to_pred")(x)

    def _scan_body(self, x, ada, context, deterministic, norms_per_layer):
        """Depth under one `nn.scan`; per-layer params stacked on axis 0."""
        cond = ada is not None
        if cond:
            b = x.shape[0]
            # [b, depth·npl, 2d] → [depth, npl, b, 2d] per-layer slices
            ada_xs = ada.reshape(b, self.depth, norms_per_layer, -1)
            ada_xs = jnp.moveaxis(ada_xs, 0, 2)
        else:
            ada_xs = jnp.zeros((self.depth, 1))
        if context is None:
            context = jnp.zeros((1,))  # scan xs cannot be None; unused

        layer_cls = _CTLayer
        if self.remat:
            layer_cls = nn.remat(
                layer_cls, prevent_cse=False, static_argnums=()
            )
        scan_cls = nn.scan(
            layer_cls,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=((0, nn.broadcast),),
            length=self.depth,
        )
        x, _ = scan_cls(
            dim=self.dim,
            dim_head=self.dim_head,
            heads=self.heads,
            ff_mult=self.ff_mult,
            ff_causal_conv=self.ff_causal_conv,
            cond=cond,
            cross_attn=self.cross_attn,
            use_flash=self.use_flash,
            deterministic=deterministic,
            gelu_approximate=self.gelu_approximate,
            name="layers",
        )(x, (ada_xs, context))
        return x
