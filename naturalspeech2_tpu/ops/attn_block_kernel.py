"""Fused self-attention block as a single Pallas TPU kernel.

Motivation (measured, v5e, flagship dim128/depth6 b4×n1024): the denoise
step is ~92% transformer, and most of a layer's attention time is HBM
round-trips, not math — the q/kv projections write 24 MB of activations
that the flash kernel immediately reads back, and the out-projection
round-trips another 16 MB. At ~820 GB/s that is ~60 µs/layer of pure
streaming for ~18 GFLOP of work.

This kernel runs the ENTIRE pre-norm self-attention block

    y = x + W_o · attn( n(x)·W_q, n(x)·W_k, n(x)·W_v )
    n(x) = x/max(‖x‖₂, 1e-12) · √d · γ + β          (adaptive RMSNorm)

in one launch: grid ``(batch, heads)``, weights delivered per-head via
BlockSpec index maps ([H, d_model, d_head] layout — no in-kernel lane
slicing), the [n, n] logits tile living only in VMEM, and the residual
accumulated directly into the revisited output block. HBM traffic per
layer drops to x-in + y-out + weights (~5 MB at the flagship shape).

The reference computes this as five separate modules
(`/root/reference/naturalspeech2_pytorch/naturalspeech2_pytorch.py:786-795`
adaptive norm + residual, `:1029-1069` Attention, attend.py:102-108 SDPA).

Scope: self-attention, no key-padding mask, non-causal, no dropout — the
exact configuration of the denoiser transformer's self-attention, which is
the sampling hot loop (the headline benchmark). Everything else stays on
the flash-kernel path. Backward: custom_vjp against the numerically
identical XLA twin (sampling is forward-only; training takes the fwd
kernel + XLA backward).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Mosaic's default scoped-vmem cap is 16 MB but v5e VMEM is far larger (a
# 22.6 MB kernel compiles and runs with the cap raised — see
# wavenet_kernel); the kernels below request a 96 MB cap, and this budget
# gates which shapes route to them (dim512/n1024 ≈ 15 MB estimate: in).
VMEM_BUDGET_BYTES = 40 * 2**20


def _vmem_bytes(n: int, dm: int, dh: int) -> int:
    """f32 footprint: x + out blocks (×2 for pipelining) + logits tile +
    q/k/v (lane-padded to 128) + per-head weight blocks."""
    dh_pad = max(dh, 128)
    return 4 * (
        4 * n * dm          # x, out, double-buffered
        + n * n             # logits/probs tile
        + 3 * n * dh_pad    # q, k, v
        + 4 * dm * dh_pad   # wq, wk, wv, wo blocks
        + n                 # norm/softmax row statistics
    )


def fits_fused_attn_block(n: int, dm: int, dh: int) -> bool:
    """Shape gate: VMEM fit + TPU tiling (8-row sublanes)."""
    return n % 8 == 0 and _vmem_bytes(n, dm, dh) <= VMEM_BUDGET_BYTES


def attn_block_xla(x, gamma, beta, wq, wk, wv, wo, *, scale: float):
    """Pure-XLA twin (backward path + numerical reference).

    x: [b, n, dm]; gamma/beta: [b, dm]; wq/wk/wv: [H, dm, dh];
    wo: [H, dh, dm]. Returns x + W_o·attn(norm(x)·W_qkv).
    """
    dm = x.shape[-1]
    xf = x.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(xf * xf, axis=-1, keepdims=True))
    xn = xf / jnp.maximum(norm, 1e-12) * math.sqrt(dm)
    xn = xn * gamma[:, None, :].astype(jnp.float32) + beta[:, None, :].astype(
        jnp.float32
    )

    q = jnp.einsum("bnd,hdk->bhnk", xn, wq.astype(jnp.float32))
    k = jnp.einsum("bnd,hdk->bhnk", xn, wk.astype(jnp.float32))
    v = jnp.einsum("bnd,hdk->bhnk", xn, wv.astype(jnp.float32))
    s = jnp.einsum("bhik,bhjk->bhij", q, k) * scale
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhij,bhjk->bhik", p, v)
    y = jnp.einsum("bhnk,hkd->bnd", o, wo.astype(jnp.float32))
    return (xf + y).astype(x.dtype)


def _attn_block_kernel(
    x_ref, gamma_ref, beta_ref, wq_ref, wk_ref, wv_ref, wo_ref, out_ref,
    acc_scratch,
    *, scale: float, dim: int,
):
    h = pl.program_id(1)
    n_heads = pl.num_programs(1)

    # bf16 inputs keep bf16 MXU inputs (2× v5e matmul rate) with f32
    # accumulation; norm/softmax statistics always f32. f32 inputs are
    # bit-identical to the all-f32 kernel.
    mm = jnp.bfloat16 if x_ref.dtype == jnp.bfloat16 else jnp.float32
    x = x_ref[0].astype(jnp.float32)  # [n, dm]

    # adaptive RMSNorm (recomputed per head — a few VPU passes, cheaper than
    # holding a second [n, dm] f32 scratch at dim 512)
    norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))  # [n, 1]
    xn = x / jnp.maximum(norm, 1e-12) * math.sqrt(dim)
    xn = xn * gamma_ref[0].astype(jnp.float32) + beta_ref[0].astype(jnp.float32)
    xn = xn.astype(mm)

    q = jax.lax.dot_general(
        xn, wq_ref[0].astype(mm), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(mm)  # [n, dh]
    k = jax.lax.dot_general(
        xn, wk_ref[0].astype(mm), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(mm)
    v = jax.lax.dot_general(
        xn, wv_ref[0].astype(mm), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(mm)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [n, n] f32
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(mm), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) / l  # [n, dh] f32

    y = jax.lax.dot_general(
        o.astype(mm), wo_ref[0].astype(mm), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [n, dm]

    # residual seeds an f32 scratch; heads accumulate there and the output
    # is written ONCE on the last head — accumulating through a bf16
    # out_ref would round the running sum once per head, diverging from
    # the f32-accumulating XLA twin that supplies the gradients
    @pl.when(h == 0)
    def _seed():
        acc_scratch[:] = x

    acc_scratch[:] += y

    @pl.when(h == n_heads - 1)
    def _emit():
        out_ref[0] = acc_scratch[:].astype(out_ref.dtype)


def _fused_forward(x, gamma, beta, wq, wk, wv, wo, *, scale: float):
    b, n, dm = x.shape
    n_heads, _, dh = wq.shape

    return pl.pallas_call(
        functools.partial(_attn_block_kernel, scale=scale, dim=dm),
        grid=(b, n_heads),
        in_specs=[
            pl.BlockSpec((1, n, dm), lambda b_, h_: (b_, 0, 0)),
            # γ/β with a singleton sublane dim — (1, dm) blocks violate the
            # (8, 128) tiling rule; (1, 1, dm) satisfies it exactly
            pl.BlockSpec((1, 1, dm), lambda b_, h_: (b_, 0, 0)),
            pl.BlockSpec((1, 1, dm), lambda b_, h_: (b_, 0, 0)),
            pl.BlockSpec((1, dm, dh), lambda b_, h_: (h_, 0, 0)),
            pl.BlockSpec((1, dm, dh), lambda b_, h_: (h_, 0, 0)),
            pl.BlockSpec((1, dm, dh), lambda b_, h_: (h_, 0, 0)),
            pl.BlockSpec((1, dh, dm), lambda b_, h_: (h_, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, n, dm), lambda b_, h_: (b_, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, dm), x.dtype),
        scratch_shapes=[pltpu.VMEM((n, dm), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=96 * 2**20,
        ),
        interpret=jax.default_backend() != "tpu",
    )(x, gamma[:, None, :], beta[:, None, :], wq, wk, wv, wo)


def _cross_vmem_bytes(n: int, m: int, dm: int, dc: int, dh: int) -> int:
    """f32 footprint for the cross block: x/out (double-buffered) + ctx +
    [n, m] logits + q/k/v (lane-padded to 128, matching ``_vmem_bytes``) +
    per-head weight blocks."""
    dh_pad = max(dh, 128)
    return 4 * (
        4 * n * dm
        + m * dc
        + n * m
        + n * dh_pad + 2 * m * dh_pad
        + 2 * dm * dh_pad + 2 * dc * dh_pad
        + n
    )


def fits_fused_cross_attn_block(
    n: int, m: int, dm: int, dc: int, dh: int
) -> bool:
    """Shape gate for the fused cross-attention block (TPU sublane rule on
    both sequence dims + VMEM fit)."""
    return (
        n % 8 == 0
        and m % 8 == 0
        and _cross_vmem_bytes(n, m, dm, dc, dh) <= VMEM_BUDGET_BYTES
    )


def cross_attn_block_xla(x, ctx, gamma, beta, wq, wk, wv, wo, *, scale: float):
    """Pure-XLA twin of the fused cross-attention block (backward path +
    numerical reference). x: [b, n, dm]; ctx: [b, m, dc] (NOT normalized —
    the reference norms only the query side, naturalspeech2_pytorch.py:795);
    wq: [H, dm, dh]; wk/wv: [H, dc, dh]; wo: [H, dh, dm]."""
    dm = x.shape[-1]
    xf = x.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(xf * xf, axis=-1, keepdims=True))
    xn = xf / jnp.maximum(norm, 1e-12) * math.sqrt(dm)
    xn = xn * gamma[:, None, :].astype(jnp.float32) + beta[:, None, :].astype(
        jnp.float32
    )
    cf = ctx.astype(jnp.float32)

    q = jnp.einsum("bnd,hdk->bhnk", xn, wq.astype(jnp.float32))
    k = jnp.einsum("bmd,hdk->bhmk", cf, wk.astype(jnp.float32))
    v = jnp.einsum("bmd,hdk->bhmk", cf, wv.astype(jnp.float32))
    s = jnp.einsum("bhik,bhjk->bhij", q, k) * scale
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhij,bhjk->bhik", p, v)
    y = jnp.einsum("bhnk,hkd->bnd", o, wo.astype(jnp.float32))
    return (xf + y).astype(x.dtype)


def _cross_attn_block_kernel(
    x_ref, ctx_ref, gamma_ref, beta_ref, wq_ref, wk_ref, wv_ref, wo_ref,
    out_ref, acc_scratch, *, scale: float, dim: int,
):
    h = pl.program_id(1)
    n_heads = pl.num_programs(1)

    mm = jnp.bfloat16 if x_ref.dtype == jnp.bfloat16 else jnp.float32
    x = x_ref[0].astype(jnp.float32)  # [n, dm]

    norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    xn = x / jnp.maximum(norm, 1e-12) * math.sqrt(dim)
    xn = xn * gamma_ref[0].astype(jnp.float32) + beta_ref[0].astype(jnp.float32)
    xn = xn.astype(mm)
    ctx = ctx_ref[0].astype(mm)  # [m, dc] — query-side norm only

    q = jax.lax.dot_general(
        xn, wq_ref[0].astype(mm), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(mm)  # [n, dh]
    k = jax.lax.dot_general(
        ctx, wk_ref[0].astype(mm), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(mm)  # [m, dh]
    v = jax.lax.dot_general(
        ctx, wv_ref[0].astype(mm), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(mm)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [n, m] f32
    mx = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - mx)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(mm), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) / l  # [n, dh] f32

    y = jax.lax.dot_general(
        o.astype(mm), wo_ref[0].astype(mm), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [n, dm]

    # f32 scratch accumulation, one output write on the last head (see
    # _attn_block_kernel)
    @pl.when(h == 0)
    def _seed():
        acc_scratch[:] = x

    acc_scratch[:] += y

    @pl.when(h == n_heads - 1)
    def _emit():
        out_ref[0] = acc_scratch[:].astype(out_ref.dtype)


def _cross_fused_forward(x, ctx, gamma, beta, wq, wk, wv, wo, *, scale: float):
    b, n, dm = x.shape
    m, dc = ctx.shape[1:]
    n_heads, _, dh = wq.shape

    return pl.pallas_call(
        functools.partial(_cross_attn_block_kernel, scale=scale, dim=dm),
        grid=(b, n_heads),
        in_specs=[
            pl.BlockSpec((1, n, dm), lambda b_, h_: (b_, 0, 0)),
            pl.BlockSpec((1, m, dc), lambda b_, h_: (b_, 0, 0)),
            pl.BlockSpec((1, 1, dm), lambda b_, h_: (b_, 0, 0)),
            pl.BlockSpec((1, 1, dm), lambda b_, h_: (b_, 0, 0)),
            pl.BlockSpec((1, dm, dh), lambda b_, h_: (h_, 0, 0)),
            pl.BlockSpec((1, dc, dh), lambda b_, h_: (h_, 0, 0)),
            pl.BlockSpec((1, dc, dh), lambda b_, h_: (h_, 0, 0)),
            pl.BlockSpec((1, dh, dm), lambda b_, h_: (h_, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, n, dm), lambda b_, h_: (b_, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, dm), x.dtype),
        scratch_shapes=[pltpu.VMEM((n, dm), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=96 * 2**20,
        ),
        interpret=jax.default_backend() != "tpu",
    )(x, ctx, gamma[:, None, :], beta[:, None, :], wq, wk, wv, wo)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def _cross_fused(x, ctx, gamma, beta, wq, wk, wv, wo, scale):
    return _cross_fused_forward(x, ctx, gamma, beta, wq, wk, wv, wo,
                                scale=scale)


def _cross_fused_fwd(x, ctx, gamma, beta, wq, wk, wv, wo, scale):
    out = _cross_fused_forward(x, ctx, gamma, beta, wq, wk, wv, wo,
                               scale=scale)
    return out, (x, ctx, gamma, beta, wq, wk, wv, wo)


def _cross_fused_bwd(scale, residuals, g):
    # O(n·m) logits with tiny m — the XLA vjp is already cheap here
    _, vjp = jax.vjp(
        lambda *args: cross_attn_block_xla(*args, scale=scale), *residuals
    )
    return vjp(g)


_cross_fused.defvjp(_cross_fused_fwd, _cross_fused_bwd)


def fused_cross_attn_block(
    x: jax.Array,
    ctx: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    wq: jax.Array,
    wkv: jax.Array,
    wo: jax.Array,
    *,
    heads: int,
    dim_head: int,
    scale: float,
) -> jax.Array:
    """``x + W_o·attn(adaRMSNorm(x)·W_q, ctx·W_k, ctx·W_v)`` in one launch —
    the conditional denoiser's cross-attention to the (fixed-size, unmasked)
    resampled speech-prompt latents. Same layouts as `fused_attn_block`
    with wkv over the context dim. Caller gates on
    `fits_fused_cross_attn_block`."""
    dm = x.shape[-1]
    dc = ctx.shape[-1]
    wq_h = wq.reshape(dm, heads, dim_head).transpose(1, 0, 2)
    wk_flat, wv_flat = jnp.split(wkv, 2, axis=-1)
    wk_h = wk_flat.reshape(dc, heads, dim_head).transpose(1, 0, 2)
    wv_h = wv_flat.reshape(dc, heads, dim_head).transpose(1, 0, 2)
    wo_h = wo.reshape(heads, dim_head, dm)
    return _cross_fused(x, ctx, gamma, beta, wq_h, wk_h, wv_h, wo_h,
                        float(scale))


def _attn_core_flash(x, gamma, beta, wq, wk, wv, wo, *, scale: float):
    """Same math as `attn_block_xla`, but the attention core goes through
    the flash-attention custom-vjp: differentiating THIS function runs the
    blockwise Pallas dq/dkv backward (recomputing probabilities from the
    saved per-row logsumexp) instead of pulling an O(n²) softmax jacobian
    through XLA — the training-path backward for the fused block."""
    from naturalspeech2_tpu.ops.flash_attention import _flash

    dm = x.shape[-1]
    xf = x.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(xf * xf, axis=-1, keepdims=True))
    xn = xf / jnp.maximum(norm, 1e-12) * math.sqrt(dm)
    xn = xn * gamma[:, None, :].astype(jnp.float32) + beta[:, None, :].astype(
        jnp.float32
    )
    q = jnp.einsum("bnd,hdk->bhnk", xn, wq.astype(jnp.float32))
    k = jnp.einsum("bnd,hdk->bhnk", xn, wk.astype(jnp.float32))
    v = jnp.einsum("bnd,hdk->bhnk", xn, wv.astype(jnp.float32))
    o = _flash(q, k, v, None, None, False, float(scale), 0.0)
    y = jnp.einsum("bhnk,hkd->bnd", o, wo.astype(jnp.float32))
    return (xf + y).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _fused(x, gamma, beta, wq, wk, wv, wo, scale):
    return _fused_forward(x, gamma, beta, wq, wk, wv, wo, scale=scale)


def _fused_fwd(x, gamma, beta, wq, wk, wv, wo, scale):
    out = _fused_forward(x, gamma, beta, wq, wk, wv, wo, scale=scale)
    return out, (x, gamma, beta, wq, wk, wv, wo)


def _fused_bwd(scale, residuals, g):
    _, vjp = jax.vjp(
        lambda *args: _attn_core_flash(*args, scale=scale), *residuals
    )
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_attn_block(
    x: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    wq: jax.Array,
    wkv: jax.Array,
    wo: jax.Array,
    *,
    heads: int,
    dim_head: int,
    scale: float,
) -> jax.Array:
    """``x + W_o·attn(adaRMSNorm(x)·W_{q,k,v})`` in one kernel launch.

    x: [b, n, dm]; gamma/beta: [b, dm] (per-sample FiLM from the time cond);
    wq: [dm, H·dh]; wkv: [dm, 2·H·dh]; wo: [H·dh, dm] (the nn.Dense kernel
    layouts of the standard Attention module). Caller must check
    `fits_fused_attn_block` first.
    """
    dm = x.shape[-1]
    wq_h = wq.reshape(dm, heads, dim_head).transpose(1, 0, 2)
    wk_flat, wv_flat = jnp.split(wkv, 2, axis=-1)
    wk_h = wk_flat.reshape(dm, heads, dim_head).transpose(1, 0, 2)
    wv_h = wv_flat.reshape(dm, heads, dim_head).transpose(1, 0, 2)
    wo_h = wo.reshape(heads, dim_head, dm)
    return _fused(x, gamma, beta, wq_h, wk_h, wv_h, wo_h, float(scale))
