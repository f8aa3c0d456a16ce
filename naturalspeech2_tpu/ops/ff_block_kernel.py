"""Fused pre-norm feed-forward block as a single Pallas TPU kernel.

Companion to `ops.attn_block_kernel`: after fusing the attention block, the
GEGLU feed-forward is the next HBM-streaming chain in the denoiser layer —
norm → Dense(2·inner) → split/gelu-gate → CausalConv1d(3) → Dense(dim) →
residual writes/reads five [n, inner]-sized activations through HBM per
layer (reference modules: FeedForward
`/root/reference/naturalspeech2_pytorch/naturalspeech2_pytorch.py:1004-1025`,
adaptive norm :744-746).

One launch per batch element computes the whole block in VMEM:

    y = x + W₂·conv₃( gelu(n(x)·W_g + b_g) ∘ (n(x)·W_v + b_v) ) + b₂
    n(x) = x/max(‖x‖₂, 1e-12)·√d·γ + β

The causal k=3 conv runs as three shifted matmuls (x_{t-2}·K₀ + x_{t-1}·K₁
+ x_t·K₂ — MXU-native, same trick as `ops.wavenet_kernel`). The GEGLU
Dense is pre-split into value/gate halves outside the kernel so no
non-128-aligned lane slicing happens inside.

Scope: the denoiser ConditionableTransformer FF (causal conv variant,
tanh-approximate gelu, no dropout). Backward = custom_vjp against the XLA
twin.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# see attn_block_kernel: Mosaic's default scoped cap (16 MB) is not the
# hardware VMEM; the kernel requests a 96 MB cap and this budget gates
# routing (dim512's inner=1365 FF lands ~60 MB — measured to compile+run)
VMEM_BUDGET_BYTES = 80 * 2**20


def _pad128(x: int) -> int:
    return -(-x // 128) * 128


def _vmem_bytes(n: int, dm: int, inner: int) -> int:
    """f32 peak estimate with liveness: x/out (double-buffered) + xn + the
    widest simultaneous set of [n, inner] values (gated activation, two
    shifted copies, conv accumulator — val/gate are dead by then) +
    weights. Flagship (n1024 dm128 inner341) lands at ~11 MB; verified to
    compile and run on v5e."""
    ip = _pad128(inner)
    acts = 4 * n * dm + n * dm + 4 * n * ip
    weights = 2 * dm * ip + 3 * ip * ip + ip * dm
    return 4 * (acts + weights)


def fits_fused_ff_block(n: int, dm: int, inner: int) -> bool:
    return n % 8 == 0 and _vmem_bytes(n, dm, inner) <= VMEM_BUDGET_BYTES


def _shift_down(x: jax.Array, amount: int) -> jax.Array:
    """x[t] ← x[t-amount] along axis 0, zeros at the top (causal shift)."""
    n = x.shape[0]
    return jnp.pad(x, ((amount, 0), (0, 0)))[:n]


def ff_block_xla(
    x, gamma, beta, w_val, b_val, w_gate, b_gate, wc, bc, w2, b2,
    *, approximate: bool = True,
):
    """Pure-XLA twin. x: [b, n, dm]; gamma/beta: [b, dm];
    w_val/w_gate: [dm, inner]; wc: [3, inner, inner]; w2: [inner, dm]."""
    dm = x.shape[-1]
    xf = x.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(xf * xf, axis=-1, keepdims=True))
    xn = xf / jnp.maximum(norm, 1e-12) * math.sqrt(dm)
    xn = xn * gamma[:, None, :].astype(jnp.float32) + beta[:, None, :].astype(
        jnp.float32
    )

    val = xn @ w_val.astype(jnp.float32) + b_val.astype(jnp.float32)
    gate = xn @ w_gate.astype(jnp.float32) + b_gate.astype(jnp.float32)
    a = jax.nn.gelu(gate, approximate=approximate) * val

    wc = wc.astype(jnp.float32)
    c = (
        jnp.pad(a, ((0, 0), (2, 0), (0, 0)))[:, : a.shape[1]] @ wc[0]
        + jnp.pad(a, ((0, 0), (1, 0), (0, 0)))[:, : a.shape[1]] @ wc[1]
        + a @ wc[2]
        + bc.astype(jnp.float32)
    )
    y = c @ w2.astype(jnp.float32) + b2.astype(jnp.float32)
    return (xf + y).astype(x.dtype)


def _ff_block_kernel(
    x_ref, gamma_ref, beta_ref, w_val_ref, b_val_ref, w_gate_ref, b_gate_ref,
    wc0_ref, wc1_ref, wc2_ref, bc_ref, w2_ref, b2_ref, out_ref,
    *, dim: int, approximate: bool,
):
    # bf16 inputs → bf16 MXU inputs with f32 accumulation (2× v5e rate);
    # f32 inputs are bit-identical to the all-f32 kernel.
    mm = jnp.bfloat16 if x_ref.dtype == jnp.bfloat16 else jnp.float32
    x = x_ref[0].astype(jnp.float32)  # [n, dm]

    norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    xn = x / jnp.maximum(norm, 1e-12) * math.sqrt(dim)
    xn = xn * gamma_ref[0].astype(jnp.float32) + beta_ref[0].astype(jnp.float32)
    xn = xn.astype(mm)

    def dot(a, b):
        return jax.lax.dot_general(
            a.astype(mm), b.astype(mm), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    val = dot(xn, w_val_ref[:]) + b_val_ref[:].astype(jnp.float32)
    gate = dot(xn, w_gate_ref[:]) + b_gate_ref[:].astype(jnp.float32)
    # gelu/gate in f32, then one downcast shared by the three conv taps
    a = (jax.nn.gelu(gate, approximate=approximate) * val).astype(mm)

    c = (
        dot(_shift_down(a, 2), wc0_ref[:])
        + dot(_shift_down(a, 1), wc1_ref[:])
        + dot(a, wc2_ref[:])
        + bc_ref[:].astype(jnp.float32)
    )
    y = dot(c, w2_ref[:]) + b2_ref[:].astype(jnp.float32)
    out_ref[0] = (x + y).astype(out_ref.dtype)


def _fused_forward(
    x, gamma, beta, w_val, b_val, w_gate, b_gate, wc, bc, w2, b2,
    *, approximate: bool,
):
    b, n, dm = x.shape
    inner = w_val.shape[-1]

    def const2d(v):  # 1-D vectors → (1, k) rows (sublane-tiling rule)
        return v[None, :]

    return pl.pallas_call(
        functools.partial(_ff_block_kernel, dim=dm, approximate=approximate),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, dm), lambda b_: (b_, 0, 0)),
            pl.BlockSpec((1, 1, dm), lambda b_: (b_, 0, 0)),
            pl.BlockSpec((1, 1, dm), lambda b_: (b_, 0, 0)),
            pl.BlockSpec((dm, inner), lambda b_: (0, 0)),
            pl.BlockSpec((1, inner), lambda b_: (0, 0)),
            pl.BlockSpec((dm, inner), lambda b_: (0, 0)),
            pl.BlockSpec((1, inner), lambda b_: (0, 0)),
            pl.BlockSpec((inner, inner), lambda b_: (0, 0)),
            pl.BlockSpec((inner, inner), lambda b_: (0, 0)),
            pl.BlockSpec((inner, inner), lambda b_: (0, 0)),
            pl.BlockSpec((1, inner), lambda b_: (0, 0)),
            pl.BlockSpec((inner, dm), lambda b_: (0, 0)),
            pl.BlockSpec((1, dm), lambda b_: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, n, dm), lambda b_: (b_, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, dm), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=96 * 2**20,
        ),
        interpret=jax.default_backend() != "tpu",
    )(
        x, gamma[:, None, :], beta[:, None, :],
        w_val, const2d(b_val), w_gate, const2d(b_gate),
        wc[0], wc[1], wc[2], const2d(bc), w2, const2d(b2),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(11,))
def _fused(x, gamma, beta, w_val, b_val, w_gate, b_gate, wc, bc, w2, b2,
           approximate):
    return _fused_forward(
        x, gamma, beta, w_val, b_val, w_gate, b_gate, wc, bc, w2, b2,
        approximate=approximate,
    )


def _fused_fwd(x, gamma, beta, w_val, b_val, w_gate, b_gate, wc, bc, w2, b2,
               approximate):
    out = _fused_forward(
        x, gamma, beta, w_val, b_val, w_gate, b_gate, wc, bc, w2, b2,
        approximate=approximate,
    )
    return out, (x, gamma, beta, w_val, b_val, w_gate, b_gate, wc, bc, w2, b2)


def _fused_bwd(approximate, residuals, g):
    _, vjp = jax.vjp(
        lambda *args: ff_block_xla(*args, approximate=approximate), *residuals
    )
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_ff_block(
    x: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    w1: jax.Array,
    b1: jax.Array,
    wc: jax.Array,
    bc: jax.Array,
    w2: jax.Array,
    b2: jax.Array,
    *,
    approximate: bool = True,
) -> jax.Array:
    """``x + FF(adaRMSNorm(x))`` in one launch.

    w1/b1: the GEGLU Dense(2·inner) kernel/bias (value half first, gate
    half second — the FeedForward split order); wc/bc: CausalConv1d(3)
    kernel [3, inner, inner]/bias; w2/b2: the out Dense. Caller gates on
    `fits_fused_ff_block`.
    """
    inner = w1.shape[-1] // 2
    w_val, w_gate = w1[:, :inner], w1[:, inner:]
    b_val, b_gate = b1[:inner], b1[inner:]
    return _fused(
        x, gamma, beta, w_val, b_val, w_gate, b_gate, wc, bc, w2, b2,
        approximate,
    )
