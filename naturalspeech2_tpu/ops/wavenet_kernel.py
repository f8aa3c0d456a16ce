"""Fused WaveNet body as a single Pallas TPU kernel.

The denoiser's WaveNet (4 stacks × 8 dilated causal conv blocks,
`/root/reference/naturalspeech2_pytorch/naturalspeech2_pytorch.py:597-725`)
lowers to ~33 small convs in XLA, each launch-overhead-bound on TPU
(~18 µs for ~4 µs of MXU work). This kernel runs the whole body in ONE
`pallas_call`: per (batch, stack) grid step the 8 per-dilation "lanes" live
in VMEM scratch, each block is computed as shifted-concat matmuls
(causal k=3 dilated conv ≡ [x_{t-2δ}‖x_{t-δ}‖x_t] @ W, an MXU-native
contraction), followed by FiLM, the tanh·σ gate, the 1×1 residual matmul,
and (last stack) the 1×1 skip matmul accumulated into the output.

Weights are the stacked form: conv_w [S, L, 3d, d], res_w [S, L, d, d],
skip_w [L, d, d], film [b, S, L, 2d] (time conditioning precomputed as one
einsum outside). Gradients: custom_vjp against the numerically-equivalent
XLA twin (`wavenet_body_xla`)."""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift_down(x: jax.Array, amount: int) -> jax.Array:
    """Causal shift along axis 0 (rows): x[t] ← x[t-amount], zeros at top."""
    if amount == 0:
        return x
    n = x.shape[0]
    return jnp.pad(x, ((amount, 0), (0, 0)))[:n]


def wavenet_body_xla(x, conv_w, conv_b, res_w, res_b, skip_w, skip_b, film):
    """Pure-XLA twin of the kernel (used for the backward pass and tests).

    x: [b, n, d]; conv_w: [S, L, 3d, d]; conv_b/res_b: [S, L, d];
    res_w: [S, L, d, d]; skip_w: [L, d, d]; skip_b: [L, d];
    film: [b, S, L, 2d]. Returns the summed skips [b, n, d].

    Stacks run under `lax.scan` (one stack's program traced once instead of
    S×), which keeps the compiled program small enough for the scaled
    configs' 100-step sampling scans; the L inner blocks stay unrolled
    because each has a static dilation 2^l. Skip convs apply to the LAST
    stack's lane outputs only (ref :685-686,:725), so they run after the
    scan. All operands run at ``x.dtype`` (mixed bf16/f32 operands would
    promote the scan carry to f32 and break the carry-type invariant;
    uniform bf16 is also the fast path for bf16 inference)."""
    b, n, d = x.shape
    S, L = conv_w.shape[:2]
    dt = x.dtype
    lanes0 = jnp.broadcast_to(x, (L, b, n, d))
    film_s = jnp.moveaxis(film, 1, 0).astype(dt)  # [S, b, L, 2d]

    def stack_step(lanes, ws):
        cw, cb, rw, rb, f = (w.astype(dt) for w in ws)
        new = []
        for l in range(L):
            xin = lanes[l]
            dil = 2**l
            x1 = jnp.pad(xin, ((0, 0), (dil, 0), (0, 0)))[:, :n]
            x2 = jnp.pad(xin, ((0, 0), (2 * dil, 0), (0, 0)))[:, :n]
            cat = jnp.concatenate([x2, x1, xin], axis=-1)  # [b, n, 3d]
            y = cat @ cw[l] + cb[l]
            y = y * f[:, l, :d][:, None] + f[:, l, d:][:, None]
            y = jnp.tanh(y) * jax.nn.sigmoid(y)
            new.append((y + (xin @ rw[l] + rb[l])).astype(dt))
        return jnp.stack(new), ()

    lanes, _ = jax.lax.scan(
        stack_step, lanes0, (conv_w, conv_b, res_w, res_b, film_s)
    )
    return sum(
        lanes[l] @ skip_w[l].astype(dt) + skip_b[l].astype(dt)
        for l in range(L)
    )


def _wavenet_kernel(
    x_ref, conv_w_ref, conv_b_ref, res_w_ref, res_b_ref,
    skip_w_ref, skip_b_ref, film_ref, out_ref,
    lanes_scratch, skip_scratch,
    *, num_stacks: int, num_layers: int, dim: int,
):
    s = pl.program_id(1)
    x = x_ref[0]  # [n, d]

    for l in range(num_layers):
        # stack 0 blocks all take the stack input; later stacks take their lane
        @pl.when(s == 0)
        def _seed(l=l):
            lanes_scratch[l] = x.astype(jnp.float32)

    @pl.when(s == 0)
    def _zero_skip():
        skip_scratch[:] = jnp.zeros_like(skip_scratch)

    for l in range(num_layers):
        xin = lanes_scratch[l]  # [n, d] f32
        dil = 2**l
        x1 = _shift_down(xin, dil)
        x2 = _shift_down(xin, 2 * dil)
        cat = jnp.concatenate([x2, x1, xin], axis=-1)  # [n, 3d]
        y = jax.lax.dot_general(
            cat, conv_w_ref[0, l], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + conv_b_ref[0, l]
        gamma = film_ref[0, 0, l, :dim]
        beta = film_ref[0, 0, l, dim:]
        y = y * gamma[None, :] + beta[None, :]
        y = jnp.tanh(y) * jax.nn.sigmoid(y)
        res = jax.lax.dot_general(
            xin, res_w_ref[0, l], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + res_b_ref[0, l]
        out = y + res
        lanes_scratch[l] = out

        @pl.when(s == num_stacks - 1)
        def _skip(out=out, l=l):
            skip_scratch[:] += jax.lax.dot_general(
                out, skip_w_ref[l], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + skip_b_ref[l]

    @pl.when(s == num_stacks - 1)
    def _emit():
        out_ref[0] = skip_scratch[:].astype(out_ref.dtype)


def _fused_forward(x, conv_w, conv_b, res_w, res_b, skip_w, skip_b, film):
    b, n, d = x.shape
    S, L = conv_w.shape[:2]

    return pl.pallas_call(
        functools.partial(
            _wavenet_kernel, num_stacks=S, num_layers=L, dim=d,
        ),
        grid=(b, S),
        in_specs=[
            pl.BlockSpec((1, n, d), lambda b_, s_: (b_, 0, 0)),
            pl.BlockSpec((1, L, 3 * d, d), lambda b_, s_: (s_, 0, 0, 0)),
            pl.BlockSpec((1, L, d), lambda b_, s_: (s_, 0, 0)),
            pl.BlockSpec((1, L, d, d), lambda b_, s_: (s_, 0, 0, 0)),
            pl.BlockSpec((1, L, d), lambda b_, s_: (s_, 0, 0)),
            pl.BlockSpec((L, d, d), lambda b_, s_: (0, 0, 0)),
            pl.BlockSpec((L, d), lambda b_, s_: (0, 0)),
            pl.BlockSpec((1, 1, L, 2 * d), lambda b_, s_: (b_, s_, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, n, d), lambda b_, s_: (b_, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((L, n, d), jnp.float32),
            pltpu.VMEM((n, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # Mosaic's default 16 MB scoped cap is not the hardware VMEM;
            # long-form n=4500 d=128 needs ~23 MB here and runs fine
            vmem_limit_bytes=96 * 2**20,
        ),
        interpret=jax.default_backend() != "tpu",
    )(x, conv_w, conv_b, res_w, res_b, skip_w, skip_b, film)


def _lane_kernel(
    x_ref, conv_w_ref, conv_b_ref, res_w_ref, res_b_ref,
    skip_w_ref, skip_b_ref, film_ref, out_ref,
    pad_scratch, skip_scratch,
    *, num_stacks: int, num_layers: int, dim: int, pad: int,
    bf16_matmul: bool = False,
):
    """One (batch, lane, stack) grid step: thread lane ``l`` through stack
    ``s``. The lane's sequence lives in ``pad_scratch`` rows [pad:], with a
    zero causal-history region above it, so the k=3 dilated conv is two
    shifted sublane slices plus the tile itself, concatenated into one
    [n, 3d] @ [3d, d] MXU matmul. The L dilation variants are unrolled as
    predicated ``pl.when(l == const)`` branches (one executes per step) —
    Mosaic has no unaligned *dynamic* sublane loads, but handles static
    unaligned slices and static bias/FiLM row indices fine."""
    l = pl.program_id(1)
    s = pl.program_id(2)
    n = out_ref.shape[1]

    @pl.when(s == 0)
    def _seed():
        pad_scratch[:pad] = jnp.zeros((pad, dim), jnp.float32)
        pad_scratch[pad:] = x_ref[0].astype(jnp.float32)

    @pl.when(jnp.logical_and(l == 0, s == 0))
    def _zero_skip():
        skip_scratch[:] = jnp.zeros_like(skip_scratch)

    for lc in range(num_layers):

        @pl.when(l == lc)
        def _step(lc=lc):
            dil = 2**lc
            xin = pad_scratch[pad:]
            x1 = pad_scratch[pad - dil : pad - dil + n]
            x2 = pad_scratch[pad - 2 * dil : pad - 2 * dil + n]

            # three tap matmuls rather than concat+one: Mosaic can't concat
            # sublane-offset slices on the lane dim at larger d ("offset
            # mismatch on non-concat dimension"), and the FLOPs are the same
            def dot(a, b):
                # bf16_matmul: bf16 MXU operands with f32 accumulation —
                # the same precision XLA's DEFAULT f32 matmul runs on TPU
                # (bf16 passes), which is what beat the true-f32 kernel 3×
                # at d=512; state/gates/statistics stay f32 either way
                if bf16_matmul:
                    a = a.astype(jnp.bfloat16)
                    b = b.astype(jnp.bfloat16)
                return jax.lax.dot_general(
                    a, b, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            y = (
                dot(x2, conv_w_ref[0, 0, :dim])
                + dot(x1, conv_w_ref[0, 0, dim : 2 * dim])
                + dot(xin, conv_w_ref[0, 0, 2 * dim :])
                + conv_b_ref[0, lc]
            )
            gamma = film_ref[0, 0, lc, :dim]
            beta = film_ref[0, 0, lc, dim:]
            y = y * gamma[None, :] + beta[None, :]
            y = jnp.tanh(y) * jax.nn.sigmoid(y)
            res = dot(xin, res_w_ref[0, 0]) + res_b_ref[0, lc]
            out = y + res
            pad_scratch[pad:] = out

            @pl.when(s == num_stacks - 1)
            def _skip():
                skip_scratch[:] += dot(out, skip_w_ref[0]) + skip_b_ref[lc]

    @pl.when(jnp.logical_and(l == num_layers - 1, s == num_stacks - 1))
    def _emit():
        out_ref[0] = skip_scratch[:].astype(out_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _fused_forward_per_lane(
    x, conv_w, conv_b, res_w, res_b, skip_w, skip_b, film,
    bf16_matmul: bool = False,
):
    """Per-lane fused forward: grid (b, L, S), one lane's state + one
    block's weights resident at a time — O(n·d + d²) VMEM instead of the
    whole-stack kernel's O(L·n·d + L·d²), so dim-512 and long-form (n=4500)
    configs keep a fused path instead of falling back to XLA.

    ``bf16_matmul`` runs the MXU contractions on bf16 operands with f32
    accumulation (XLA-default-precision equivalent) — the d=512 probe
    (examples/wavenet_d512_probe.py)."""
    b, n, d = x.shape
    S, L = conv_w.shape[:2]
    pad = _round_up(max(8, 2 * 2 ** (L - 1)), 8)

    return pl.pallas_call(
        functools.partial(
            _lane_kernel, num_stacks=S, num_layers=L, dim=d, pad=pad,
            bf16_matmul=bf16_matmul,
        ),
        grid=(b, L, S),
        in_specs=[
            pl.BlockSpec((1, n, d), lambda b_, l_, s_: (b_, 0, 0)),
            pl.BlockSpec((1, 1, 3 * d, d), lambda b_, l_, s_: (s_, l_, 0, 0)),
            pl.BlockSpec((1, L, d), lambda b_, l_, s_: (s_, 0, 0)),
            pl.BlockSpec((1, 1, d, d), lambda b_, l_, s_: (s_, l_, 0, 0)),
            pl.BlockSpec((1, L, d), lambda b_, l_, s_: (s_, 0, 0)),
            pl.BlockSpec((1, d, d), lambda b_, l_, s_: (l_, 0, 0)),
            pl.BlockSpec((L, d), lambda b_, l_, s_: (0, 0)),
            pl.BlockSpec((1, 1, L, 2 * d), lambda b_, l_, s_: (b_, s_, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, n, d), lambda b_, l_, s_: (b_, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((pad + n, d), jnp.float32),
            pltpu.VMEM((n, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            # Mosaic's default scoped-vmem cap is 16 MB; v5e has 128 MB of
            # VMEM, and the dim-512 configs legitimately need ~23 MB here.
            vmem_limit_bytes=96 * 2**20,
        ),
        interpret=jax.default_backend() != "tpu",
    )(x, conv_w, conv_b, res_w, res_b, skip_w, skip_b, film)


# Whole-stack kernel budget. Mosaic's default scoped-vmem cap (16 MB) is
# not the hardware VMEM — with the cap raised to 96 MB the long-form
# n=4500 d=128 whole-stack kernel (~23 MB) compiles and measures fastest
# (609 µs vs 622 per-lane vs 736 XLA, in-scan per-iter on v5e).
VMEM_SCRATCH_LIMIT_BYTES = 32 * 2**20

# Per-lane kernel: the fused fallback for small-d shapes beyond the
# whole-stack budget (very long sequences). At d > 256 XLA's scanned twin
# at default (bf16-pass) matmul precision beats any true-f32 kernel ~3×
# (measured at d=512), so big-d shapes route to the twin regardless.
LANE_VMEM_LIMIT_BYTES = 64 * 2**20
LANE_MAX_DIM = 256


def _kernel_vmem_bytes(n: int, d: int, L: int) -> int:
    """f32 scratch footprint: lanes [L, n, d] + skip [n, d] + per-stack
    weights (conv [L, 3d, d] + res [L, d, d] + skip_w [L, d, d])."""
    scratch = (L * n * d + n * d) * 4
    weights = L * (3 * d * d + d * d + d * d) * 4
    return scratch + weights


def _lane_vmem_bytes(n: int, d: int, L: int) -> int:
    """Per-lane kernel footprint: pad+lane and skip scratch (f32) plus
    double-buffered per-step blocks (x/out tiles and one block's conv/res/
    skip weights)."""
    pad = _round_up(max(8, 2 * 2 ** (L - 1)), 8)
    scratch = ((pad + n) * d + n * d) * 4
    blocks = 2 * (2 * n * d + (3 * d * d + d * d + d * d)) * 4
    return scratch + blocks


@jax.custom_vjp
def fused_wavenet_body(x, conv_w, conv_b, res_w, res_b, skip_w, skip_b, film):
    """Pallas-fused WaveNet body; see module docstring for shapes.

    Routing: the whole-stack kernel when every lane fits the (raised)
    VMEM budget at once — including the 60-s n=4500 long-form config;
    the per-lane kernel (grid over lanes, O(n·d + d²) resident) for
    small-d shapes beyond that (very long sequences); the XLA twin for
    big-d shapes (dim 512) where its scanned bf16-pass matmuls beat a
    true-f32 kernel (see LANE_MAX_DIM)."""
    return _forward_dispatch(
        x, conv_w, conv_b, res_w, res_b, skip_w, skip_b, film
    )


def _forward_dispatch(x, conv_w, conv_b, res_w, res_b, skip_w, skip_b, film):
    b, n, d = x.shape
    L = conv_w.shape[1]
    args = (x, conv_w, conv_b, res_w, res_b, skip_w, skip_b, film)
    if _kernel_vmem_bytes(n, d, L) <= VMEM_SCRATCH_LIMIT_BYTES:
        return _fused_forward(*args)
    if d <= LANE_MAX_DIM and _lane_vmem_bytes(n, d, L) <= LANE_VMEM_LIMIT_BYTES:
        return _fused_forward_per_lane(*args)
    return wavenet_body_xla(*args)


def _fwd(*args):
    return _forward_dispatch(*args), args


def _bwd(residuals, g):
    # The fused forward kernels accumulate in f32, so the backward's
    # recomputed chain must too — `wavenet_body_xla` runs at x.dtype, and
    # replaying it in bf16 would differentiate a lower-precision forward
    # than the one actually executed. Upcast primals (uniform f32 carry
    # keeps the scan-carry-type invariant), then cast each cotangent back
    # to its primal's dtype.
    res32 = tuple(r.astype(jnp.float32) for r in residuals)
    _, vjp = jax.vjp(wavenet_body_xla, *res32)
    grads = vjp(g.astype(jnp.float32))
    return tuple(
        gr.astype(r.dtype) for gr, r in zip(grads, residuals)
    )


fused_wavenet_body.defvjp(_fwd, _bwd)
