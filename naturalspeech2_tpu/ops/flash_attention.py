"""Blockwise flash attention as a Pallas TPU kernel.

TPU-native equivalent of the reference's fused-SDPA path
(`/root/reference/naturalspeech2_pytorch/attend.py:102-108`): online-softmax
over key/value tiles held in VMEM, O(seq) memory instead of the O(seq²)
logits matrix, with key-padding and causal masking.

Layout: q/k/v are ``[b, h, n, d]``. The grid is
``(b, h, n_q_blocks, n_kv_blocks)`` — the innermost grid dimension iterates
sequentially on TPU, so the running max / normalizer / accumulator live in
VMEM scratch across kv-block steps (the canonical Mosaic flash pattern).

Backward: custom_vjp with fully-blockwise Pallas dq/dkv kernels (below,
`_flash_bwd_dq_kernel` / `_flash_bwd_dkv_kernel`): O(seq) memory like the
forward, recomputing the row-softmax from the saved logsumexp per tile and
regenerating the dropout mask in-kernel from the same threefry counters.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)

import numpy as np  # noqa: E402


def _threefry2x32(k0, k1, x0, x1):
    """Threefry-2x32-20 counter-based PRNG, elementwise on uint32 arrays.

    Implemented with plain vector integer ops (add/xor/rotate) so it runs
    identically inside a Pallas kernel on the TPU VPU and in interpret mode
    on CPU — `pltpu.prng_seed` has no interpret lowering, and a
    counter-based generator regenerates the same dropout mask in the
    backward kernels with zero extra memory (the reference's SDPA dropout,
    attend.py:102-108,148-149)."""
    ROT = (13, 15, 26, 6, 17, 29, 16, 24)
    k0 = jnp.asarray(k0, jnp.uint32)
    k1 = jnp.asarray(k1, jnp.uint32)
    x0 = jnp.asarray(x0, jnp.uint32)
    x1 = jnp.asarray(x1, jnp.uint32)

    def rotl(x, r):
        return jax.lax.shift_left(x, np.uint32(r)) | jax.lax.shift_right_logical(
            x, np.uint32(32 - r)
        )

    ks0, ks1 = k0, k1
    ks2 = k0 ^ k1 ^ np.uint32(0x1BD11BDA)
    x0 = x0 + ks0
    x1 = x1 + ks1
    subkeys = ((ks1, ks2), (ks2, ks0), (ks0, ks1), (ks1, ks2), (ks2, ks0))
    for block in range(5):
        rots = ROT[:4] if block % 2 == 0 else ROT[4:]
        for r in rots:
            x0 = x0 + x1
            x1 = rotl(x1, r) ^ x0
        a, b_ = subkeys[block]
        x0 = x0 + a
        x1 = x1 + b_ + np.uint32(block + 1)
    return x0, x1


def _dropout_keep_scaled(
    seed_ref, b_idx, h_idx, row0, col0, shape, rate: float, n_total: int
):
    """[bq, bkv] keep/(1-rate) multiplier from per-position threefry bits.

    Counter = global (row, col) position; key = (seed, b·H+h) — every
    element of every (batch, head) tile gets an independent stream that the
    backward kernels can regenerate exactly."""
    rows = jnp.uint32(row0) + jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    cols = jnp.uint32(col0) + jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    x0 = rows * jnp.uint32(n_total) + cols
    x1 = jnp.broadcast_to(
        jnp.uint32(b_idx) * jnp.uint32(65536) + jnp.uint32(h_idx), shape
    )
    k0 = seed_ref[0, 0].astype(jnp.uint32)
    k1 = seed_ref[0, 1].astype(jnp.uint32)
    bits, _ = _threefry2x32(k0, k1, x0, x1)
    thresh = np.uint32(min(int(rate * 4294967296.0), 4294967295))
    keep = (bits >= thresh).astype(jnp.float32)
    return keep * np.float32(1.0 / (1.0 - rate))

# Tuned on v5e at (b4, h8, n1024, d64): 1024² blocks run 2.3× faster than
# 256² (per-block overhead dominates at these head dims; the f32 logits tile
# 1024×1024×4 B = 4 MB still fits VMEM beside q/k/v/acc).
DEFAULT_BLOCK_Q = 1024
DEFAULT_BLOCK_KV = 1024


def _flash_kernel(
    q_ref, k_ref, v_ref, mask_ref, seed_ref, o_ref, lse_ref,  # blocks
    m_scratch, l_scratch, acc_scratch,  # VMEM carries across kv steps
    *, scale: float, causal: bool, block_q: int, block_kv: int,
    dropout_rate: float, n_kv_total: int,
):
    i = pl.program_id(2)
    j = pl.program_id(3)
    n_kv = pl.num_programs(3)

    @pl.when(j == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, NEG_INF)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    # causal: whole kv block strictly above the diagonal band → skip compute
    if causal:
        block_needed = (j * block_kv) <= (i * block_q + block_q - 1)
    else:
        block_needed = True

    @pl.when(block_needed)
    def _compute():
        # matmuls run at the input dtype (bf16 inputs → native MXU bf16 with
        # f32 accumulation); softmax statistics always in f32
        q = q_ref[0, 0]  # [bq, d]
        k = k_ref[0, 0]  # [bkv, d]
        v = v_ref[0, 0]  # [bkv, d]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [bq, bkv] f32

        mask = mask_ref[0]  # [1, bkv] int8 key-padding mask
        valid = jnp.broadcast_to(mask != 0, (block_q, block_kv))
        if causal:
            row = i * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 0
            )
            col = j * block_kv + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 1
            )
            valid = valid & (row >= col)
        s = jnp.where(valid, s, NEG_INF)

        m_prev = m_scratch[:]  # [bq, 128] replicated
        l_prev = l_scratch[:]
        m_cur = jnp.max(s, axis=-1, keepdims=True)  # [bq, 1]
        m_new = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))

        # explicit zero for masked entries: NEG_INF is finite, so for a
        # fully-masked row s == m_new and exp(s - m_new) would be 1 per key
        # (emitting mean-of-v); the where keeps l = 0 so _finalize zeros it
        p = jnp.where(valid, jnp.exp(s - m_new[:, :1]), 0.0)  # [bq, bkv]
        correction = jnp.exp(m_prev - m_new)  # [bq, 128]
        l_new = correction * l_prev + jnp.broadcast_to(
            jnp.sum(p, axis=-1, keepdims=True), l_prev.shape
        )

        m_scratch[:] = m_new
        l_scratch[:] = l_new

        # torch-SDPA dropout semantics: the softmax normalizer (l) uses the
        # undropped probabilities; only the values aggregation is dropped
        # and rescaled (attend.py:148-153 — softmax → dropout → @v)
        if dropout_rate > 0.0:
            keep = _dropout_keep_scaled(
                seed_ref, pl.program_id(0), pl.program_id(1),
                i * block_q, j * block_kv, (block_q, block_kv),
                dropout_rate, n_kv_total,
            )
            a = p * keep
        else:
            a = p

        pv = jax.lax.dot_general(
            a.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bq, d] f32
        acc_scratch[:] = acc_scratch[:] * correction[:, :1] + pv

    @pl.when(j == n_kv - 1)
    def _finalize():
        l = l_scratch[:, :1]
        # fully-masked rows (l == 0) → zeros, matching softmax-of-−inf ≈ uniform
        # degeneracy avoided; reference would emit uniform attn over −max logits,
        # but such rows are padding and never read.
        out = acc_scratch[:] / jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = out.astype(o_ref.dtype)
        # logsumexp per query row, saved for the blockwise backward
        lse_ref[0, 0] = m_scratch[:, :1] + jnp.log(jnp.where(l == 0.0, 1.0, l))


def _flash_oneshot_kernel(
    q_ref, k_ref, v_ref, mask_ref, seed_ref, o_ref, lse_ref,
    *, scale: float, causal: bool, block_q: int, n_kv: int,
    dropout_rate: float,
):
    """Single-kv-block fast path: when all keys fit one VMEM tile the
    online-softmax carries (m/l scratch, correction exps on [bq, 128]) are
    dead weight — one plain softmax pass is ~18% faster at the flagship
    shape (measured v5e, b4 h8 n1024 d64) and bit-identical."""
    i = pl.program_id(2)
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [bq, n_kv]

    mask = mask_ref[0]
    valid = jnp.broadcast_to(mask != 0, (block_q, n_kv))
    if causal:
        row = i * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, n_kv), 0
        )
        col = jax.lax.broadcasted_iota(jnp.int32, (block_q, n_kv), 1)
        valid = valid & (row >= col)
    s = jnp.where(valid, s, NEG_INF)

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.where(valid, jnp.exp(s - m), 0.0)
    l = jnp.sum(p, axis=-1, keepdims=True)
    safe_l = jnp.where(l == 0.0, 1.0, l)
    lse_ref[0, 0] = m + jnp.log(safe_l)

    if dropout_rate > 0.0:
        keep = _dropout_keep_scaled(
            seed_ref, pl.program_id(0), pl.program_id(1),
            i * block_q, 0, (block_q, n_kv), dropout_rate, n_kv,
        )
        p = p * keep

    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, 0] = (pv / safe_l).astype(o_ref.dtype)


def _flash_forward(
    q, k, v, mask, seed=None, *, causal: bool, scale: float,
    dropout_rate: float = 0.0,
    block_q: int = DEFAULT_BLOCK_Q, block_kv: int = DEFAULT_BLOCK_KV,
):
    b, h, n_q, d = q.shape
    n_kv = k.shape[2]

    block_q = min(block_q, max(128, 1 << (n_q - 1).bit_length()))
    block_kv = min(block_kv, max(128, 1 << (n_kv - 1).bit_length()))

    # pad sequence lengths to block multiples and the feature dim to the
    # 128-lane width: measured on v5e, 64-lane matmul tiles run far below
    # MXU peak while zero-padded 128-lane tiles are full-speed.
    n_q_pad = -n_q % block_q
    n_kv_pad = -n_kv % block_kv
    d_pad = -d % 128

    if mask is None:
        mask = jnp.ones((b, n_kv), dtype=bool)
    if n_kv_pad or n_q_pad or d_pad:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, n_q_pad), (0, d_pad)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, n_kv_pad), (0, d_pad)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, n_kv_pad), (0, d_pad)))
        mask = jnp.pad(mask, ((0, 0), (0, n_kv_pad)))

    bp, hp, n_qp, dp = q.shape
    n_kvp = k.shape[2]
    grid = (bp, hp, n_qp // block_q, n_kvp // block_kv)

    # mask as int8 with a singleton sublane dim — bool/1-sublane blocks don't
    # satisfy TPU (8, 128) tiling; (1, block_kv) with leading size-1 dim does.
    mask = mask.astype(jnp.int8)[:, None, :]
    if seed is None:
        seed = jnp.zeros((1, 2), jnp.uint32)

    if n_kvp <= block_kv:
        # all keys fit one tile → one-shot softmax kernel (no online carries)
        out, lse = pl.pallas_call(
            functools.partial(
                _flash_oneshot_kernel,
                scale=scale, causal=causal, block_q=block_q, n_kv=n_kvp,
                dropout_rate=dropout_rate,
            ),
            grid=(bp, hp, n_qp // block_q),
            in_specs=[
                pl.BlockSpec((1, 1, block_q, dp), lambda b_, h_, i: (b_, h_, i, 0)),
                pl.BlockSpec((1, 1, n_kvp, dp), lambda b_, h_, i: (b_, h_, 0, 0)),
                pl.BlockSpec((1, 1, n_kvp, dp), lambda b_, h_, i: (b_, h_, 0, 0)),
                pl.BlockSpec((1, 1, n_kvp), lambda b_, h_, i: (b_, 0, 0)),
                pl.BlockSpec((1, 2), lambda b_, h_, i: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, block_q, dp), lambda b_, h_, i: (b_, h_, i, 0)),
                pl.BlockSpec((1, 1, block_q, 1), lambda b_, h_, i: (b_, h_, i, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct(q.shape, q.dtype),
                jax.ShapeDtypeStruct((bp, hp, n_qp, 1), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel"),
            ),
            interpret=jax.default_backend() != "tpu",
        )(q, k, v, mask, seed)
        return out[:, :, :n_q, :d], lse

    out = pl.pallas_call(
        functools.partial(
            _flash_kernel,
            scale=scale, causal=causal, block_q=block_q, block_kv=block_kv,
            dropout_rate=dropout_rate, n_kv_total=n_kvp,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, block_q, dp), lambda b_, h_, i, j: (b_, h_, i, 0),
            ),
            pl.BlockSpec(
                (1, 1, block_kv, dp), lambda b_, h_, i, j: (b_, h_, j, 0),
            ),
            pl.BlockSpec(
                (1, 1, block_kv, dp), lambda b_, h_, i, j: (b_, h_, j, 0),
            ),
            pl.BlockSpec((1, 1, block_kv), lambda b_, h_, i, j: (b_, 0, j)),
            pl.BlockSpec((1, 2), lambda b_, h_, i, j: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, block_q, dp), lambda b_, h_, i, j: (b_, h_, i, 0),
            ),
            pl.BlockSpec(
                (1, 1, block_q, 1), lambda b_, h_, i, j: (b_, h_, i, 0),
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((bp, hp, n_qp, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, dp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=jax.default_backend() != "tpu",
    )(q, k, v, mask, seed)

    out, lse = out
    return out[:, :, :n_q, :d], lse  # lse stays padded [bp, hp, n_qp, 1]


# ---------------------------------------------------------------------- #
# blockwise backward: dq kernel (iterate kv per q block) and dkv kernel
# (iterate q per kv block); softmax probabilities recomputed from the saved
# per-row logsumexp. delta = Σ_d dO·O is precomputed in XLA.
# ---------------------------------------------------------------------- #


def _flash_bwd_dq_kernel(
    q_ref, k_ref, v_ref, mask_ref, seed_ref, lse_ref, delta_ref, do_ref,
    dq_ref, dq_scratch,
    *, scale: float, causal: bool, block_q: int, block_kv: int,
    dropout_rate: float, n_kv_total: int,
):
    i = pl.program_id(2)
    j = pl.program_id(3)
    n_kv = pl.num_programs(3)

    @pl.when(j == 0)
    def _init():
        dq_scratch[:] = jnp.zeros_like(dq_scratch)

    if causal:
        block_needed = (j * block_kv) <= (i * block_q + block_q - 1)
    else:
        block_needed = True

    @pl.when(block_needed)
    def _compute():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0].astype(jnp.float32)
        lse = lse_ref[0, 0]  # [bq, 1]
        delta = delta_ref[0, 0]  # [bq, 1]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        mask = mask_ref[0]
        valid = jnp.broadcast_to(mask != 0, (block_q, block_kv))
        if causal:
            row = i * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 0
            )
            col = j * block_kv + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 1
            )
            valid = valid & (row >= col)

        # zero masked entries (finite NEG_INF would give p=1 on fully-masked
        # rows where lse==NEG_INF, leaking ds/dv into masked keys)
        p = jnp.where(valid, jnp.exp(s - lse), 0.0)  # [bq, bkv]
        dp = jax.lax.dot_general(
            do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bq, bkv]
        # regenerate the forward's dropout mask: out = (p∘keep)@v, so
        # d s = p∘(keep∘(dO·vᵀ) − δ)·scale with δ = Σ_d dO·out unchanged
        if dropout_rate > 0.0:
            keep = _dropout_keep_scaled(
                seed_ref, pl.program_id(0), pl.program_id(1),
                i * block_q, j * block_kv, (block_q, block_kv),
                dropout_rate, n_kv_total,
            )
            dp = dp * keep
        ds = p * (dp - delta) * scale
        dq_scratch[:] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(j == n_kv - 1)
    def _finalize():
        dq_ref[0, 0] = dq_scratch[:].astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(
    q_ref, k_ref, v_ref, mask_ref, seed_ref, lse_ref, delta_ref, do_ref,
    dk_ref, dv_ref, dk_scratch, dv_scratch,
    *, scale: float, causal: bool, block_q: int, block_kv: int,
    dropout_rate: float, n_kv_total: int,
):
    j = pl.program_id(2)  # kv block
    i = pl.program_id(3)  # q block (innermost)
    n_q = pl.num_programs(3)

    @pl.when(i == 0)
    def _init():
        dk_scratch[:] = jnp.zeros_like(dk_scratch)
        dv_scratch[:] = jnp.zeros_like(dv_scratch)

    if causal:
        block_needed = (j * block_kv) <= (i * block_q + block_q - 1)
    else:
        block_needed = True

    @pl.when(block_needed)
    def _compute():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0].astype(jnp.float32)
        lse = lse_ref[0, 0]
        delta = delta_ref[0, 0]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        mask = mask_ref[0]
        valid = jnp.broadcast_to(mask != 0, (block_q, block_kv))
        if causal:
            row = i * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 0
            )
            col = j * block_kv + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 1
            )
            valid = valid & (row >= col)

        p = jnp.where(valid, jnp.exp(s - lse), 0.0)  # [bq, bkv]
        if dropout_rate > 0.0:
            keep = _dropout_keep_scaled(
                seed_ref, pl.program_id(0), pl.program_id(1),
                i * block_q, j * block_kv, (block_q, block_kv),
                dropout_rate, n_kv_total,
            )
            a = p * keep  # dropped+scaled probs: out = a@v ⇒ dv = aᵀ@dO
        else:
            keep = None
            a = p
        dv_scratch[:] += jax.lax.dot_general(
            a.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # aᵀ @ dO → [bkv, d]
        dp = jax.lax.dot_general(
            do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if keep is not None:
            dp = dp * keep
        ds = p * (dp - delta) * scale  # [bq, bkv]
        dk_scratch[:] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # dsᵀ @ q → [bkv, d]

    @pl.when(i == n_q - 1)
    def _finalize():
        dk_ref[0, 0] = dk_scratch[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scratch[:].astype(dv_ref.dtype)


def _flash_backward(
    q, k, v, mask, seed, lse, out, do, *, causal: bool, scale: float,
    dropout_rate: float = 0.0,
    block_q: int = DEFAULT_BLOCK_Q, block_kv: int = DEFAULT_BLOCK_KV,
):
    b, h, n_q, d = q.shape
    n_kv = k.shape[2]
    block_q = min(block_q, max(128, 1 << (n_q - 1).bit_length()))
    block_kv = min(block_kv, max(128, 1 << (n_kv - 1).bit_length()))
    n_q_pad = -n_q % block_q
    n_kv_pad = -n_kv % block_kv
    d_pad = -d % 128

    if mask is None:
        mask = jnp.ones((b, n_kv), dtype=bool)
    if n_q_pad or n_kv_pad or d_pad:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, n_q_pad), (0, d_pad)))
        do = jnp.pad(do, ((0, 0), (0, 0), (0, n_q_pad), (0, d_pad)))
        out = jnp.pad(out, ((0, 0), (0, 0), (0, n_q_pad), (0, d_pad)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, n_kv_pad), (0, d_pad)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, n_kv_pad), (0, d_pad)))
        mask = jnp.pad(mask, ((0, 0), (0, n_kv_pad)))
    # lse is already padded to n_qp from the forward

    bp, hp, n_qp, dp = q.shape
    n_kvp = k.shape[2]
    mask8 = mask.astype(jnp.int8)[:, None, :]
    if seed is None:
        seed = jnp.zeros((1, 2), jnp.uint32)
    delta = jnp.sum(
        do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1, keepdims=True
    )  # [b, h, n_qp, 1]

    kwargs = dict(
        scale=scale, causal=causal, block_q=block_q, block_kv=block_kv,
        dropout_rate=dropout_rate, n_kv_total=n_kvp,
    )
    q_spec = pl.BlockSpec((1, 1, block_q, dp), lambda b_, h_, i, j: (b_, h_, i, 0))
    kv_spec = pl.BlockSpec((1, 1, block_kv, dp), lambda b_, h_, i, j: (b_, h_, j, 0))
    mask_spec = pl.BlockSpec((1, 1, block_kv), lambda b_, h_, i, j: (b_, 0, j))
    seed_spec = pl.BlockSpec((1, 2), lambda b_, h_, i, j: (0, 0))
    row_spec = pl.BlockSpec((1, 1, block_q, 1), lambda b_, h_, i, j: (b_, h_, i, 0))

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, **kwargs),
        grid=(bp, hp, n_qp // block_q, n_kvp // block_kv),
        in_specs=[
            q_spec, kv_spec, kv_spec, mask_spec, seed_spec, row_spec,
            row_spec, q_spec,
        ],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, dp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=jax.default_backend() != "tpu",
    )(q, k, v, mask8, seed, lse, delta, do)

    # dkv grid: kv blocks outer, q blocks innermost (sequential accumulation)
    q_spec_t = pl.BlockSpec((1, 1, block_q, dp), lambda b_, h_, j, i: (b_, h_, i, 0))
    kv_spec_t = pl.BlockSpec((1, 1, block_kv, dp), lambda b_, h_, j, i: (b_, h_, j, 0))
    mask_spec_t = pl.BlockSpec((1, 1, block_kv), lambda b_, h_, j, i: (b_, 0, j))
    seed_spec_t = pl.BlockSpec((1, 2), lambda b_, h_, j, i: (0, 0))
    row_spec_t = pl.BlockSpec((1, 1, block_q, 1), lambda b_, h_, j, i: (b_, h_, i, 0))

    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, **kwargs),
        grid=(bp, hp, n_kvp // block_kv, n_qp // block_q),
        in_specs=[
            q_spec_t, kv_spec_t, kv_spec_t, mask_spec_t, seed_spec_t,
            row_spec_t, row_spec_t, q_spec_t,
        ],
        out_specs=[kv_spec_t, kv_spec_t],
        out_shape=[
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_kv, dp), jnp.float32),
            pltpu.VMEM((block_kv, dp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=jax.default_backend() != "tpu",
    )(q, k, v, mask8, seed, lse, delta, do)

    return (
        dq[:, :, :n_q, :d],
        dk[:, :, :n_kv, :d],
        dv[:, :, :n_kv, :d],
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _flash(q, k, v, mask, seed, causal, scale, dropout_rate):
    out, _ = _flash_forward(
        q, k, v, mask, seed, causal=causal, scale=scale,
        dropout_rate=dropout_rate,
    )
    return out


def _flash_fwd(q, k, v, mask, seed, causal, scale, dropout_rate):
    out, lse = _flash_forward(
        q, k, v, mask, seed, causal=causal, scale=scale,
        dropout_rate=dropout_rate,
    )
    return out, (q, k, v, mask, seed, lse, out)


def _flash_bwd(causal, scale, dropout_rate, residuals, g):
    q, k, v, mask, seed, lse, out = residuals
    dq, dk, dv = _flash_backward(
        q, k, v, mask, seed, lse, out, g, causal=causal, scale=scale,
        dropout_rate=dropout_rate,
    )
    return dq, dk, dv, None, None


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention_with_lse(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
):
    """Forward-only flash attention that also returns the per-row
    logsumexp ``[b, h, n_q]`` — the statistic needed to combine partial
    (per-kv-chunk) attention outputs, e.g. across ring-attention hops
    (`parallel/sp.ring_attend`): for chunk outputs ``o_i`` with logsumexps
    ``lse_i``, the exact full result is ``Σ o_i·exp(lse_i − lse)`` with
    ``lse = logaddexp_i(lse_i)``. Rows fully masked within a chunk return
    ``lse = NEG_INF`` and ``o = 0`` so they drop out of the combination.
    NOT differentiable (bypasses the custom_vjp wrapper) — inference
    compositions only."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    out, lse = _flash_forward(
        q, k, v, mask, None, causal=False, scale=float(scale)
    )
    return out, lse[:, :, : q.shape[2], 0]


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    mask: Optional[jax.Array] = None,
    causal: bool = False,
    scale: Optional[float] = None,
    dropout: float = 0.0,
    dropout_key: Optional[jax.Array] = None,
) -> jax.Array:
    """Flash attention over ``[b, h, n, d]`` with optional ``[b, n_kv]``
    key-padding mask, causal masking and in-kernel attention dropout
    (counter-based threefry regenerated in the backward — no O(n²) mask)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    seed = None
    if dropout > 0.0:
        assert dropout_key is not None, "dropout requires dropout_key"
        seed = jax.random.bits(dropout_key, (1, 2), jnp.uint32)
    return _flash(q, k, v, mask, seed, causal, float(scale), float(dropout))
