"""Sequence (context) parallelism for long-form attention.

The reference has no long-context strategy at all (SURVEY.md §5.7 — it
relies on codec compression + fused SDPA); this module is the TPU-native
extension for 60-second-plus generation:

- `sp_attend`: gather-based context-parallel attention under `shard_map` —
  queries stay sharded over the sequence axis of the mesh, keys/values are
  `all_gather`ed over ICI, each shard attends locally, and the output
  remains sequence-sharded. O(n/P) activation memory per chip. Works with
  key-padding masks and causal attention (global row offsets derived from
  the shard index).
- whole-model sequence sharding (convs included) is handled by GSPMD: jit
  the denoiser with its input constrained to ``P(None, 'data', None)`` and
  XLA inserts conv halo exchanges automatically (see
  tests/test_sequence_parallel.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from naturalspeech2_tpu.ops.attention import NEG_INF


def _use_flash(backend: str, causal: bool) -> bool:
    """Resolve the local-attention backend inside the shard_map body.

    'auto' → the Pallas flash kernel on TPU (the O(n)-memory path the
    long-form config exists for), XLA einsum elsewhere; 'flash' forces the
    kernel (interpret mode off-TPU — the CPU-mesh equivalence tests).
    Causal stays on XLA: the kernel's causal mask has no global-row-offset
    input, and the TTS denoiser's attention is bidirectional."""
    assert backend in ("auto", "flash", "xla"), backend
    if causal:
        return False
    if backend == "flash":
        return True
    return backend == "auto" and jax.default_backend() == "tpu"


def sp_attend(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    mesh: Mesh,
    axis: str = "data",
    mask: Optional[jax.Array] = None,
    causal: bool = False,
    scale: Optional[float] = None,
    backend: str = "auto",
) -> jax.Array:
    """Context-parallel attention. q/k/v: global ``[b, h, n, d]`` logically,
    sharded over ``axis`` on the sequence dim; mask: ``[b, n]``.
    Returns ``[b, h, n, d]`` sharded the same way."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    n = q.shape[2]
    p = mesh.shape[axis]
    assert n % p == 0, f"sequence {n} must divide over {axis}={p}"

    qkv_spec = P(None, None, axis, None)
    mask_spec = P(None, axis)

    has_mask = mask is not None
    flash = _use_flash(backend, causal)

    def local(q_l, k_l, v_l, mask_l):
        # gather keys/values (and mask) across the sequence shards
        k_full = jax.lax.all_gather(k_l, axis, axis=2, tiled=True)
        v_full = jax.lax.all_gather(v_l, axis, axis=2, tiled=True)
        mask_full = jax.lax.all_gather(mask_l, axis, axis=1, tiled=True)

        if flash:
            # local queries × gathered keys through the Pallas flash kernel
            # (rectangular n/P × n shape; differentiable — the kernel's
            # custom_vjp composes with shard_map)
            from naturalspeech2_tpu.ops.flash_attention import flash_attention

            return flash_attention(
                q_l, k_full, v_full,
                mask=mask_full if has_mask else None, scale=scale,
            )

        sim = jnp.einsum(
            "bhid,bhjd->bhij", q_l, k_full, preferred_element_type=jnp.float32
        ) * scale

        if has_mask:
            sim = jnp.where(mask_full[:, None, None, :], sim, NEG_INF)

        if causal:
            shard = jax.lax.axis_index(axis)
            n_local = q_l.shape[2]
            row = shard * n_local + jnp.arange(n_local)[:, None]
            col = jnp.arange(k_full.shape[2])[None, :]
            sim = jnp.where(row >= col, sim, NEG_INF)

        attn = jax.nn.softmax(sim, axis=-1).astype(v_full.dtype)
        return jnp.einsum("bhij,bhjd->bhid", attn, v_full)

    if not has_mask:
        mask = jnp.ones((q.shape[0], n), dtype=bool)  # trivially all-valid

    return shard_map(
        local, mesh=mesh,
        in_specs=(qkv_spec, qkv_spec, qkv_spec, mask_spec),
        out_specs=qkv_spec,
        # pallas_call emits ShapeDtypeStructs without varying-mesh-axis
        # annotations, so the vma checker cannot see through the kernel
        check_vma=not flash,
    )(q, k, v, mask)


def ulysses_attend(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    mesh: Mesh,
    axis: str = "data",
    mask: Optional[jax.Array] = None,
    causal: bool = False,
    scale: Optional[float] = None,
) -> jax.Array:
    """DeepSpeed-Ulysses-style sequence parallelism: an all-to-all trades
    the sequence sharding for HEAD sharding (each device holds the full
    sequence for h/P heads), attention runs fully local — no O(n) gather of
    keys/values like `sp_attend` — and a second all-to-all restores the
    sequence sharding. Communication is O(n·d·h/P) per device either way,
    but Ulysses keeps per-device attention memory at h/P of the full score
    matrix. Requires heads divisible by the axis size."""
    from naturalspeech2_tpu.ops.attention import attend_xla

    if scale is None:
        scale = q.shape[-1] ** -0.5
    b, h, n, d = q.shape
    p = mesh.shape[axis]
    assert h % p == 0, f"heads {h} must divide over {axis}={p}"
    assert n % p == 0, f"sequence {n} must divide over {axis}={p}"

    qkv_spec = P(None, None, axis, None)
    mask_spec = P(None, axis)
    has_mask = mask is not None
    if not has_mask:
        mask = jnp.ones((b, n), dtype=bool)

    def local(q_l, k_l, v_l, mask_l):
        # [b, h, n/P, d] → [b, h/P, n, d]: split heads, gather sequence
        def to_heads(t):
            return jax.lax.all_to_all(
                t, axis, split_axis=1, concat_axis=2, tiled=True
            )

        q_h, k_h, v_h = to_heads(q_l), to_heads(k_l), to_heads(v_l)
        mask_full = jax.lax.all_gather(mask_l, axis, axis=1, tiled=True)
        o = attend_xla(
            q_h, k_h, v_h, mask=mask_full if has_mask else None,
            causal=causal, scale=scale,
        )
        # [b, h/P, n, d] → [b, h, n/P, d]
        return jax.lax.all_to_all(
            o, axis, split_axis=2, concat_axis=1, tiled=True
        )

    return shard_map(
        local, mesh=mesh,
        in_specs=(qkv_spec, qkv_spec, qkv_spec, mask_spec),
        out_specs=qkv_spec,
    )(q, k, v, mask)


def ring_attend(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    mesh: Mesh,
    axis: str = "data",
    mask: Optional[jax.Array] = None,
    causal: bool = False,
    scale: Optional[float] = None,
    backend: str = "auto",
) -> jax.Array:
    """Ring attention (Liu et al. 2023): keys/values circulate around the
    device ring via `ppermute` while each shard's queries accumulate
    online-softmax statistics hop by hop.

    Unlike `sp_attend`, NOTHING is ever fully gathered: per-device memory
    is O(n/P) for activations AND communication buffers, which is what
    >100k-frame contexts need. Communication totals the same O(n·d) bytes
    but overlaps hop-by-hop with compute on the ICI ring.

    q/k/v: global ``[b, h, n, d]`` logically, sharded over ``axis`` on the
    sequence dim; mask: ``[b, n]`` key-padding mask. Returns ``[b, h, n,
    d]`` sequence-sharded. Supports causal masking via global positions.

    ``backend`` (see `_use_flash`): on TPU the per-hop chunk attention
    runs through the Pallas flash kernel, with hop results combined
    exactly via the kernel's returned logsumexp — the O(n/P)-VMEM path.
    The flash ring is forward-only (inference/sampling); take gradients
    with ``backend='xla'``.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    b, h, n, d = q.shape
    p = mesh.shape[axis]
    assert n % p == 0, f"sequence {n} must divide over {axis}={p}"
    n_local = n // p

    qkv_spec = P(None, None, axis, None)
    mask_spec = P(None, axis)
    has_mask = mask is not None
    if not has_mask:
        mask = jnp.ones((b, n), dtype=bool)

    perm = [(i, (i + 1) % p) for i in range(p)]
    flash = _use_flash(backend, causal)

    def local_flash(q_l, k_l, v_l, mask_l):
        from naturalspeech2_tpu.ops.flash_attention import (
            flash_attention_with_lse,
        )

        o0, lse0 = flash_attention_with_lse(
            q_l, k_l, v_l, mask=mask_l, scale=scale
        )

        def hop(carry, _):
            o, lse, k_cur, v_cur, mask_cur = carry
            k_cur = jax.lax.ppermute(k_cur, axis, perm)
            v_cur = jax.lax.ppermute(v_cur, axis, perm)
            mask_cur = jax.lax.ppermute(mask_cur, axis, perm)
            o_h, lse_h = flash_attention_with_lse(
                q_l, k_cur, v_cur, mask=mask_cur, scale=scale
            )
            # exact combine via per-chunk logsumexp (fully-masked chunks
            # arrive as lse == NEG_INF / o == 0 and vanish here)
            lse_new = jnp.logaddexp(lse, lse_h)
            o = (
                o * jnp.exp(lse - lse_new)[..., None]
                + o_h.astype(jnp.float32) * jnp.exp(lse_h - lse_new)[..., None]
            )
            return (o, lse_new, k_cur, v_cur, mask_cur), ()

        (o, _, _, _, _), _ = jax.lax.scan(
            hop, (o0.astype(jnp.float32), lse0, k_l, v_l, mask_l),
            None, length=p - 1,
        )
        return o.astype(q_l.dtype)

    def local(q_l, k_l, v_l, mask_l):
        shard = jax.lax.axis_index(axis)
        row = shard * n_local + jnp.arange(n_local)  # global query rows

        # pcast to=varying: the accumulators are per-shard values (they
        # will depend on axis_index through the hop), so mark them varying
        # over the mesh axis up front — otherwise the scan carry types
        # mismatch (was jax.lax.pvary, deprecated in jax 0.9)
        _vary = lambda x: jax.lax.pcast(x, axis, to="varying")
        m0 = _vary(jnp.full((b, h, n_local), NEG_INF, jnp.float32))
        l0 = _vary(jnp.zeros((b, h, n_local), jnp.float32))
        acc0 = _vary(jnp.zeros((b, h, n_local, d), jnp.float32))

        def accumulate(m, l, acc, k_cur, v_cur, mask_cur, hop_idx):
            # kv chunk currently held came from shard (shard - hop) mod P
            src = (shard - hop_idx) % p
            col = src * n_local + jnp.arange(n_local)  # global key cols

            s = jnp.einsum(
                "bhid,bhjd->bhij", q_l, k_cur,
                preferred_element_type=jnp.float32,
            ) * scale
            valid = jnp.broadcast_to(
                mask_cur[:, None, None, :], s.shape
            )
            if causal:
                valid = valid & (row[:, None] >= col[None, :])[None, None]
            s = jnp.where(valid, s, NEG_INF)

            m_new = jnp.maximum(m, s.max(axis=-1))
            # explicit zero for invalid entries (NEG_INF is finite — same
            # fully-masked-row guard as the flash kernel)
            p_ = jnp.where(valid, jnp.exp(s - m_new[..., None]), 0.0)
            corr = jnp.exp(m - m_new)
            l = l * corr + p_.sum(axis=-1)
            acc = acc * corr[..., None] + jnp.einsum(
                "bhij,bhjd->bhid", p_.astype(v_cur.dtype), v_cur,
                preferred_element_type=jnp.float32,
            )
            return m_new, l, acc

        # hop 0 consumes the local chunk BEFORE any rotation, so the ring
        # needs exactly p-1 ppermutes (rotating inside every hop would send
        # one extra discarded kv chunk per device)
        m, l, acc = accumulate(m0, l0, acc0, k_l, v_l, mask_l, 0)

        def hop(carry, hop_idx):
            m, l, acc, k_cur, v_cur, mask_cur = carry
            k_cur = jax.lax.ppermute(k_cur, axis, perm)
            v_cur = jax.lax.ppermute(v_cur, axis, perm)
            mask_cur = jax.lax.ppermute(mask_cur, axis, perm)
            m, l, acc = accumulate(m, l, acc, k_cur, v_cur, mask_cur, hop_idx)
            return (m, l, acc, k_cur, v_cur, mask_cur), ()

        (m, l, acc, _, _, _), _ = jax.lax.scan(
            hop, (m, l, acc, k_l, v_l, mask_l), jnp.arange(1, p)
        )
        safe_l = jnp.where(l == 0.0, 1.0, l)
        return (acc / safe_l[..., None]).astype(q_l.dtype)

    return shard_map(
        local_flash if flash else local, mesh=mesh,
        in_specs=(qkv_spec, qkv_spec, qkv_spec, mask_spec),
        out_specs=qkv_spec,
        check_vma=not flash,  # see sp_attend: pallas outputs carry no vma
    )(q, k, v, mask)
