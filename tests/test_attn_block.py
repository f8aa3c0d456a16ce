"""Fused pre-norm self-attention block kernel vs its XLA twin and vs the
unfused module path (`ops/attn_block_kernel.py`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from naturalspeech2_tpu.ops.attn_block_kernel import (
    attn_block_xla,
    fits_fused_attn_block,
    fused_attn_block,
)

B, N, DM, H, DH = 2, 64, 32, 4, 16


def _inputs(key=0):
    ks = jax.random.split(jax.random.PRNGKey(key), 6)
    x = jax.random.normal(ks[0], (B, N, DM))
    gamma = 1.0 + 0.1 * jax.random.normal(ks[1], (B, DM))
    beta = 0.1 * jax.random.normal(ks[2], (B, DM))
    wq = jax.random.normal(ks[3], (DM, H * DH)) / np.sqrt(DM)
    wkv = jax.random.normal(ks[4], (DM, 2 * H * DH)) / np.sqrt(DM)
    wo = jax.random.normal(ks[5], (H * DH, DM)) / np.sqrt(H * DH)
    return x, gamma, beta, wq, wkv, wo


def _twin(x, gamma, beta, wq, wkv, wo):
    wq_h = wq.reshape(DM, H, DH).transpose(1, 0, 2)
    wk, wv = jnp.split(wkv, 2, axis=-1)
    wk_h = wk.reshape(DM, H, DH).transpose(1, 0, 2)
    wv_h = wv.reshape(DM, H, DH).transpose(1, 0, 2)
    wo_h = wo.reshape(H, DH, DM)
    return attn_block_xla(
        x, gamma, beta, wq_h, wk_h, wv_h, wo_h, scale=DH**-0.5
    )


def test_kernel_matches_xla_twin():
    args = _inputs()
    out = fused_attn_block(*args, heads=H, dim_head=DH, scale=DH**-0.5)
    ref = _twin(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_kernel_bf16_tracks_f32_twin():
    """bf16 inputs run the matmuls at bf16 (full-rate MXU path) with f32
    accumulation/statistics — output must track the f32 twin to bf16
    precision."""
    args = _inputs()
    args16 = tuple(a.astype(jnp.bfloat16) for a in args)
    out = fused_attn_block(*args16, heads=H, dim_head=DH, scale=DH**-0.5)
    assert out.dtype == jnp.bfloat16
    ref = _twin(*args)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), atol=5e-2
    )


def test_twin_matches_unfused_module_math():
    """The XLA twin reproduces adaRMSNorm → Attention → +residual exactly
    as the ConditionableTransformer layer computes it."""
    import math

    x, gamma, beta, wq, wkv, wo = _inputs(1)

    norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
    xn = x / jnp.maximum(norm, 1e-12) * math.sqrt(DM)
    xn = xn * gamma[:, None, :] + beta[:, None, :]
    q = (xn @ wq).reshape(B, N, H, DH).transpose(0, 2, 1, 3)
    k, v = jnp.split(xn @ wkv, 2, axis=-1)
    k = k.reshape(B, N, H, DH).transpose(0, 2, 1, 3)
    v = v.reshape(B, N, H, DH).transpose(0, 2, 1, 3)
    s = jnp.einsum("bhik,bhjk->bhij", q, k) * DH**-0.5
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhij,bhjk->bhik", p, v)
    o = o.transpose(0, 2, 1, 3).reshape(B, N, H * DH)
    expected = x + o @ wo

    got = _twin(x, gamma, beta, wq, wkv, wo)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-5)


@pytest.mark.slow
def test_gradients_flow_through_custom_vjp():
    args = _inputs(2)

    def loss_fused(*a):
        return jnp.sum(
            fused_attn_block(*a, heads=H, dim_head=DH, scale=DH**-0.5) ** 2
        )

    def loss_twin(*a):
        return jnp.sum(_twin(*a) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4, 5))(*args)
    g_twin = jax.grad(loss_twin, argnums=(0, 1, 2, 3, 4, 5))(*args)
    for gf, gt in zip(g_fused, g_twin):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gt), atol=1e-4, rtol=1e-4
        )


def test_fits_gate():
    assert fits_fused_attn_block(1024, 128, 64)   # flagship
    assert not fits_fused_attn_block(4500, 128, 64)  # long-form (n%8, size)
    assert not fits_fused_attn_block(4504, 128, 64)  # logits tile too large


M, DC = 8, 24  # cross-attention context: prompt latents [B, M, DC]


def _cross_inputs(key=0):
    ks = jax.random.split(jax.random.PRNGKey(key), 7)
    x = jax.random.normal(ks[0], (B, N, DM))
    ctx = jax.random.normal(ks[6], (B, M, DC))
    gamma = 1.0 + 0.1 * jax.random.normal(ks[1], (B, DM))
    beta = 0.1 * jax.random.normal(ks[2], (B, DM))
    wq = jax.random.normal(ks[3], (DM, H * DH)) / np.sqrt(DM)
    wkv = jax.random.normal(ks[4], (DC, 2 * H * DH)) / np.sqrt(DC)
    wo = jax.random.normal(ks[5], (H * DH, DM)) / np.sqrt(H * DH)
    return x, ctx, gamma, beta, wq, wkv, wo


def _cross_twin(x, ctx, gamma, beta, wq, wkv, wo):
    from naturalspeech2_tpu.ops.attn_block_kernel import cross_attn_block_xla

    wq_h = wq.reshape(DM, H, DH).transpose(1, 0, 2)
    wk, wv = jnp.split(wkv, 2, axis=-1)
    wk_h = wk.reshape(DC, H, DH).transpose(1, 0, 2)
    wv_h = wv.reshape(DC, H, DH).transpose(1, 0, 2)
    wo_h = wo.reshape(H, DH, DM)
    return cross_attn_block_xla(
        x, ctx, gamma, beta, wq_h, wk_h, wv_h, wo_h, scale=DH**-0.5
    )


def test_cross_kernel_matches_xla_twin():
    from naturalspeech2_tpu.ops.attn_block_kernel import fused_cross_attn_block

    args = _cross_inputs()
    out = fused_cross_attn_block(*args, heads=H, dim_head=DH, scale=DH**-0.5)
    ref = _cross_twin(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_cross_kernel_bf16_tracks_f32_twin():
    from naturalspeech2_tpu.ops.attn_block_kernel import fused_cross_attn_block

    args = _cross_inputs()
    args16 = tuple(a.astype(jnp.bfloat16) for a in args)
    out = fused_cross_attn_block(*args16, heads=H, dim_head=DH, scale=DH**-0.5)
    assert out.dtype == jnp.bfloat16
    ref = _cross_twin(*args)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), atol=5e-2
    )


def test_cross_gradients_flow_through_custom_vjp():
    from naturalspeech2_tpu.ops.attn_block_kernel import fused_cross_attn_block

    args = _cross_inputs(2)

    def loss_fused(*a):
        return jnp.sum(
            fused_cross_attn_block(*a, heads=H, dim_head=DH,
                                   scale=DH**-0.5) ** 2
        )

    def loss_twin(*a):
        return jnp.sum(_cross_twin(*a) ** 2)

    idx = (0, 1, 2, 3, 4, 5, 6)
    g_fused = jax.grad(loss_fused, argnums=idx)(*args)
    g_twin = jax.grad(loss_twin, argnums=idx)(*args)
    for gf, gt in zip(g_fused, g_twin):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gt), atol=1e-4, rtol=1e-4
        )


def test_conditional_layer_routes_to_fused_cross_block(monkeypatch):
    """The conditional CT layer must actually take the fused cross-attention
    path (not silently fall back) for the unmasked fixed-size prompt
    context."""
    import naturalspeech2_tpu.ops.attn_block_kernel as ab
    from naturalspeech2_tpu.models.transformer import ConditionableTransformer

    calls = {"cross": 0}
    orig = ab.fused_cross_attn_block

    def spy(*a, **k):
        calls["cross"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(ab, "fused_cross_attn_block", spy)

    x = jax.random.normal(jax.random.PRNGKey(0), (B, N, DM))
    t = jax.random.normal(jax.random.PRNGKey(1), (B, DM * 2))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (B, M, DM))
    ct = ConditionableTransformer(
        dim=DM, depth=2, dim_head=DH, heads=H, ff_causal_conv=True,
        dim_cond_mult=2, cross_attn=True, use_flash=True,
    )
    params = ct.init(jax.random.PRNGKey(42), x, t, ctx)
    calls["cross"] = 0  # init also runs a forward
    ct.apply(params, x, t, ctx)
    assert calls["cross"] == 2, calls  # one per layer


@pytest.mark.slow
@pytest.mark.parametrize("scan_layers", [False, True])
def test_conditionable_transformer_cross_unchanged_by_fused_path(scan_layers):
    """CT with cross-attention: use_flash=True (fused self + cross blocks)
    matches use_flash=False (pure XLA)."""
    from naturalspeech2_tpu.models.transformer import ConditionableTransformer

    x = jax.random.normal(jax.random.PRNGKey(0), (B, N, DM))
    t = jax.random.normal(jax.random.PRNGKey(1), (B, DM * 2))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (B, M, DM))
    outs = {}
    for use_flash in (False, True):
        ct = ConditionableTransformer(
            dim=DM, depth=2, dim_head=DH, heads=H, ff_causal_conv=True,
            dim_cond_mult=2, cross_attn=True, use_flash=use_flash,
            scan_layers=scan_layers,
        )
        params = ct.init(jax.random.PRNGKey(42), x, t, ctx)
        outs[use_flash] = ct.apply(params, x, t, ctx)
    np.testing.assert_allclose(
        np.asarray(outs[True]), np.asarray(outs[False]), atol=3e-5
    )


@pytest.mark.slow
@pytest.mark.parametrize("scan_layers", [False, True])
def test_conditionable_transformer_unchanged_by_fused_path(scan_layers):
    """CT forward with use_flash=True (fused block on the self-attn) matches
    use_flash=False (pure XLA) — the fused kernel is a drop-in."""
    from naturalspeech2_tpu.models.transformer import ConditionableTransformer

    x = jax.random.normal(jax.random.PRNGKey(0), (B, N, DM))
    t = jax.random.normal(jax.random.PRNGKey(1), (B, DM * 2))
    outs = {}
    for use_flash in (False, True):
        ct = ConditionableTransformer(
            dim=DM, depth=2, dim_head=DH, heads=H, ff_causal_conv=True,
            dim_cond_mult=2, use_flash=use_flash, scan_layers=scan_layers,
        )
        params = ct.init(jax.random.PRNGKey(42), x, t)
        outs[use_flash] = ct.apply(params, x, t)
    np.testing.assert_allclose(
        np.asarray(outs[True]), np.asarray(outs[False]), atol=3e-5
    )
