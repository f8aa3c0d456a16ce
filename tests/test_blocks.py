import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from naturalspeech2_tpu.models.blocks import (
    CausalConv1d,
    ConvUnit,
    FeedForward,
    LearnedSinusoidalPosEmb,
    ResnetBlock,
    RMSNorm,
)
from naturalspeech2_tpu.models.transformer import (
    Attention,
    ConditionableTransformer,
    Transformer,
)
from naturalspeech2_tpu.models.wavenet import Wavenet


KEY = jax.random.PRNGKey(0)


def test_rmsnorm_basic():
    x = jax.random.normal(KEY, (2, 5, 16))
    m = RMSNorm(16)
    params = m.init(KEY, x)
    out = m.apply(params, x)
    # with gamma=1 init: each vector normalised to norm sqrt(dim)
    norms = jnp.linalg.norm(out, axis=-1)
    np.testing.assert_allclose(np.asarray(norms), np.sqrt(16.0), rtol=1e-5)


def test_rmsnorm_conditional_identity_at_init():
    x = jax.random.normal(KEY, (2, 5, 16))
    cond = jax.random.normal(jax.random.PRNGKey(1), (2, 8))
    m = RMSNorm(16, scale=False, dim_cond=8)
    params = m.init(KEY, x, cond)
    out = m.apply(params, x, cond)
    # zero kernel + (ones, zeros) bias → modulation is identity at init
    base = RMSNorm(16, scale=False)
    base_params = base.init(KEY, x)
    ref = base.apply(base_params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5)


def test_sinusoidal_pos_emb():
    t = jnp.array([0.1, 0.5])
    m = LearnedSinusoidalPosEmb(16)
    params = m.init(KEY, t)
    out = m.apply(params, t)
    assert out.shape == (2, 17)  # dim + 1 (raw t concatenated)
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(t))


def test_causal_conv_is_causal():
    x = jax.random.normal(KEY, (1, 20, 8))
    m = CausalConv1d(8, 3, dilation=2)
    params = m.init(KEY, x)
    out1 = m.apply(params, x)
    # perturb the future → past outputs unchanged
    x2 = x.at[:, 10:].set(99.0)
    out2 = m.apply(params, x2)
    np.testing.assert_allclose(
        np.asarray(out1[:, :10]), np.asarray(out2[:, :10]), atol=1e-5
    )
    assert out1.shape == x.shape


def test_resnet_block_shapes():
    x = jax.random.normal(KEY, (2, 12, 16))
    m = ResnetBlock(dim_out=32, kernel=3)
    params = m.init(KEY, x)
    assert m.apply(params, x).shape == (2, 12, 32)


def test_feedforward():
    x = jax.random.normal(KEY, (2, 6, 24))
    m = FeedForward(24, causal_conv=True)
    params = m.init(KEY, x)
    assert m.apply(params, x).shape == (2, 6, 24)


def test_attention_self_and_cross():
    x = jax.random.normal(KEY, (2, 10, 32))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 7, 48))
    m = Attention(dim=32, dim_context=48, heads=4, dim_head=8)
    params = m.init(KEY, x, ctx)
    out = m.apply(params, x, ctx)
    assert out.shape == (2, 10, 32)


def test_attention_include_queries_with_mask():
    x = jax.random.normal(KEY, (2, 5, 32))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 7, 32))
    mask = jnp.arange(7)[None, :] < jnp.array([4, 7])[:, None]
    m = Attention(dim=32, heads=4, dim_head=8, cross_attn_include_queries=True)
    params = m.init(KEY, x, ctx, mask)
    out = m.apply(params, x, ctx, mask)
    # masked context positions must not affect output
    ctx2 = ctx.at[0, 4:].set(55.0)
    out2 = m.apply(params, x, ctx2, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)


def test_transformer_mask_invariance():
    x = jax.random.normal(KEY, (2, 9, 32))
    mask = jnp.arange(9)[None, :] < jnp.array([6, 9])[:, None]
    m = Transformer(dim=32, depth=2, heads=4, dim_head=8)
    params = m.init(KEY, x, mask)
    out = m.apply(params, x, mask)
    assert out.shape == x.shape


def test_conditionable_transformer():
    x = jax.random.normal(KEY, (2, 9, 32))
    t = jax.random.normal(jax.random.PRNGKey(3), (2, 64))
    ctx = jax.random.normal(jax.random.PRNGKey(4), (2, 4, 32))
    m = ConditionableTransformer(
        dim=32, depth=2, heads=4, dim_head=8, dim_cond_mult=2,
        cross_attn=True, ff_causal_conv=True,
    )
    params = m.init(KEY, x, t, ctx)
    out = m.apply(params, x, t, ctx)
    assert out.shape == x.shape


def test_conditionable_transformer_bf16():
    """bf16 params+activations run end-to-end (the f32 time-FiLM must not
    promote the blocks — the causal conv is dtype-strict) and track f32."""
    x = jax.random.normal(KEY, (2, 9, 32))
    t = jax.random.normal(jax.random.PRNGKey(3), (2, 64))
    m = ConditionableTransformer(
        dim=32, depth=2, heads=4, dim_head=8, dim_cond_mult=2,
        ff_causal_conv=True,
    )
    params = m.init(KEY, x, t)
    ref = m.apply(params, x, t)

    params16 = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
        params,
    )
    out16 = m.apply(params16, x.astype(jnp.bfloat16), t.astype(jnp.bfloat16))
    assert out16.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out16, np.float32), np.asarray(ref), atol=1e-1
    )


@pytest.mark.slow
def test_wavenet_shapes_and_conditioning():
    x = jax.random.normal(KEY, (2, 16, 8))
    t = jax.random.normal(jax.random.PRNGKey(5), (2, 32))
    m = Wavenet(dim=8, stacks=2, layers=3, dim_cond_mult=4)
    params = m.init(KEY, x, t)
    out = m.apply(params, x, t)
    assert out.shape == x.shape
    # time conditioning actually matters
    out2 = m.apply(params, x, t + 1.0)
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_wavenet_causality():
    x = jax.random.normal(KEY, (1, 32, 8))
    t = jnp.zeros((1, 32))
    m = Wavenet(dim=8, stacks=2, layers=3, dim_cond_mult=4)
    params = m.init(KEY, x, t)
    out1 = m.apply(params, x, t)
    x2 = x.at[:, 20:].set(7.0)
    out2 = m.apply(params, x2, t)
    np.testing.assert_allclose(
        np.asarray(out1[:, :20]), np.asarray(out2[:, :20]), atol=1e-4
    )
