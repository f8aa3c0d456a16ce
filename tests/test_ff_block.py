"""Fused pre-norm feed-forward block kernel vs its XLA twin and the
unfused FeedForward module (`ops/ff_block_kernel.py`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from naturalspeech2_tpu.ops.ff_block_kernel import (
    ff_block_xla,
    fits_fused_ff_block,
    fused_ff_block,
)

B, N, DM = 2, 64, 32
INNER = int(DM * 4 * 2 / 3)  # 85 — deliberately non-128-aligned


def _inputs(key=0):
    ks = jax.random.split(jax.random.PRNGKey(key), 8)
    x = jax.random.normal(ks[0], (B, N, DM))
    gamma = 1.0 + 0.1 * jax.random.normal(ks[1], (B, DM))
    beta = 0.1 * jax.random.normal(ks[2], (B, DM))
    w1 = jax.random.normal(ks[3], (DM, 2 * INNER)) / np.sqrt(DM)
    b1 = 0.1 * jax.random.normal(ks[4], (2 * INNER,))
    wc = jax.random.normal(ks[5], (3, INNER, INNER)) / np.sqrt(3 * INNER)
    bc = 0.1 * jax.random.normal(ks[6], (INNER,))
    w2 = jax.random.normal(ks[7], (INNER, DM)) / np.sqrt(INNER)
    b2 = jnp.zeros((DM,))
    return x, gamma, beta, w1, b1, wc, bc, w2, b2


def _twin(x, gamma, beta, w1, b1, wc, bc, w2, b2):
    w_val, w_gate = w1[:, :INNER], w1[:, INNER:]
    b_val, b_gate = b1[:INNER], b1[INNER:]
    return ff_block_xla(
        x, gamma, beta, w_val, b_val, w_gate, b_gate, wc, bc, w2, b2,
        approximate=True,
    )


def test_kernel_matches_xla_twin():
    args = _inputs()
    out = fused_ff_block(*args, approximate=True)
    ref = _twin(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_kernel_bf16_tracks_f32_twin():
    """bf16 inputs use bf16 MXU inputs with f32 accumulation — output
    tracks the f32 twin to bf16 precision."""
    args = _inputs()
    args16 = tuple(a.astype(jnp.bfloat16) for a in args)
    out = fused_ff_block(*args16, approximate=True)
    assert out.dtype == jnp.bfloat16
    ref = _twin(*args)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), atol=5e-2
    )


def test_twin_matches_unfused_module_math():
    """The XLA twin reproduces adaRMSNorm → GEGLU → causal conv → Dense →
    +residual exactly as the FeedForward module computes it."""
    from naturalspeech2_tpu.models.blocks import FeedForward

    x, gamma, beta, w1, b1, wc, bc, w2, b2 = _inputs(1)
    ff = FeedForward(DM, mult=4, causal_conv=True, gelu_approximate=True)
    params = {
        "params": {
            "Dense_0": {"kernel": w1, "bias": b1},
            "CausalConv1d_0": {"Conv_0": {"kernel": wc, "bias": bc}},
            "Dense_1": {"kernel": w2, "bias": b2},
        }
    }
    expected = ff.apply(params, x, pre_norm=(gamma, beta), residual=True)
    got = _twin(x, gamma, beta, w1, b1, wc, bc, w2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-5)


def test_module_param_tree_unchanged():
    """The _DenseParams/_CausalConvParams stand-ins reproduce the exact
    param paths, shapes and init values of the old nn.Dense/CausalConv1d
    construction (checkpoint compatibility)."""
    from naturalspeech2_tpu.models.blocks import FeedForward

    ff = FeedForward(DM, mult=4, causal_conv=True)
    x = jnp.zeros((B, N, DM))
    params = ff.init(jax.random.PRNGKey(7), x)["params"]
    assert set(params) == {"Dense_0", "CausalConv1d_0", "Dense_1"}
    assert params["Dense_0"]["kernel"].shape == (DM, 2 * INNER)
    assert params["Dense_0"]["bias"].shape == (2 * INNER,)
    assert params["CausalConv1d_0"]["Conv_0"]["kernel"].shape == (3, INNER, INNER)
    assert params["Dense_1"]["kernel"].shape == (INNER, DM)


@pytest.mark.slow
def test_gradients_flow_through_custom_vjp():
    args = _inputs(2)

    def loss_fused(*a):
        return jnp.sum(fused_ff_block(*a, approximate=True) ** 2)

    def loss_twin(*a):
        return jnp.sum(_twin(*a) ** 2)

    g_fused = jax.grad(loss_fused, argnums=tuple(range(9)))(*args)
    g_twin = jax.grad(loss_twin, argnums=tuple(range(9)))(*args)
    for gf, gt in zip(g_fused, g_twin):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gt), atol=1e-4, rtol=1e-4
        )


def test_fits_gate():
    assert fits_fused_ff_block(1024, 128, 341)       # flagship
    assert fits_fused_ff_block(1024, 512, 1365)      # scaled config 4 (~66 MB,
    #                          within the raised v5e scoped-vmem budget)
    assert not fits_fused_ff_block(1023, 128, 341)   # n % 8
    assert not fits_fused_ff_block(4504, 512, 5461)  # far beyond VMEM
