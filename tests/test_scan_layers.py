"""scan-over-layers ConditionableTransformer == unrolled loop.

The scaled config (dim512/depth12, BASELINE config 4) needs its 100-step
sampling program to stay small enough for the compile service; layers run
under one `nn.scan` with stacked params. These tests map the unrolled
per-layer params onto the stacked layout and assert identical outputs,
plus gradient flow under remat.
"""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from naturalspeech2_tpu.models.transformer import ConditionableTransformer

DIM, DEPTH, HEADS, DIM_HEAD = 32, 3, 2, 16


def _stack_loop_params(loop_params, depth, cross_attn, cond):
    """Map the unrolled tree (attn_0, attn_1, …) onto the scan tree
    (layers/attn/… with a leading depth axis)."""
    shared = {
        k: v
        for k, v in loop_params.items()
        if k in ("ada_norm_w", "ada_norm_b", "pred_norm", "to_pred")
    }
    names = ["attn", "ff"] + (["cross_attn"] if cross_attn else [])
    if not cond:
        names += ["attn_norm", "ff_norm"] + (
            ["cross_attn_norm"] if cross_attn else []
        )
    layers = {}
    for name in names:
        per_layer = [loop_params[f"{name}_{i}"] for i in range(depth)]
        layers[name] = jax.tree_util.tree_map(
            lambda *leaves: jnp.stack(leaves), *per_layer
        )
    return dict(shared, layers=layers)


def _pair(cond=True, cross_attn=True):
    kwargs = dict(
        dim=DIM, depth=DEPTH, dim_head=DIM_HEAD, heads=HEADS,
        ff_causal_conv=True,
        dim_cond_mult=4 if cond else None, cross_attn=cross_attn,
    )
    loop = ConditionableTransformer(**kwargs)
    scan = ConditionableTransformer(**kwargs, scan_layers=True)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 24, DIM))
    t = jax.random.normal(jax.random.fold_in(key, 1), (2, DIM * 4)) if cond else None
    ctx = (
        jax.random.normal(jax.random.fold_in(key, 2), (2, 5, DIM))
        if cross_attn
        else None
    )
    variables = loop.init(jax.random.fold_in(key, 3), x, times=t, context=ctx)
    stacked = {
        "params": _stack_loop_params(
            variables["params"], DEPTH, cross_attn, cond
        )
    }
    return loop, scan, variables, stacked, x, t, ctx


def test_scan_matches_loop_conditioned():
    loop, scan, variables, stacked, x, t, ctx = _pair(cond=True, cross_attn=True)
    out_loop = loop.apply(variables, x, times=t, context=ctx)
    out_scan = scan.apply(stacked, x, times=t, context=ctx)
    np.testing.assert_allclose(
        np.asarray(out_scan), np.asarray(out_loop), atol=2e-5
    )


def test_scan_matches_loop_no_cross():
    loop, scan, variables, stacked, x, t, _ = _pair(cond=True, cross_attn=False)
    out_loop = loop.apply(variables, x, times=t)
    out_scan = scan.apply(stacked, x, times=t)
    np.testing.assert_allclose(
        np.asarray(out_scan), np.asarray(out_loop), atol=2e-5
    )


def test_scan_matches_loop_unconditional():
    loop, scan, variables, stacked, x, _, _ = _pair(cond=False, cross_attn=False)
    out_loop = loop.apply(variables, x)
    out_scan = scan.apply(stacked, x)
    np.testing.assert_allclose(
        np.asarray(out_scan), np.asarray(out_loop), atol=2e-5
    )


@pytest.mark.slow
def test_scan_remat_grads_match():
    """remat must not change values or gradients, only memory."""
    kwargs = dict(
        dim=DIM, depth=DEPTH, dim_head=DIM_HEAD, heads=HEADS,
        ff_causal_conv=True, dim_cond_mult=4, cross_attn=False,
        scan_layers=True,
    )
    plain = ConditionableTransformer(**kwargs)
    remat = ConditionableTransformer(**kwargs, remat=True)
    key = jax.random.PRNGKey(7)
    x = jax.random.normal(key, (2, 24, DIM))
    t = jax.random.normal(jax.random.fold_in(key, 1), (2, DIM * 4))
    variables = plain.init(jax.random.fold_in(key, 2), x, times=t)

    def loss(m, v):
        return jnp.sum(m.apply(v, x, times=t) ** 2)

    v_plain, g_plain = jax.value_and_grad(lambda v: loss(plain, v))(variables)
    v_remat, g_remat = jax.value_and_grad(lambda v: loss(remat, v))(variables)
    assert abs(float(v_plain) - float(v_remat)) < 1e-3
    flat_p = jax.tree_util.tree_leaves(g_plain)
    flat_r = jax.tree_util.tree_leaves(g_remat)
    for a, b in zip(flat_p, flat_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


@pytest.mark.slow
def test_model_scan_layers_end_to_end():
    """Model(scan_layers=True) produces finite output and jits."""
    from naturalspeech2_tpu.models.denoiser import Model

    model = Model(
        dim=16, depth=2, heads=2, dim_head=8, wavenet_layers=2,
        wavenet_stacks=2, use_flash_attn=False, scan_layers=True, remat=True,
    )
    key = jax.random.PRNGKey(9)
    x = jax.random.normal(key, (2, 32, 16))
    times = jnp.array([0.2, 0.7])
    variables = model.init(jax.random.fold_in(key, 1), x, times)
    out = jax.jit(lambda v, x_, t_: model.apply(v, x_, t_))(variables, x, times)
    assert out.shape == x.shape
    assert np.all(np.isfinite(np.asarray(out)))
