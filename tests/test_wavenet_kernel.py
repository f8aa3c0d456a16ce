"""Fused WaveNet kernel: Pallas (interpret) matches the XLA twin, the XLA
twin matches the per-block reference module semantics, grads flow, and
causality holds."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from naturalspeech2_tpu.models.wavenet import FusedWavenet, Wavenet
from naturalspeech2_tpu.ops.wavenet_kernel import (
    fused_wavenet_body,
    wavenet_body_xla,
)

KEY = jax.random.PRNGKey(0)
B, N, D, S, L = 2, 64, 16, 2, 3


def _weights():
    ks = jax.random.split(KEY, 8)
    return dict(
        conv_w=jax.random.normal(ks[0], (S, L, 3 * D, D)) * 0.1,
        conv_b=jax.random.normal(ks[1], (S, L, D)) * 0.1,
        res_w=jax.random.normal(ks[2], (S, L, D, D)) * 0.1,
        res_b=jax.random.normal(ks[3], (S, L, D)) * 0.1,
        skip_w=jax.random.normal(ks[4], (L, D, D)) * 0.1,
        skip_b=jax.random.normal(ks[5], (L, D)) * 0.1,
        film=jax.random.normal(ks[6], (B, S, L, 2 * D)) * 0.1,
    )


def test_kernel_matches_xla_twin():
    w = _weights()
    x = jax.random.normal(jax.random.PRNGKey(9), (B, N, D))
    out_k = fused_wavenet_body(x, *w.values())
    out_x = wavenet_body_xla(x, *w.values())
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_x), atol=1e-4)


@pytest.mark.slow
def test_kernel_grads_match_xla():
    w = _weights()
    x = jax.random.normal(jax.random.PRNGKey(9), (B, N, D))

    gk = jax.grad(lambda x: (fused_wavenet_body(x, *w.values()) ** 2).sum())(x)
    gx = jax.grad(lambda x: (wavenet_body_xla(x, *w.values()) ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gx), atol=1e-3)


@pytest.mark.slow
def test_bf16_gradient_error_bound():
    """Documented bf16 backward bound (advisor r2): the custom_vjp twin
    recomputes the residual chain at the input dtype, so bf16 training
    gradients carry bf16-recompute error relative to a full-f32 chain
    even where the fused forward accumulated in f32. Pin the bound so a
    regression (e.g. an accidental double-rounding) is caught."""
    w = _weights()
    x = jax.random.normal(jax.random.PRNGKey(11), (B, N, D))
    g32 = jax.grad(lambda x: (wavenet_body_xla(x, *w.values()) ** 2).sum())(x)

    w16 = [a.astype(jnp.bfloat16) for a in w.values()]

    def loss16(x):
        out = fused_wavenet_body(x.astype(jnp.bfloat16), *w16)
        return (out.astype(jnp.float32) ** 2).sum()

    g16 = jax.grad(loss16)(x)
    rel = float(
        jnp.linalg.norm(g16 - g32) / jnp.maximum(jnp.linalg.norm(g32), 1e-9)
    )
    # measured 4.3e-3 on this config; 3e-2 leaves headroom for rng drift
    assert rel < 3e-2, rel


def test_fused_module_equivalent_to_reference_module():
    """FusedWavenet with weights copied from a reference-structured Wavenet
    must produce identical outputs (same math, different parameter layout)."""
    x = jax.random.normal(KEY, (B, N, D))
    t = jax.random.normal(jax.random.PRNGKey(1), (B, D * 4))

    ref = Wavenet(dim=D, stacks=S, layers=L, dim_cond_mult=4)
    ref_params = ref.init(KEY, x, t)["params"]

    fused = FusedWavenet(dim=D, stacks=S, layers=L, dim_cond_mult=4,
                         use_pallas=False)
    fused_params = fused.init(KEY, x, t)["params"]

    # map reference per-block params into the stacked layout
    conv_w = np.zeros((S, L, 3 * D, D), np.float32)
    conv_b = np.zeros((S, L, D), np.float32)
    res_w = np.zeros((S, L, D, D), np.float32)
    res_b = np.zeros((S, L, D), np.float32)
    skip_w = np.zeros((L, D, D), np.float32)
    skip_b = np.zeros((L, D), np.float32)
    film_w = np.zeros((S, L, D * 4, 2 * D), np.float32)
    film_b = np.zeros((S, L, 2 * D), np.float32)
    for s in range(S):
        for l in range(L):
            blk = ref_params[f"stack_{s}"][f"block_{l}"]
            # flax Conv kernel [k, in, out] with k=3 taps ordered
            # [t-2δ, t-δ, t] after causal left-padding → rows of conv_w
            kern = np.asarray(blk["conv"]["Conv_0"]["kernel"])
            conv_w[s, l] = kern.reshape(3 * D, D)
            conv_b[s, l] = np.asarray(blk["conv"]["Conv_0"]["bias"])
            res_w[s, l] = np.asarray(blk["res_conv"]["Conv_0"]["kernel"])[0]
            res_b[s, l] = np.asarray(blk["res_conv"]["Conv_0"]["bias"])
            film_w[s, l] = np.asarray(blk["to_time_cond"]["kernel"])
            film_b[s, l] = np.asarray(blk["to_time_cond"]["bias"])
            if s == S - 1:
                skip_w[l] = np.asarray(blk["skip_conv"]["Conv_0"]["kernel"])[0]
                skip_b[l] = np.asarray(blk["skip_conv"]["Conv_0"]["bias"])

    mapped = dict(fused_params)
    mapped.update(
        conv_w=jnp.asarray(conv_w), conv_b=jnp.asarray(conv_b),
        res_w=jnp.asarray(res_w), res_b=jnp.asarray(res_b),
        skip_w=jnp.asarray(skip_w), skip_b=jnp.asarray(skip_b),
        film_w=jnp.asarray(film_w), film_b=jnp.asarray(film_b),
    )
    mapped["init_conv"] = ref_params["init_conv"]
    mapped["final_conv"] = ref_params["final_conv"]

    out_ref = ref.apply({"params": ref_params}, x, t)
    out_fused = fused.apply({"params": mapped}, x, t)
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_ref), atol=1e-4
    )


@pytest.mark.slow
def test_fused_module_causal():
    fused = FusedWavenet(dim=D, stacks=S, layers=L, dim_cond_mult=4)
    x = jax.random.normal(KEY, (1, N, D))
    t = jnp.zeros((1, D * 4))
    params = fused.init(KEY, x, t)
    out1 = fused.apply(params, x, t)
    x2 = x.at[:, 40:].set(9.0)
    out2 = fused.apply(params, x2, t)
    np.testing.assert_allclose(
        np.asarray(out1[:, :40]), np.asarray(out2[:, :40]), atol=1e-4
    )


def test_xla_twin_bf16_inputs():
    """bf16 params+activations must run (uniform-dtype scan carry — mixed
    promotion used to break the carry-type invariant) and track f32."""
    import jax.numpy as jnp

    w = _weights()
    x = jax.random.normal(jax.random.PRNGKey(9), (B, N, D))
    ref = wavenet_body_xla(x, *w.values())
    args16 = [a.astype(jnp.bfloat16) for a in (x, *w.values())]
    out16 = wavenet_body_xla(*args16)
    assert out16.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out16, np.float32), np.asarray(ref), atol=5e-2
    )


def test_per_lane_kernel_matches_xla_twin():
    """The per-lane kernel (grid over lanes — the big-shape fused path)
    must match the XLA twin, including at L where dilations exceed 8."""
    from naturalspeech2_tpu.ops.wavenet_kernel import _fused_forward_per_lane

    w = _weights()
    x = jax.random.normal(jax.random.PRNGKey(9), (B, N, D))
    out_k = _fused_forward_per_lane(x, *w.values())
    out_x = wavenet_body_xla(x, *w.values())
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_x), atol=1e-4)

    S2, L2 = 3, 5  # max dilation 16, pad region 32 rows
    ks = jax.random.split(jax.random.PRNGKey(4), 8)
    w2 = dict(
        conv_w=jax.random.normal(ks[0], (S2, L2, 3 * D, D)) * 0.1,
        conv_b=jax.random.normal(ks[1], (S2, L2, D)) * 0.1,
        res_w=jax.random.normal(ks[2], (S2, L2, D, D)) * 0.1,
        res_b=jax.random.normal(ks[3], (S2, L2, D)) * 0.1,
        skip_w=jax.random.normal(ks[4], (L2, D, D)) * 0.1,
        skip_b=jax.random.normal(ks[5], (L2, D)) * 0.1,
        film=jax.random.normal(ks[6], (B, S2, L2, 2 * D)) * 0.1,
    )
    out_k2 = _fused_forward_per_lane(x, *w2.values())
    out_x2 = wavenet_body_xla(x, *w2.values())
    np.testing.assert_allclose(np.asarray(out_k2), np.asarray(out_x2), atol=1e-4)


def test_dispatch_routes_big_shapes_to_per_lane(monkeypatch):
    """Shapes over the whole-stack VMEM budget but within the per-lane
    budget must use the per-lane kernel, not the XLA twin."""
    import naturalspeech2_tpu.ops.wavenet_kernel as wk

    w = _weights()
    x = jax.random.normal(jax.random.PRNGKey(3), (B, N, D))
    args = (x, w["conv_w"], w["conv_b"], w["res_w"], w["res_b"],
            w["skip_w"], w["skip_b"], w["film"])
    full = wk.wavenet_body_xla(*args)

    called = {"lane": 0}
    orig = wk._fused_forward_per_lane

    def spy(*a):
        called["lane"] += 1
        return orig(*a)

    monkeypatch.setattr(wk, "_fused_forward_per_lane", spy)
    monkeypatch.setattr(wk, "VMEM_SCRATCH_LIMIT_BYTES", 1)
    routed = wk.fused_wavenet_body(*args)
    assert called["lane"] == 1, "dispatch did not use the per-lane kernel"
    np.testing.assert_allclose(np.asarray(routed), np.asarray(full), atol=1e-4)


def test_vmem_guard_routes_to_xla_twin(monkeypatch):
    """Shapes over the VMEM budget must auto-route to the XLA twin (same
    numbers, no Pallas launch) instead of spilling/failing at scale."""
    import naturalspeech2_tpu.ops.wavenet_kernel as wk

    w = _weights()
    x = jax.random.normal(jax.random.PRNGKey(3), (B, N, D))
    args = (x, w["conv_w"], w["conv_b"], w["res_w"], w["res_b"],
            w["skip_w"], w["skip_b"], w["film"])
    full = wk.fused_wavenet_body(*args)

    called = {"pallas": 0}
    orig = wk._fused_forward
    orig_lane = wk._fused_forward_per_lane

    def spy(*a):
        called["pallas"] += 1
        return orig(*a)

    def spy_lane(*a):
        called["pallas"] += 1
        return orig_lane(*a)

    monkeypatch.setattr(wk, "_fused_forward", spy)
    monkeypatch.setattr(wk, "_fused_forward_per_lane", spy_lane)
    monkeypatch.setattr(wk, "VMEM_SCRATCH_LIMIT_BYTES", 1)
    monkeypatch.setattr(wk, "LANE_VMEM_LIMIT_BYTES", 1)
    routed = wk.fused_wavenet_body(*args)
    assert called["pallas"] == 0, "guard did not route to the XLA twin"
    np.testing.assert_allclose(np.asarray(routed), np.asarray(full), atol=1e-5)
