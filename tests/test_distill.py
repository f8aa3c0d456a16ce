"""Progressive distillation tests: the one-vs-two-step consistency loss is
zero for a perfect student on a linear toy problem, finite+decreasing in
training, and the distiller round runs end to end."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from naturalspeech2_tpu.distill import ProgressiveDistiller, distillation_loss
from naturalspeech2_tpu.models.codec import SoundStream
from naturalspeech2_tpu.models.denoiser import Model
from naturalspeech2_tpu.models.naturalspeech2 import NaturalSpeech2

# integration-scale: runs in the full (CI) matrix; 'pytest -m "not slow"' is the fast default
pytestmark = pytest.mark.slow


KEY = jax.random.PRNGKey(0)


def tiny_model():
    return Model(dim=8, depth=1, heads=2, dim_head=4, wavenet_layers=1,
                 wavenet_stacks=1, use_flash_attn=False)


def make_setup():
    model = tiny_model()
    codec = SoundStream(codebook_dim=8, channels=2, num_quantizers=1,
                        codebook_size=8, use_pallas_rvq=False)
    ns2 = NaturalSpeech2(model=model, codec=codec, timesteps=8)
    x = jnp.zeros((2, 4, 8))
    params = model.init(KEY, x, jnp.zeros((2,)))
    return ns2, model, params


def test_x0_target_formula_inverts_ddim_step():
    """The derived x̃0 target must make one student DDIM step from (x_t, t)
    land exactly on the teacher's two-step endpoint."""
    from naturalspeech2_tpu.distill import _ddim_step
    from naturalspeech2_tpu.ops.schedules import (
        gamma_to_alpha_sigma,
        sigmoid_schedule,
    )
    from naturalspeech2_tpu.utils.helpers import safe_div

    key1, key2 = jax.random.split(KEY)
    x_t = jax.random.normal(key1, (3, 5, 4))
    x_next = jax.random.normal(key2, (3, 5, 4))
    t, t_next = jnp.float32(0.7), jnp.float32(0.45)
    alpha_t, sigma_t = gamma_to_alpha_sigma(sigmoid_schedule(t))
    alpha_n, sigma_n = gamma_to_alpha_sigma(sigmoid_schedule(t_next))

    denom = alpha_n - safe_div(sigma_n * alpha_t, sigma_t)
    x0_target = safe_div(x_next - safe_div(sigma_n, sigma_t) * x_t, denom)
    reached = _ddim_step(x_t, x0_target, alpha_t, sigma_t, alpha_n, sigma_n)
    np.testing.assert_allclose(np.asarray(reached), np.asarray(x_next), atol=1e-4)


def test_distillation_loss_finite_and_has_grads():
    ns2, model, params = make_setup()
    x_data = jax.random.normal(KEY, (2, 4, 8))

    def loss_fn(p):
        return distillation_loss(
            model, p, params, x_data, jax.random.PRNGKey(1),
            num_student_steps=4, gamma_schedule=ns2.gamma_schedule,
        )

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert sum(float(jnp.abs(l).sum()) for l in leaves) > 0


def test_distill_round_reduces_loss():
    ns2, model, params = make_setup()
    d = ProgressiveDistiller(ns2, params, lr=1e-3)

    rng = np.random.RandomState(0)

    def latents():
        while True:
            yield rng.randn(2, 4, 8).astype(np.float32)

    gen = latents()
    x_fixed = jnp.asarray(next(gen))

    def eval_loss(student_params):
        vals = [
            float(distillation_loss(
                model, student_params, params, x_fixed, jax.random.PRNGKey(s),
                num_student_steps=4, gamma_schedule=ns2.gamma_schedule,
            ))
            for s in range(6)
        ]
        return float(np.mean(vals))

    loss_before = eval_loss(params)
    student = d.distill_round(gen, num_student_steps=4, n_updates=150)
    loss_after = eval_loss(student)
    assert loss_after < loss_before, (loss_before, loss_after)


def test_run_schedule_halves_to_target():
    """run_schedule walks start→target in halvings, records a loss per
    round, and returns params with the model's structure."""
    ns2, model, params = make_setup()
    d = ProgressiveDistiller(ns2, params, lr=1e-3)

    rng = np.random.RandomState(1)

    def latents():
        while True:
            yield rng.randn(2, 4, 8).astype(np.float32)

    final, history = d.run_schedule(
        latents(), start_steps=8, target_steps=2, updates_per_round=5
    )
    assert [s for s, _ in history] == [4, 2]
    assert all(np.isfinite(l) for _, l in history)
    assert jax.tree_util.tree_structure(final) == jax.tree_util.tree_structure(
        params
    )

    with pytest.raises(AssertionError):
        d.run_schedule(latents(), start_steps=6, target_steps=2,
                       updates_per_round=1)


def test_distill_round_partial_chunk_pads_are_noops():
    """n_updates not divisible by updates_per_jit: the tail chunk pads to
    the fixed scan length with MASKED steps (no second trace/compile of a
    ragged chunk). Proof: 2 live updates in a 4-step chunk must produce
    EXACTLY the params of a hand-rolled 2-step Adam loop with the same key
    schedule — unmasked pads would apply 2 extra updates."""
    import optax

    from naturalspeech2_tpu.distill import distillation_loss

    ns2, model, params = make_setup()
    rng = np.random.RandomState(0)
    live = [rng.randn(2, 4, 8).astype(np.float32) for _ in range(2)]

    def gen():
        yield from live

    d = ProgressiveDistiller(ns2, params, lr=1e-3)
    student = d.distill_round(gen(), num_student_steps=4, n_updates=2,
                              updates_per_jit=4)

    # reference: replicate distill_round's key schedule and apply only the
    # two live updates
    key = jax.random.PRNGKey(0)
    key, k = jax.random.split(key)
    ckeys = jax.random.split(k, 4)
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-3))
    sp = jax.tree_util.tree_map(jnp.copy, params)
    os_ = opt.init(sp)
    for i in range(2):
        _, grads = jax.value_and_grad(
            lambda p: distillation_loss(
                model, p, params, jnp.asarray(live[i]), ckeys[i],
                num_student_steps=4, gamma_schedule=ns2.gamma_schedule,
                scale=ns2.scale,
            )
        )(sp)
        updates, os_ = opt.update(grads, os_, sp)
        sp = optax.apply_updates(sp, updates)

    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5
        ),
        student, sp,
    )
