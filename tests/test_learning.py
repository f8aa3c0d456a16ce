"""Diffusion math consistency and learning sanity.

1. Sampler inversion: for a point-mass data distribution δ(x₀) the optimal
   v-predictor is analytic — both DDIM and DDPM must recover x₀ from pure
   noise to machine precision. This pins the objective ↔ sampler algebra
   (γ→α/σ, x₀ reconstruction, update rules) end to end.
2. Learning: a small model overfitting a single fixed latent must cut its
   training loss substantially (grads point the right way through the whole
   wavenet+transformer stack)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from naturalspeech2_tpu.models.denoiser import Model
from naturalspeech2_tpu.models.naturalspeech2 import (
    NaturalSpeech2,
    ddim_sample,
    ddpm_sample,
)
from naturalspeech2_tpu.ops.schedules import (
    gamma_to_alpha_sigma,
    sigmoid_schedule,
)
from naturalspeech2_tpu.utils.helpers import safe_div

# integration-scale: runs in the full (CI) matrix; 'pytest -m "not slow"' is the fast default
pytestmark = pytest.mark.slow


N, D = 16, 16
TARGET = jnp.asarray(np.random.RandomState(0).randn(1, N, D) * 0.5, jnp.float32)


def analytic_v(audio, times):
    """Optimal v-prediction for data distribution δ(TARGET)."""
    gamma = sigmoid_schedule(times)[:, None, None]
    alpha, sigma = gamma_to_alpha_sigma(gamma)
    eps_hat = safe_div(audio - alpha * TARGET, sigma)
    return alpha * eps_hat - sigma * TARGET


@pytest.mark.parametrize("sampler", [ddim_sample, ddpm_sample])
def test_sampler_inverts_analytic_denoiser(sampler):
    out = sampler(
        analytic_v, jax.random.PRNGKey(7), (1, N, D),
        timesteps=64, gamma_schedule=sigmoid_schedule, objective="v",
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(TARGET), atol=1e-5)


@pytest.mark.parametrize("objective", ["eps", "x0"])
def test_sampler_inverts_other_objectives(objective):
    def analytic(audio, times):
        gamma = sigmoid_schedule(times)[:, None, None]
        alpha, sigma = gamma_to_alpha_sigma(gamma)
        if objective == "x0":
            return jnp.broadcast_to(TARGET, audio.shape)
        return safe_div(audio - alpha * TARGET, sigma)  # eps

    out = ddim_sample(
        analytic, jax.random.PRNGKey(7), (1, N, D),
        timesteps=64, gamma_schedule=sigmoid_schedule, objective=objective,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(TARGET), atol=1e-4)


def test_training_loss_decreases_substantially():
    model = Model(dim=D, depth=1, heads=2, dim_head=8, wavenet_layers=2,
                  wavenet_stacks=1, use_flash_attn=False)
    ns2 = NaturalSpeech2(model=model, codec=None, target_sample_hz=24000,
                         timesteps=64)
    variables = ns2.init(
        {"params": jax.random.PRNGKey(0), "times": jax.random.PRNGKey(1),
         "noise": jax.random.PRNGKey(2)},
        TARGET,
    )
    params = variables["params"]
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, key):
        def loss_fn(p):
            return ns2.apply(
                {"params": p}, TARGET,
                rngs={"times": jax.random.fold_in(key, 0),
                      "noise": jax.random.fold_in(key, 1)},
            )["loss"]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    key = jax.random.PRNGKey(3)
    for _ in range(800):
        key, k = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, k)
        losses.append(float(loss))

    assert np.mean(losses[-50:]) < 0.6 * np.mean(losses[:50]), (
        np.mean(losses[:50]), np.mean(losses[-50:])
    )
