"""DPM-Solver++(2M) sampler: ODE-accuracy and integration tests.

Accuracy is measured against an ANALYTIC denoiser: for Gaussian data
x₀ ~ N(μ, s²I) the posterior mean E[x₀|x_t] = (α s² x_t + σ² μ)/(α² s² + σ²)
is exact, so the probability-flow ODE is exactly defined and a
high-resolution DDIM integration is ground truth. A 2nd-order solver must
beat 1st-order DDIM at equal (low) step counts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from naturalspeech2_tpu.models.naturalspeech2 import ddim_sample, dpmpp_sample
from naturalspeech2_tpu.ops.schedules import (
    gamma_to_alpha_sigma,
    sigmoid_schedule,
)

SHAPE = (4, 8, 16)
S = 0.5  # data std


def make_denoiser():
    mu = jnp.asarray(
        np.random.RandomState(0).uniform(-1, 1, SHAPE[1:]), jnp.float32
    )

    def denoise_fn(audio, times):
        gamma = sigmoid_schedule(times[0])
        alpha, sigma = gamma_to_alpha_sigma(gamma)
        denom = alpha**2 * S**2 + sigma**2
        return (alpha * S**2 * audio + sigma**2 * mu[None]) / denom

    return denoise_fn


def run(sampler, steps, key):
    return sampler(
        make_denoiser(),
        key,
        SHAPE,
        timesteps=steps,
        gamma_schedule=sigmoid_schedule,
        objective="x0",
    )


@pytest.mark.parametrize("steps", [6, 8, 12])
def test_dpmpp_beats_ddim_at_low_steps(steps):
    key = jax.random.PRNGKey(1)
    ref = np.asarray(run(ddim_sample, 1024, key))
    err_ddim = np.abs(np.asarray(run(ddim_sample, steps, key)) - ref).mean()
    err_dpmpp = np.abs(np.asarray(run(dpmpp_sample, steps, key)) - ref).mean()
    assert np.isfinite(err_dpmpp)
    assert err_dpmpp < err_ddim, (
        f"{steps} steps: dpm++ {err_dpmpp:.5f} vs ddim {err_ddim:.5f}"
    )


def test_dpmpp_converges_to_reference():
    key = jax.random.PRNGKey(2)
    ref = np.asarray(run(ddim_sample, 1024, key))
    out = np.asarray(run(dpmpp_sample, 32, key))
    # residual is dominated by the clipped-log-SNR first interval (γ(1)=0),
    # which every solver shares; 32-step dpm++ lands within ~6e-3 of the
    # 1024-step reference on unit-scale data
    assert np.abs(out - ref).mean() < 1e-2


def test_dpmpp_self_cond_arity():
    """self_cond=True calls denoise_fn(audio, times, x0_prev)."""
    seen = []

    def denoise_fn(audio, times, x_self_cond):
        seen.append(True)
        gamma = sigmoid_schedule(times[0])
        alpha, sigma = gamma_to_alpha_sigma(gamma)
        denom = alpha**2 * S**2 + sigma**2
        return (alpha * S**2 * audio + sigma**2 * x_self_cond * 0.0) / denom

    out = dpmpp_sample(
        denoise_fn, jax.random.PRNGKey(0), SHAPE, timesteps=4,
        gamma_schedule=sigmoid_schedule, objective="x0", self_cond=True,
    )
    assert seen and np.isfinite(np.asarray(out)).all()


def test_ns2_sampler_knob():
    """NaturalSpeech2(sampler='dpmpp') drives end-to-end sampling."""
    from naturalspeech2_tpu.models.codec import SoundStream
    from naturalspeech2_tpu.models.denoiser import Model
    from naturalspeech2_tpu.models.naturalspeech2 import NaturalSpeech2, sample

    codec = SoundStream(
        codebook_dim=16, channels=4, num_quantizers=2, codebook_size=16,
        use_pallas_rvq=False,
    )
    model = Model(dim=16, depth=1, heads=2, dim_head=8, wavenet_layers=1,
                  wavenet_stacks=1, use_flash_attn=False)
    ns2 = NaturalSpeech2(model=model, codec=codec, timesteps=8,
                         sampler="dpmpp")
    key = jax.random.PRNGKey(0)
    audio = jax.random.uniform(key, (1, 640), minval=-1, maxval=1)
    variables = ns2.init(
        {n: key for n in ("params", "times", "noise")}, audio
    )
    params = dict(variables["params"])
    params["codec"] = codec.init(key, audio)["params"]
    wav = sample(ns2, {"params": params}, key, length=4, timesteps=8)
    assert wav.shape == (1, 1280)
    assert np.isfinite(np.asarray(wav)).all()


def test_bad_sampler_name_rejected():
    from naturalspeech2_tpu.models.denoiser import Model
    from naturalspeech2_tpu.models.naturalspeech2 import NaturalSpeech2

    model = Model(dim=16, depth=1, heads=2, dim_head=8, use_flash_attn=False)
    ns2 = NaturalSpeech2(model=model, timesteps=4, sampler="heun")
    with pytest.raises(AssertionError):
        ns2.init(
            {"params": jax.random.PRNGKey(0),
             "times": jax.random.PRNGKey(0),
             "noise": jax.random.PRNGKey(0)},
            jnp.zeros((1, 4, 16)),
        )
