"""End-to-end tests of the unconditional diffusion slice (README config 1
semantics at toy scale: mock audio → loss → grads → sample → waveform)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from naturalspeech2_tpu.models.codec import SoundStream
from naturalspeech2_tpu.models.denoiser import Model, forward_with_cond_scale
from naturalspeech2_tpu.models.naturalspeech2 import (
    NaturalSpeech2,
    ddim_sample,
    ddpm_sample,
    sample,
)

# integration-scale: runs in the full (CI) matrix; 'pytest -m "not slow"' is the fast default
pytestmark = pytest.mark.slow


KEY = jax.random.PRNGKey(0)


def make_ns2(timesteps=8, use_ddim=True, objective="v"):
    codec = SoundStream(
        codebook_dim=16, channels=4, num_quantizers=2, codebook_size=16,
        use_pallas_rvq=False,
    )
    model = Model(dim=16, depth=1, heads=2, dim_head=8, wavenet_layers=2,
                  wavenet_stacks=2, use_flash_attn=False)
    ns2 = NaturalSpeech2(
        model=model, codec=codec, timesteps=timesteps, use_ddim=use_ddim,
        objective=objective,
    )
    return ns2


@pytest.fixture(scope="module")
def ns2_and_vars():
    ns2 = make_ns2()
    audio = jax.random.uniform(KEY, (2, 2 * 320), minval=-1, maxval=1)
    variables = ns2.init(
        {"params": KEY, "times": KEY, "noise": KEY}, audio
    )
    # decoder params are needed for sampling; init them through the codec
    codec_full = ns2.codec.init(KEY, audio)
    params = dict(variables["params"])
    params["codec"] = codec_full["params"]
    return ns2, {"params": params}


def test_training_loss(ns2_and_vars):
    ns2, variables = ns2_and_vars
    audio = jax.random.uniform(jax.random.PRNGKey(1), (2, 640), minval=-1, maxval=1)
    losses = ns2.apply(
        variables, audio, rngs={"times": jax.random.PRNGKey(2),
                                "noise": jax.random.PRNGKey(3)},
    )
    assert np.isfinite(float(losses["loss"]))
    assert float(losses["diffusion"]) == float(losses["loss"])


def test_training_grads_flow_to_model_not_codec(ns2_and_vars):
    ns2, variables = ns2_and_vars
    audio = jax.random.uniform(jax.random.PRNGKey(1), (2, 640), minval=-1, maxval=1)

    def loss_fn(params):
        out = ns2.apply(
            {"params": params}, audio,
            rngs={"times": jax.random.PRNGKey(2), "noise": jax.random.PRNGKey(3)},
        )
        return out["loss"]

    g = jax.grad(loss_fn)(variables["params"])
    model_norm = sum(
        float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(g["model"])
    )
    codec_norm = sum(
        float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(g["codec"])
    )
    assert model_norm > 0
    # codec is frozen (stop_gradient) in the diffusion loss
    assert codec_norm == 0


@pytest.mark.parametrize("objective", ["v", "eps", "x0"])
def test_objectives(objective):
    ns2 = make_ns2(objective=objective)
    audio = jax.random.uniform(KEY, (1, 640), minval=-1, maxval=1)
    variables = ns2.init({"params": KEY, "times": KEY, "noise": KEY}, audio)
    losses = ns2.apply(
        variables, audio,
        rngs={"times": jax.random.PRNGKey(2), "noise": jax.random.PRNGKey(3)},
    )
    assert np.isfinite(float(losses["loss"]))


def test_sample_end_to_end(ns2_and_vars):
    ns2, variables = ns2_and_vars
    audio = sample(ns2, variables, jax.random.PRNGKey(7), length=4, batch_size=2)
    assert audio.shape == (2, 4 * 320)
    assert np.isfinite(np.asarray(audio)).all()


def test_sample_ddpm_end_to_end():
    ns2 = make_ns2(use_ddim=False)
    audio_in = jax.random.uniform(KEY, (2, 640), minval=-1, maxval=1)
    variables = ns2.init({"params": KEY, "times": KEY, "noise": KEY}, audio_in)
    codec_full = ns2.codec.init(KEY, audio_in)
    params = dict(variables["params"])
    params["codec"] = codec_full["params"]
    audio = sample(ns2, {"params": params}, jax.random.PRNGKey(7), length=4)
    assert audio.shape == (1, 1280)
    assert np.isfinite(np.asarray(audio)).all()


def test_sample_jits(ns2_and_vars):
    ns2, variables = ns2_and_vars
    f = jax.jit(
        lambda v, k: sample(ns2, v, k, length=4, batch_size=1)
    )
    out = f(variables, jax.random.PRNGKey(0))
    assert out.shape == (1, 1280)


def test_ddim_deterministic_given_key(ns2_and_vars):
    ns2, variables = ns2_and_vars
    a1 = sample(ns2, variables, jax.random.PRNGKey(5), length=4)
    a2 = sample(ns2, variables, jax.random.PRNGKey(5), length=4)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2))


def test_sample_bf16_close_to_f32(ns2_and_vars):
    """`sample(dtype=bf16)` (denoiser scan in bfloat16, schedule math and
    codec decode in f32) must track the f32 waveform closely — the per-step
    f32 update re-anchors the bf16 network output, so the outputs should
    correlate strongly and share shape/finiteness."""
    ns2, variables = ns2_and_vars
    a32 = np.asarray(
        sample(ns2, variables, jax.random.PRNGKey(11), length=4, batch_size=2)
    )
    a16 = np.asarray(
        sample(ns2, variables, jax.random.PRNGKey(11), length=4, batch_size=2,
               dtype=jnp.bfloat16)
    )
    assert a16.shape == a32.shape
    assert a16.dtype == np.float32  # decode path stays f32
    assert np.isfinite(a16).all()
    corr = np.corrcoef(a16.ravel(), a32.ravel())[0, 1]
    assert corr > 0.98, corr


def test_cfg_batched_equals_two_pass():
    """The batch-doubled CFG forward must equal two separate forwards."""
    model = Model(
        dim=16, depth=1, heads=2, dim_head=8, wavenet_layers=2,
        wavenet_stacks=2, use_flash_attn=False,
        condition_on_prompt=True, dim_prompt=16, num_latents_m=4,
        resampler_depth=1,
    )
    x = jax.random.normal(KEY, (2, 8, 16))
    times = jnp.array([0.3, 0.7])
    prompt = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 16))
    cond = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 16))
    variables = model.init(KEY, x, times, prompt=prompt, cond=cond,
                           cond_drop_mask=jnp.zeros((2,), bool))

    fused = forward_with_cond_scale(
        model, variables, x, times, prompt=prompt, cond=cond, cond_scale=2.0
    )
    logits = model.apply(variables, x, times, prompt=prompt, cond=cond,
                         cond_drop_mask=jnp.zeros((2,), bool))
    null_logits = model.apply(variables, x, times, prompt=prompt, cond=cond,
                              cond_drop_mask=jnp.ones((2,), bool))
    ref = null_logits + (logits - null_logits) * 2.0
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=1e-5)
