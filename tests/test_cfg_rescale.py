"""CFG rescale (Lin et al. 2023 eq. 15): std-matching at high guidance."""

import jax
import jax.numpy as jnp
import numpy as np

from naturalspeech2_tpu.models.denoiser import Model, forward_with_cond_scale


def _setup():
    model = Model(
        dim=16, depth=1, heads=2, dim_head=8, wavenet_layers=1,
        wavenet_stacks=1, condition_on_prompt=True, dim_prompt=16,
        num_latents_m=4, resampler_depth=1, use_flash_attn=False,
    )
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 8, 16))
    times = jnp.full((2,), 0.5)
    prompt = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 16))
    cond = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 16))
    variables = model.init(
        {"params": key}, x, times, prompt=prompt, cond=cond,
        cond_drop_mask=jnp.zeros((2,), bool),
    )
    return model, variables, x, times, prompt, cond


def test_rescale_matches_cond_std():
    """phi=1: the guided output's per-sample std equals the conditioned
    branch's std; phi=0 is plain CFG."""
    model, variables, x, times, prompt, cond = _setup()

    plain = forward_with_cond_scale(
        model, variables, x, times, prompt=prompt, cond=cond, cond_scale=6.0,
    )
    full = forward_with_cond_scale(
        model, variables, x, times, prompt=prompt, cond=cond, cond_scale=6.0,
        cfg_rescale=1.0,
    )
    cond_only = forward_with_cond_scale(
        model, variables, x, times, prompt=prompt, cond=cond, cond_scale=1.0,
    )
    std = lambda y: np.asarray(jnp.std(y, axis=(1, 2)))
    # plain CFG at scale 6 inflates std well past the conditioned branch
    assert (std(plain) > std(cond_only) * 1.05).all()
    np.testing.assert_allclose(std(full), std(cond_only), rtol=1e-4)

    # phi=0 equals plain CFG exactly
    zero = forward_with_cond_scale(
        model, variables, x, times, prompt=prompt, cond=cond, cond_scale=6.0,
        cfg_rescale=0.0,
    )
    np.testing.assert_array_equal(np.asarray(zero), np.asarray(plain))


def test_rescale_blend_is_convex():
    model, variables, x, times, prompt, cond = _setup()
    kw = dict(prompt=prompt, cond=cond, cond_scale=6.0)
    a = np.asarray(forward_with_cond_scale(
        model, variables, x, times, cfg_rescale=0.0, **kw))
    b = np.asarray(forward_with_cond_scale(
        model, variables, x, times, cfg_rescale=1.0, **kw))
    half = np.asarray(forward_with_cond_scale(
        model, variables, x, times, cfg_rescale=0.5, **kw))
    np.testing.assert_allclose(half, 0.5 * a + 0.5 * b, atol=1e-5)
