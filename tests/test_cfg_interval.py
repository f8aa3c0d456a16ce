"""Limited-interval CFG (Kynkäänniemi et al. 2024): guidance only at
diffusion times inside (t_lo, t_hi); outside, one conditional forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from naturalspeech2_tpu.models.naturalspeech2 import sample

from tests.test_conditional import cond_ns2

KEY = jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def small():
    ns2 = cond_ns2()
    b = 2
    audio = jax.random.uniform(KEY, (b, 4 * 320), minval=-1, maxval=1)
    prompt = jax.random.uniform(
        jax.random.PRNGKey(1), (b, 2 * 320), minval=-1, maxval=1
    )
    text = jax.random.randint(jax.random.PRNGKey(2), (b, 5), 0, 20)
    text_lens = jnp.array([5, 4])
    rngs = {k: jax.random.PRNGKey(i) for i, k in enumerate(
        ("params", "times", "noise", "cfg", "dropout"))}
    variables = ns2.init(
        rngs, audio, text=text, text_lens=text_lens, prompt=prompt
    )
    params = dict(variables["params"])
    params["codec"] = ns2.codec.init(KEY, audio[:, :640])["params"]
    return ns2, {"params": params}, prompt, text, text_lens


def _sample(ns2, variables, prompt, text, text_lens, **kw):
    return np.asarray(sample(
        ns2, variables, jax.random.PRNGKey(7), length=4, prompt=prompt,
        text=text, text_lens=text_lens, timesteps=4, cond_scale=3.0, **kw,
    ))


def test_full_interval_matches_default(small):
    """(0, 1) covers every sampling time — must equal always-guided."""
    ns2, variables, prompt, text, text_lens = small
    base = _sample(ns2, variables, prompt, text, text_lens)
    full = _sample(
        ns2, variables, prompt, text, text_lens, cfg_interval=(0.0, 1.0)
    )
    np.testing.assert_allclose(full, base, atol=1e-5)


def test_empty_interval_matches_unguided(small):
    """An interval covering no sampling time ≡ cond_scale=1 everywhere."""
    ns2, variables, prompt, text, text_lens = small
    never = _sample(
        ns2, variables, prompt, text, text_lens, cfg_interval=(-2.0, -1.0)
    )
    unguided = np.asarray(sample(
        ns2, variables, jax.random.PRNGKey(7), length=4, prompt=prompt,
        text=text, text_lens=text_lens, timesteps=4, cond_scale=1.0,
    ))
    np.testing.assert_allclose(never, unguided, atol=1e-5)


def test_partial_interval_differs_and_is_finite(small):
    ns2, variables, prompt, text, text_lens = small
    base = _sample(ns2, variables, prompt, text, text_lens)
    part = _sample(
        ns2, variables, prompt, text, text_lens, cfg_interval=(0.3, 0.8)
    )
    assert np.isfinite(part).all()
    assert not np.allclose(part, base)


def test_jittable(small):
    ns2, variables, prompt, text, text_lens = small

    f = jax.jit(lambda v, k: sample(
        ns2, v, k, length=4, prompt=prompt, text=text, text_lens=text_lens,
        timesteps=4, cond_scale=3.0, cfg_interval=(0.2, 0.9),
    ))
    out = np.asarray(f(variables, jax.random.PRNGKey(3)))
    assert np.isfinite(out).all()
