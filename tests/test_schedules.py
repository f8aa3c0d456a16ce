import math

import jax.numpy as jnp
import numpy as np
import pytest

from naturalspeech2_tpu.ops.schedules import (
    cosine_schedule,
    gamma_to_alpha_sigma,
    gamma_to_log_snr,
    get_schedule,
    sigmoid_schedule,
    simple_linear_schedule,
)


def test_linear_schedule():
    t = jnp.array([0.0, 0.5, 1.0])
    g = simple_linear_schedule(t)
    np.testing.assert_allclose(np.asarray(g), [1.0, 0.5, 1e-9], rtol=1e-6)


def test_cosine_schedule_endpoints():
    t = jnp.array([0.0, 1.0])
    g = cosine_schedule(t)
    np.testing.assert_allclose(np.asarray(g), [1.0, 1e-9], atol=1e-7)


def test_cosine_schedule_value():
    # hand-computed: tau=1, start=0, end=1 → γ(t) = cos(tπ/2)²
    t = jnp.array([0.3])
    expected = math.cos(0.3 * math.pi / 2) ** 2
    np.testing.assert_allclose(float(cosine_schedule(t)[0]), expected, rtol=1e-5)


def test_sigmoid_schedule_value():
    # hand-computed against the closed form (default start=-3, end=3, tau=1)
    def sig(x):
        return 1.0 / (1.0 + math.exp(-x))

    v_start, v_end = sig(-3.0), sig(3.0)
    for tv in [0.0, 0.25, 0.5, 1.0]:
        expected = (-sig(tv * 6.0 - 3.0) + v_end) / (v_end - v_start)
        expected = min(max(expected, 1e-9), 1.0)
        got = float(sigmoid_schedule(jnp.array([tv]))[0])
        np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_sigmoid_monotone_decreasing():
    t = jnp.linspace(0, 1, 50)
    g = np.asarray(sigmoid_schedule(t))
    assert (np.diff(g) <= 1e-7).all()
    assert g[0] > 0.99 and g[-1] < 0.01


def test_gamma_conversions():
    g = jnp.array([0.25])
    alpha, sigma = gamma_to_alpha_sigma(g)
    np.testing.assert_allclose(float(alpha[0]), 0.5, rtol=1e-6)
    np.testing.assert_allclose(float(sigma[0]), math.sqrt(0.75), rtol=1e-6)
    # alpha² + sigma² = 1 for scale=1
    np.testing.assert_allclose(float(alpha[0] ** 2 + sigma[0] ** 2), 1.0, rtol=1e-6)
    # scale shifts alpha only
    alpha_s, sigma_s = gamma_to_alpha_sigma(g, scale=0.5)
    np.testing.assert_allclose(float(alpha_s[0]), 0.25, rtol=1e-6)
    np.testing.assert_allclose(float(sigma_s[0]), float(sigma[0]), rtol=1e-6)
    # log-SNR
    np.testing.assert_allclose(
        float(gamma_to_log_snr(g)[0]), math.log(0.25 / 0.75), rtol=1e-4
    )


def test_get_schedule_dispatch():
    assert get_schedule("sigmoid") is sigmoid_schedule
    with pytest.raises(ValueError):
        get_schedule("nope")
