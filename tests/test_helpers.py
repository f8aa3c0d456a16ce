import jax
import jax.numpy as jnp
import numpy as np
import pytest

from naturalspeech2_tpu.utils import (
    average_over_durations,
    create_mask,
    generate_mask_from_repeats,
    pad_or_curtail_to_length,
    prob_mask_like,
    right_pad_dims_to,
    safe_div,
    safe_log,
)


def test_create_mask():
    m = create_mask(jnp.array([2, 0, 3]), 4)
    expected = np.array(
        [
            [True, True, False, False],
            [False, False, False, False],
            [True, True, True, False],
        ]
    )
    np.testing.assert_array_equal(np.asarray(m), expected)


def test_pad_or_curtail_to_length():
    x = jnp.arange(24, dtype=jnp.float32).reshape(2, 3, 4)
    same = pad_or_curtail_to_length(x, 3, axis=1)
    assert same.shape == (2, 3, 4)
    padded = pad_or_curtail_to_length(x, 5, axis=1)
    assert padded.shape == (2, 5, 4)
    np.testing.assert_array_equal(np.asarray(padded[:, 3:]), 0.0)
    np.testing.assert_array_equal(np.asarray(padded[:, :3]), np.asarray(x))
    cut = pad_or_curtail_to_length(x, 2, axis=1)
    np.testing.assert_array_equal(np.asarray(cut), np.asarray(x[:, :2]))


def test_prob_mask_like_extremes():
    key = jax.random.PRNGKey(0)
    all_true = prob_mask_like(key, (100,), 1.0)
    all_false = prob_mask_like(key, (100,), 0.0)
    assert bool(all_true.all())
    assert not bool(all_false.any())
    mid = prob_mask_like(key, (10000,), 0.25)
    frac = float(mid.mean())
    assert 0.2 < frac < 0.3


def test_generate_mask_from_repeats():
    repeats = jnp.array([[2, 1, 3], [1, 0, 2]])
    mask = generate_mask_from_repeats(repeats, max_length=8)
    assert mask.shape == (2, 3, 8)
    m = np.asarray(mask)
    # batch 0: phoneme 0 -> frames 0,1; phoneme 1 -> frame 2; phoneme 2 -> frames 3,4,5
    np.testing.assert_array_equal(np.where(m[0, 0])[0], [0, 1])
    np.testing.assert_array_equal(np.where(m[0, 1])[0], [2])
    np.testing.assert_array_equal(np.where(m[0, 2])[0], [3, 4, 5])
    # batch 1: total length 3 limits everything
    np.testing.assert_array_equal(np.where(m[1, 0])[0], [0])
    assert not m[1, 1].any()
    np.testing.assert_array_equal(np.where(m[1, 2])[0], [1, 2])
    # each frame within the total belongs to exactly one phoneme
    assert (m[0].sum(axis=0)[:6] == 1).all() and (m[0].sum(axis=0)[6:] == 0).all()


def test_average_over_durations():
    # frame values [b=1, 1, t=6]; durations [1, 3] = [2, 1, 3]
    vals = jnp.array([[[1.0, 3.0, 5.0, 2.0, 4.0, 6.0]]])
    durs = jnp.array([[2, 1, 3]])
    out = average_over_durations(vals, durs)
    np.testing.assert_allclose(np.asarray(out), [[[2.0, 5.0, 4.0]]], rtol=1e-6)


def test_average_over_durations_zeros_excluded():
    # zero frames are excluded from the count (nonzero-count denominator)
    vals = jnp.array([[[0.0, 4.0, 0.0, 0.0]]])
    durs = jnp.array([[2, 2]])
    out = average_over_durations(vals, durs)
    np.testing.assert_allclose(np.asarray(out), [[[4.0, 0.0]]], rtol=1e-6)


def test_safe_math():
    np.testing.assert_allclose(float(safe_log(jnp.array(0.0))), np.log(1e-20))
    np.testing.assert_allclose(float(safe_div(jnp.array(1.0), jnp.array(0.0))), 1e10)
    t = jnp.ones((3,))
    x = jnp.ones((3, 4, 5))
    assert right_pad_dims_to(x, t).shape == (3, 1, 1)
