import jax
import jax.numpy as jnp
import numpy as np
import pytest

from naturalspeech2_tpu.ops.rvq import rvq_cross_entropy, rvq_quantize, rvq_xla


def _make(m=100, d=16, Q=4, K=32, seed=0):
    kx, kc = jax.random.split(jax.random.PRNGKey(seed))
    x = jax.random.normal(kx, (m, d))
    codebooks = jax.random.normal(kc, (Q, K, d))
    return x, codebooks


def _rvq_numpy(x, codebooks):
    x, codebooks = np.asarray(x), np.asarray(codebooks)
    residual = x.copy()
    codes = []
    for cb in codebooks:
        d2 = ((residual[:, None, :] - cb[None, :, :]) ** 2).sum(-1)
        idx = d2.argmin(-1)
        residual = residual - cb[idx]
        codes.append(idx)
    return x - residual, np.stack(codes, -1)


def test_rvq_xla_matches_numpy():
    x, cb = _make()
    q, codes = rvq_xla(x, cb)
    qn, cn = _rvq_numpy(x, cb)
    np.testing.assert_array_equal(np.asarray(codes), cn)
    np.testing.assert_allclose(np.asarray(q), qn, atol=1e-5)


def test_rvq_kernel_matches_xla():
    x, cb = _make(m=300, d=16, Q=4, K=32)
    q_k, codes_k = rvq_quantize(x, cb)
    q_x, codes_x = rvq_xla(x, cb)
    np.testing.assert_array_equal(np.asarray(codes_k), np.asarray(codes_x))
    np.testing.assert_allclose(np.asarray(q_k), np.asarray(q_x), atol=1e-4)


@pytest.mark.slow
def test_rvq_residual_shrinks():
    # with a zero entry available in every codebook, each extra stage can
    # never increase reconstruction error (zero = "no-op" choice)
    x, cb = _make(m=200, d=8, Q=6, K=64, seed=1)
    cb = cb.at[:, 0].set(0.0)
    errs = []
    for q_stages in range(1, 7):
        quantized, _ = rvq_xla(x, cb[:q_stages])
        errs.append(float(((x - quantized) ** 2).mean()))
    assert all(e2 <= e1 + 1e-6 for e1, e2 in zip(errs, errs[1:])), errs


def test_rvq_straight_through_grad():
    x, cb = _make(m=64, d=8, Q=2, K=16)

    def loss(x):
        q, _ = rvq_quantize(x, cb)
        return (q**2).sum()

    g = jax.grad(loss)(x)
    # straight-through: grad = d/dq (q²) = 2q evaluated at quantized
    q, _ = rvq_quantize(x, cb)
    np.testing.assert_allclose(np.asarray(g), np.asarray(2 * q), atol=1e-4)


@pytest.mark.slow
def test_rvq_cross_entropy():
    x, cb = _make(m=64, d=8, Q=3, K=16)
    _, codes = rvq_xla(x, cb)
    ce_own = rvq_cross_entropy(x, cb, codes)
    assert np.isfinite(float(ce_own))
    # CE against own codes must be lower than against shuffled codes
    wrong = jnp.roll(codes, 1, axis=0)
    ce_wrong = rvq_cross_entropy(x, cb, wrong)
    assert float(ce_own) < float(ce_wrong)
    # differentiable wrt x
    g = jax.grad(lambda x_: rvq_cross_entropy(x_, cb, codes))(x)
    assert np.isfinite(np.asarray(g)).all()


def test_rvq_kernel_jit_and_padding():
    # m not a multiple of the block size exercises the padding path
    x, cb = _make(m=513, d=16, Q=2, K=32)
    f = jax.jit(lambda x: rvq_quantize(x, cb))
    q, codes = f(x)
    q_x, codes_x = rvq_xla(x, cb)
    np.testing.assert_array_equal(np.asarray(codes), np.asarray(codes_x))
