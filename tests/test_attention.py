import jax
import jax.numpy as jnp
import numpy as np
import pytest

from naturalspeech2_tpu.ops.attention import attend, attend_xla
from naturalspeech2_tpu.ops.flash_attention import flash_attention


def _ref_attention(q, k, v, mask=None, causal=False, scale=None):
    """Plain numpy reference."""
    q, k, v = map(np.asarray, (q, k, v))
    if scale is None:
        scale = q.shape[-1] ** -0.5
    sim = np.einsum("bhid,bhjd->bhij", q, k) * scale
    if mask is not None:
        sim = np.where(np.asarray(mask)[:, None, None, :], sim, -1e30)
    if causal:
        i, j = sim.shape[-2:]
        tri = np.tril(np.ones((i, j), dtype=bool), j - i)
        sim = np.where(tri, sim, -1e30)
    sim = sim - sim.max(axis=-1, keepdims=True)
    attn = np.exp(sim)
    attn = attn / attn.sum(axis=-1, keepdims=True)
    return np.einsum("bhij,bhjd->bhid", attn, v)


@pytest.fixture
def qkv():
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (2, 4, 64, 32))
    k = jax.random.normal(kk, (2, 4, 96, 32))
    v = jax.random.normal(kv, (2, 4, 96, 32))
    return q, k, v


def test_attend_xla_matches_numpy(qkv):
    q, k, v = qkv
    out = attend_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(out), _ref_attention(q, k, v), atol=1e-5)


def test_attend_xla_mask(qkv):
    q, k, v = qkv
    lengths = jnp.array([50, 96])
    mask = jnp.arange(96)[None, :] < lengths[:, None]
    out = attend_xla(q, k, v, mask=mask)
    np.testing.assert_allclose(
        np.asarray(out), _ref_attention(q, k, v, mask=mask), atol=1e-5
    )
    # masked keys must not influence output: perturb them
    v2 = v.at[0, :, 50:].set(123.0)
    out2 = attend_xla(q, k, v2, mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)


def test_attend_xla_causal():
    key = jax.random.PRNGKey(1)
    q = jax.random.normal(key, (1, 2, 32, 16))
    out = attend_xla(q, q, q, causal=True)
    np.testing.assert_allclose(
        np.asarray(out), _ref_attention(q, q, q, causal=True), atol=1e-5
    )


def test_attend_broadcast_single_head_kv(qkv):
    q, k, v = qkv
    k1, v1 = k[:, 0], v[:, 0]  # [b, n, d]
    out = attend_xla(q, k1, v1)
    ref = _ref_attention(q, k[:, :1].repeat(4, 1), v[:, :1].repeat(4, 1))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


# --- Pallas flash kernel (interpret mode on CPU) vs xla path ---


def test_flash_matches_xla_basic(qkv):
    q, k, v = qkv
    out_flash = flash_attention(q, k, v)
    out_xla = attend_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(out_flash), np.asarray(out_xla), atol=2e-5)


def test_flash_matches_xla_masked(qkv):
    q, k, v = qkv
    lengths = jnp.array([50, 96])
    mask = jnp.arange(96)[None, :] < lengths[:, None]
    out_flash = flash_attention(q, k, v, mask=mask)
    out_xla = attend_xla(q, k, v, mask=mask)
    np.testing.assert_allclose(np.asarray(out_flash), np.asarray(out_xla), atol=2e-5)


def test_flash_causal_long():
    key = jax.random.PRNGKey(2)
    q = jax.random.normal(key, (1, 2, 300, 64))
    out_flash = flash_attention(q, q, q, causal=True)
    out_xla = attend_xla(q, q, q, causal=True)
    np.testing.assert_allclose(np.asarray(out_flash), np.asarray(out_xla), atol=2e-5)


@pytest.mark.slow
def test_flash_grad_matches_xla(qkv):
    q, k, v = qkv
    lengths = jnp.array([50, 96])
    mask = jnp.arange(96)[None, :] < lengths[:, None]

    def loss_flash(q, k, v):
        return (flash_attention(q, k, v, mask=mask) ** 2).sum()

    def loss_xla(q, k, v):
        return (attend_xla(q, k, v, mask=mask) ** 2).sum()

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


@pytest.mark.slow
def test_flash_grad_causal_matches_xla():
    key = jax.random.PRNGKey(3)
    q = jax.random.normal(key, (2, 2, 96, 32))

    def loss_flash(q):
        return (flash_attention(q, q, q, causal=True) ** 2).sum()

    def loss_xla(q):
        return (attend_xla(q, q, q, causal=True) ** 2).sum()

    gf = jax.grad(loss_flash)(q)
    gx = jax.grad(loss_xla)(q)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gx), atol=2e-3)


@pytest.mark.slow
def test_flash_grad_rectangular_cross():
    # cross-attention shape: n_q != n_kv exercises independent padding paths
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(4), 3)
    q = jax.random.normal(kq, (2, 2, 40, 16))
    k = jax.random.normal(kk, (2, 2, 130, 16))
    v = jax.random.normal(kv, (2, 2, 130, 16))
    mask = jnp.arange(130)[None, :] < jnp.array([100, 130])[:, None]

    def loss_flash(q, k, v):
        return (flash_attention(q, k, v, mask=mask) ** 2).sum()

    def loss_xla(q, k, v):
        return (attend_xla(q, k, v, mask=mask) ** 2).sum()

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def test_attend_dispatch(qkv):
    q, k, v = qkv
    out = attend(q, k, v, backend="xla")
    out2 = attend(q, k, v, backend="flash")
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=2e-5)


def test_flash_backend_applies_dropout_via_xla_fallback():
    """Dropout must not be silently skipped on the flash backend: with a
    dropout key the output differs from the no-dropout output."""
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (1, 2, 64, 16))
    out_nodrop = attend(q, q, q, backend="flash")
    out_drop = attend(
        q, q, q, backend="flash", dropout=0.5,
        dropout_key=jax.random.PRNGKey(1),
    )
    assert not np.allclose(np.asarray(out_nodrop), np.asarray(out_drop))


def test_flash_fully_masked_rows_zero_and_no_grad_leak():
    """A batch element whose key mask is entirely False must produce zero
    output (not mean-of-v: NEG_INF is finite so naive online softmax emits
    p=1 per masked key) and must not leak gradients into masked k/v."""
    key = jax.random.PRNGKey(7)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (2, 2, 128, 32))
    k = jax.random.normal(kk, (2, 2, 128, 32))
    v = jax.random.normal(kv, (2, 2, 128, 32))
    mask = jnp.ones((2, 128), dtype=bool).at[1].set(False)  # element 1 all-masked

    out = flash_attention(q, k, v, mask=mask)
    assert float(jnp.abs(out[1]).max()) == 0.0
    # valid element matches XLA path
    ref = _ref_attention(q[:1], k[:1], v[:1])
    np.testing.assert_allclose(np.asarray(out[:1]), ref, atol=2e-5)

    def loss(k_, v_):
        return jnp.sum(flash_attention(q, k_, v_, mask=mask) ** 2)

    dk, dv = jax.grad(loss, argnums=(0, 1))(k, v)
    assert float(jnp.abs(dk[1]).max()) == 0.0, "grad leaked into fully-masked keys"
    assert float(jnp.abs(dv[1]).max()) == 0.0, "grad leaked into fully-masked values"


@pytest.mark.slow
def test_flash_partial_row_mask_grad_no_leak():
    """Masked key positions in a normally-masked batch receive zero dk/dv."""
    key = jax.random.PRNGKey(8)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (1, 2, 128, 32))
    k = jax.random.normal(kk, (1, 2, 128, 32))
    v = jax.random.normal(kv, (1, 2, 128, 32))
    mask = jnp.arange(128)[None, :] < 70

    def loss(k_, v_):
        return jnp.sum(flash_attention(q, k_, v_, mask=mask) ** 2)

    dk, dv = jax.grad(loss, argnums=(0, 1))(k, v)
    assert float(jnp.abs(dk[0, :, 70:]).max()) == 0.0
    assert float(jnp.abs(dv[0, :, 70:]).max()) == 0.0


# ------------------------- in-kernel dropout --------------------------- #


def test_flash_dropout_zero_rate_identical():
    key = jax.random.PRNGKey(3)
    q = jax.random.normal(key, (1, 2, 128, 32))
    a = flash_attention(q, q, q)
    b = flash_attention(q, q, q, dropout=0.0, dropout_key=jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_flash_dropout_deterministic_per_key():
    key = jax.random.PRNGKey(4)
    q = jax.random.normal(key, (1, 2, 128, 32))
    a = flash_attention(q, q, q, dropout=0.3, dropout_key=jax.random.PRNGKey(5))
    b = flash_attention(q, q, q, dropout=0.3, dropout_key=jax.random.PRNGKey(5))
    c = flash_attention(q, q, q, dropout=0.3, dropout_key=jax.random.PRNGKey(6))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))


@pytest.mark.slow
def test_flash_dropout_unbiased():
    """E[dropout attention] == no-dropout attention (keep/(1−r) scaling)."""
    key = jax.random.PRNGKey(8)
    q = jax.random.normal(key, (1, 1, 128, 32))
    base = np.asarray(flash_attention(q, q, q))
    acc = np.zeros_like(base)
    n_trials = 64
    for i in range(n_trials):
        acc += np.asarray(
            flash_attention(
                q, q, q, dropout=0.25, dropout_key=jax.random.PRNGKey(100 + i)
            )
        )
    mean = acc / n_trials
    # standard error scales with 1/sqrt(trials); loose bound on the mean
    assert np.abs(mean - base).mean() < 0.05, np.abs(mean - base).mean()


@pytest.mark.slow
def test_flash_dropout_grad_finite_difference():
    """With a fixed seed the dropped kernel is a deterministic function —
    its custom_vjp must match finite differences (verifies the backward
    regenerates the identical mask)."""
    key = jax.random.PRNGKey(9)
    q = jax.random.normal(key, (1, 1, 128, 32))
    k = jax.random.normal(jax.random.fold_in(key, 1), (1, 1, 128, 32))
    v = jax.random.normal(jax.random.fold_in(key, 2), (1, 1, 128, 32))
    dk_key = jax.random.PRNGKey(10)
    w = jax.random.normal(jax.random.fold_in(key, 3), (1, 1, 128, 32))

    def f(q_, k_, v_):
        out = flash_attention(q_, k_, v_, dropout=0.3, dropout_key=dk_key)
        return jnp.sum(out * w)

    grads = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    eps = 1e-3
    rng = np.random.RandomState(0)
    for argi, (arr, g) in enumerate(zip((q, k, v), grads)):
        for _ in range(3):
            idx = tuple(rng.randint(s) for s in arr.shape)
            pert = np.zeros(arr.shape, np.float32)
            pert[idx] = eps
            args_p = [q, k, v]
            args_m = [q, k, v]
            args_p[argi] = arr + pert
            args_m[argi] = arr - pert
            fd = (float(f(*args_p)) - float(f(*args_m))) / (2 * eps)
            an = float(np.asarray(g)[idx])
            assert abs(fd - an) < 2e-2 + 0.05 * abs(fd), (argi, idx, fd, an)


def test_flash_dropout_respects_mask():
    """Dropout must not resurrect masked keys: perturbing masked v stays
    invisible under dropout."""
    key = jax.random.PRNGKey(11)
    q = jax.random.normal(key, (1, 1, 128, 32))
    v = jax.random.normal(jax.random.fold_in(key, 1), (1, 1, 128, 32))
    mask = jnp.arange(128)[None, :] < 70
    dk_key = jax.random.PRNGKey(12)
    out1 = flash_attention(q, q, v, mask=mask, dropout=0.3, dropout_key=dk_key)
    v2 = v.at[0, :, 70:].set(55.0)
    out2 = flash_attention(q, q, v2, mask=mask, dropout=0.3, dropout_key=dk_key)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)


def test_threefry_uniformity():
    """The in-kernel counter-based generator produces roughly uniform bits."""
    from naturalspeech2_tpu.ops.flash_attention import _threefry2x32

    x0 = jnp.arange(1 << 14, dtype=jnp.uint32).reshape(128, 128)
    x1 = jnp.zeros((128, 128), jnp.uint32)
    bits, _ = _threefry2x32(jnp.uint32(123), jnp.uint32(456), x0, x1)
    u = np.asarray(bits).astype(np.float64) / 2**32
    assert abs(u.mean() - 0.5) < 0.01
    assert abs(u.std() - (1 / 12) ** 0.5) < 0.01
    # consecutive counters decorrelated
    flat = u.ravel()
    corr = np.corrcoef(flat[:-1], flat[1:])[0, 1]
    assert abs(corr) < 0.05


@pytest.mark.slow
def test_flash_multiblock_online_softmax_path():
    """n_kv > max block forces the online-softmax (multi-kv-block) kernel;
    it must match XLA (incl. mask + grads) — the one-shot fast path covers
    n_kv ≤ 1024, so this guards the blockwise machinery."""
    key = jax.random.PRNGKey(17)
    q = jax.random.normal(key, (1, 2, 256, 16))
    k = jax.random.normal(jax.random.fold_in(key, 1), (1, 2, 1536, 16))
    v = jax.random.normal(jax.random.fold_in(key, 2), (1, 2, 1536, 16))
    mask = jnp.arange(1536)[None, :] < 1200
    out = flash_attention(q, k, v, mask=mask)
    ref = attend_xla(q, k, v, mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def loss(q_, k_, v_):
        return jnp.sum(flash_attention(q_, k_, v_, mask=mask) ** 2)

    def loss_ref(q_, k_, v_):
        return jnp.sum(attend_xla(q_, k_, v_, mask=mask) ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)
