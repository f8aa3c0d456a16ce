"""Sequence/context parallelism on the 8-device CPU mesh: sp_attend matches
full attention; the whole denoiser runs correctly with its input sharded
over the sequence axis (GSPMD conv halo exchange)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from naturalspeech2_tpu.ops.attention import attend_xla
from naturalspeech2_tpu.parallel.mesh import make_mesh
from naturalspeech2_tpu.parallel.sp import sp_attend

# integration-scale: runs in the full (CI) matrix; 'pytest -m "not slow"' is the fast default
pytestmark = pytest.mark.slow


KEY = jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(n_data=8)


def test_sp_attend_matches_full(mesh):
    q = jax.random.normal(KEY, (2, 4, 64, 16))
    k = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 64, 16))
    v = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 64, 16))
    out_sp = sp_attend(q, k, v, mesh=mesh)
    out_full = attend_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(out_sp), np.asarray(out_full), atol=2e-5)


def test_sp_attend_masked(mesh):
    q = jax.random.normal(KEY, (2, 2, 64, 8))
    mask = jnp.arange(64)[None, :] < jnp.array([40, 64])[:, None]
    out_sp = sp_attend(q, q, q, mesh=mesh, mask=mask)
    out_full = attend_xla(q, q, q, mask=mask)
    np.testing.assert_allclose(np.asarray(out_sp), np.asarray(out_full), atol=2e-5)


def test_sp_attend_causal(mesh):
    q = jax.random.normal(KEY, (1, 2, 64, 8))
    out_sp = sp_attend(q, q, q, mesh=mesh, causal=True)
    out_full = attend_xla(q, q, q, causal=True)
    np.testing.assert_allclose(np.asarray(out_sp), np.asarray(out_full), atol=2e-5)


def test_sp_attend_output_stays_sharded(mesh):
    q = jax.device_put(
        jax.random.normal(KEY, (2, 2, 64, 8)),
        NamedSharding(mesh, P(None, None, "data", None)),
    )
    out = jax.jit(lambda q: sp_attend(q, q, q, mesh=mesh))(q)
    assert out.sharding.spec == P(None, None, "data", None)
    # each shard holds 1/8 of the sequence
    shapes = {s.data.shape for s in out.addressable_shards}
    assert shapes == {(2, 2, 8, 8)}


def test_denoiser_sequence_sharded_forward(mesh):
    """GSPMD whole-model sequence sharding: jit with the input constrained
    to P(None, 'data', None) — conv halos inserted by XLA — must equal the
    replicated forward."""
    from naturalspeech2_tpu.models.denoiser import Model

    model = Model(dim=16, depth=1, heads=2, dim_head=8, wavenet_layers=2,
                  wavenet_stacks=2, use_flash_attn=False)
    x = jax.random.normal(KEY, (2, 64, 16))
    times = jnp.array([0.3, 0.6])
    params = model.init(KEY, x, times)

    ref = model.apply(params, x, times)

    seq_sh = NamedSharding(mesh, P(None, "data", None))
    x_sharded = jax.device_put(x, seq_sh)
    out = jax.jit(
        lambda p, x: model.apply(p, x, times),
        in_shardings=(NamedSharding(mesh, P()), seq_sh),
    )(params, x_sharded)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ulysses_attend_matches_full(mesh):
    from naturalspeech2_tpu.parallel.sp import ulysses_attend

    q = jax.random.normal(KEY, (2, 8, 64, 16))
    k = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 64, 16))
    v = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 64, 16))
    out = ulysses_attend(q, k, v, mesh=mesh)
    ref = attend_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ulysses_attend_masked_causal(mesh):
    from naturalspeech2_tpu.parallel.sp import ulysses_attend

    q = jax.random.normal(KEY, (2, 8, 64, 16))
    mask = jnp.arange(64)[None, :] < jnp.array([40, 64])[:, None]
    out = ulysses_attend(q, q, q, mesh=mesh, mask=mask, causal=True)
    ref = attend_xla(q, q, q, mask=mask, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


# ------------------------------ ring attention -------------------------- #


def test_ring_attend_matches_full(mesh):
    from naturalspeech2_tpu.parallel.sp import ring_attend

    q = jax.random.normal(KEY, (2, 4, 64, 16))
    k = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 64, 16))
    v = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 64, 16))
    out = ring_attend(q, k, v, mesh=mesh)
    ref = attend_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ring_attend_masked(mesh):
    from naturalspeech2_tpu.parallel.sp import ring_attend

    q = jax.random.normal(KEY, (2, 2, 64, 8))
    mask = jnp.arange(64)[None, :] < jnp.array([40, 64])[:, None]
    out = ring_attend(q, q, q, mesh=mesh, mask=mask)
    ref = attend_xla(q, q, q, mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ring_attend_causal(mesh):
    from naturalspeech2_tpu.parallel.sp import ring_attend

    q = jax.random.normal(KEY, (1, 2, 64, 8))
    out = ring_attend(q, q, q, mesh=mesh, causal=True)
    ref = attend_xla(q, q, q, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ring_attend_fully_masked_batch_row(mesh):
    from naturalspeech2_tpu.parallel.sp import ring_attend

    q = jax.random.normal(KEY, (2, 2, 64, 8))
    mask = jnp.ones((2, 64), bool).at[1].set(False)
    out = ring_attend(q, q, q, mesh=mesh, mask=mask)
    assert float(jnp.abs(out[1]).max()) == 0.0


def test_ring_attend_output_stays_sharded(mesh):
    from naturalspeech2_tpu.parallel.sp import ring_attend

    q = jax.device_put(
        jax.random.normal(KEY, (1, 2, 64, 8)),
        NamedSharding(mesh, P(None, None, "data", None)),
    )
    out = jax.jit(lambda q: ring_attend(q, q, q, mesh=mesh))(q)
    assert out.sharding.spec == P(None, None, "data", None)


# ------------------- flash kernel composed with shard_map ------------------ #
# backend="flash" forces the Pallas kernel inside the shard_map body
# (interpret mode on this CPU mesh; the same code path compiles on TPU —
# VERDICT r2 item 4). Equivalence vs the XLA twin at tight tolerance.


def test_sp_attend_flash_matches_xla(mesh):
    q = jax.random.normal(KEY, (2, 4, 64, 16))
    k = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 64, 16))
    v = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 64, 16))
    out_flash = sp_attend(q, k, v, mesh=mesh, backend="flash")
    out_xla = sp_attend(q, k, v, mesh=mesh, backend="xla")
    np.testing.assert_allclose(
        np.asarray(out_flash), np.asarray(out_xla), atol=2e-5
    )


def test_sp_attend_flash_masked(mesh):
    q = jax.random.normal(KEY, (2, 2, 64, 8))
    mask = jnp.arange(64)[None, :] < jnp.array([40, 64])[:, None]
    out_flash = sp_attend(q, q, q, mesh=mesh, mask=mask, backend="flash")
    out_full = attend_xla(q, q, q, mask=mask)
    np.testing.assert_allclose(
        np.asarray(out_flash), np.asarray(out_full), atol=2e-5
    )


def test_sp_attend_flash_grads_match(mesh):
    """flash_attention's custom_vjp composes with shard_map: gradients
    through the sharded flash path equal the XLA twin's."""
    q = jax.random.normal(KEY, (1, 2, 32, 8))

    def loss(backend, x):
        return (sp_attend(x, x, x, mesh=mesh, backend=backend) ** 2).sum()

    g_flash = jax.grad(lambda x: loss("flash", x))(q)
    g_xla = jax.grad(lambda x: loss("xla", x))(q)
    np.testing.assert_allclose(
        np.asarray(g_flash), np.asarray(g_xla), atol=5e-5
    )


def test_sp_attend_causal_stays_on_xla(mesh):
    """Causal has no flash path (no global-row-offset input) — 'flash'
    silently resolves to the XLA body and stays correct."""
    q = jax.random.normal(KEY, (1, 2, 64, 8))
    out = sp_attend(q, q, q, mesh=mesh, causal=True, backend="flash")
    out_full = attend_xla(q, q, q, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_full), atol=2e-5)


def test_ring_attend_flash_matches_xla(mesh):
    from naturalspeech2_tpu.parallel.sp import ring_attend

    q = jax.random.normal(KEY, (2, 2, 64, 16))
    k = jax.random.normal(jax.random.PRNGKey(1), (2, 2, 64, 16))
    v = jax.random.normal(jax.random.PRNGKey(2), (2, 2, 64, 16))
    out_flash = ring_attend(q, k, v, mesh=mesh, backend="flash")
    out_xla = ring_attend(q, k, v, mesh=mesh, backend="xla")
    np.testing.assert_allclose(
        np.asarray(out_flash), np.asarray(out_xla), atol=2e-5
    )


def test_ring_attend_flash_masked(mesh):
    from naturalspeech2_tpu.parallel.sp import ring_attend

    q = jax.random.normal(KEY, (2, 2, 64, 8))
    # mask out entire shards for row 0 (shards hold 8 frames each) — the
    # fully-masked-hop path (lse == NEG_INF) must vanish from the combine
    mask = jnp.arange(64)[None, :] < jnp.array([24, 64])[:, None]
    out_flash = ring_attend(q, q, q, mesh=mesh, mask=mask, backend="flash")
    out_full = attend_xla(q, q, q, mask=mask)
    np.testing.assert_allclose(
        np.asarray(out_flash), np.asarray(out_full), atol=2e-5
    )
