"""Tensor-parallel tests on the virtual 8-device CPU mesh: TP rules shard
the right params, a (data=2, model=4) train step runs, and TP results match
the pure-DP run numerically."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from naturalspeech2_tpu.models.codec import SoundStream
from naturalspeech2_tpu.models.denoiser import Model
from naturalspeech2_tpu.models.naturalspeech2 import NaturalSpeech2
from naturalspeech2_tpu.parallel.mesh import make_mesh
from naturalspeech2_tpu.parallel.tp import spec_for_path, state_shardings
from naturalspeech2_tpu.trainer import Trainer

# integration-scale: runs in the full (CI) matrix; 'pytest -m "not slow"' is the fast default
pytestmark = pytest.mark.slow



def tiny_ns2():
    codec = SoundStream(
        codebook_dim=16, channels=4, num_quantizers=2, codebook_size=16,
        use_pallas_rvq=False,
    )
    model = Model(dim=16, depth=2, heads=4, dim_head=8, wavenet_layers=2,
                  wavenet_stacks=2, use_flash_attn=False)
    return NaturalSpeech2(model=model, codec=codec, timesteps=4)


def batch_iter(batch, length):
    rng = np.random.RandomState(0)
    while True:
        yield rng.uniform(-1, 1, size=(batch, length)).astype(np.float32)


def test_spec_rules():
    leaf2 = jnp.zeros((8, 16))
    leaf1 = jnp.zeros((16,))
    assert spec_for_path("model/transformer/attn_0/to_q/kernel", leaf2) == P(None, "model")
    assert spec_for_path("model/transformer/attn_0/to_out/kernel", leaf2) == P("model", None)
    assert spec_for_path("model/transformer/ff_0/Dense_0/kernel", leaf2) == P(None, "model")
    assert spec_for_path("model/transformer/ff_0/Dense_1/kernel", leaf2) == P("model", None)
    assert spec_for_path("model/wavenet/stack_0/block_0/conv/Conv_0/kernel", leaf2) == P()
    assert spec_for_path("model/transformer/attn_norm_0/gamma", leaf1) == P()
    # adam mu mirrors the param path → same rule applies
    assert spec_for_path("1/0/mu/model/transformer/attn_0/to_q/kernel", leaf2) == P(None, "model")


def _run_steps(mesh, n_data, n_steps=2):
    ns2 = tiny_ns2()
    t = Trainer(
        ns2,
        batches=batch_iter(4, 640),
        train_batch_size=4,
        grad_accum_every=1,
        train_num_steps=n_steps,
        mesh=mesh,
        results_folder="/tmp/ns2_tp_test",
    )
    batch = next(t.batches)
    state = t.init_state(batch)
    step_fn = t.build_train_step()
    bsh = NamedSharding(mesh, P(None, "data"))
    metrics = None
    for i in range(n_steps):
        b = jax.device_put(np.reshape(batch, (1, 4, -1)), bsh)
        state, metrics = step_fn(state, b, jax.random.PRNGKey(7))
    return state, metrics


def test_tp_step_matches_dp():
    mesh_dp = make_mesh(n_data=4, n_model=1, devices=jax.devices()[:4])
    mesh_tp = make_mesh(n_data=2, n_model=4)
    state_dp, m_dp = _run_steps(mesh_dp, 4)
    state_tp, m_tp = _run_steps(mesh_tp, 2)
    np.testing.assert_allclose(
        float(m_dp["loss"]), float(m_tp["loss"]), rtol=2e-4
    )
    # parameters after identical steps agree
    for a, b in zip(
        jax.tree_util.tree_leaves(state_dp.params["model"]),
        jax.tree_util.tree_leaves(state_tp.params["model"]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_tp_params_actually_sharded():
    mesh = make_mesh(n_data=2, n_model=4)
    ns2 = tiny_ns2()
    t = Trainer(
        ns2, batches=batch_iter(4, 640), train_batch_size=4,
        mesh=mesh, results_folder="/tmp/ns2_tp_test2",
    )
    state = t.init_state(next(t.batches))
    qkern = state.params["model"]["transformer"]["attn_0"]["to_q"]["kernel"]
    assert qkern.sharding.spec == P(None, "model")
    # each shard holds 1/4 of the columns
    shard_shapes = {s.data.shape for s in qkern.addressable_shards}
    full = qkern.shape
    assert shard_shapes == {(full[0], full[1] // 4)}
