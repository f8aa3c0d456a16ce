"""Elastic restart: a new Trainer in the same results folder resumes from
the latest checkpoint automatically."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from naturalspeech2_tpu.parallel.mesh import make_mesh
from naturalspeech2_tpu.trainer import Trainer

from tests.test_trainer import batch_iter, tiny_ns2

# integration-scale: runs in the full (CI) matrix; 'pytest -m "not slow"' is the fast default
pytestmark = pytest.mark.slow



def make_trainer(tmp_path, steps, backend="msgpack"):
    return Trainer(
        tiny_ns2(),
        batches=batch_iter(4, 640),
        train_batch_size=4,
        train_num_steps=steps,
        save_and_sample_every=2,
        sample_length=2,
        results_folder=str(tmp_path),
        mesh=make_mesh(n_data=4, devices=jax.devices()[:4]),
        checkpoint_backend=backend,
    )


def test_auto_resume(tmp_path):
    t1 = make_trainer(tmp_path, steps=2)
    t1.train(log_every=1)  # saves model-1.ckpt at step 2
    assert t1.latest_checkpoint() is not None
    params_after = jax.tree_util.tree_leaves(t1.state.params["model"])[0]

    # simulate a crash: brand-new trainer, same folder → resumes at step 2
    t2 = make_trainer(tmp_path, steps=4)
    t2.train(log_every=1)
    assert int(t2.state.step) == 4


def test_orbax_checkpoint_roundtrip(tmp_path):
    """checkpoint_backend='orbax' saves a directory checkpoint that resumes
    identically to the msgpack path (sharding re-applied by load)."""
    t = make_trainer(tmp_path, steps=2, backend="orbax")
    batch = next(t.batches)
    state = t.init_state(batch)
    step = t.build_train_step()
    b = jnp.asarray(batch).reshape(1, 4, -1)
    t.state, _ = step(t.state, b, jax.random.PRNGKey(0))
    path = t.save(1)
    assert path.endswith(".orbax")

    t2 = make_trainer(tmp_path, steps=2, backend="orbax")
    t2.init_state(batch)
    assert t2.latest_checkpoint() == path
    t2.load(path)
    assert int(t2.state.step) == int(t.state.step)
    for a, c in zip(
        jax.tree_util.tree_leaves(t.state.params),
        jax.tree_util.tree_leaves(t2.state.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=0)
