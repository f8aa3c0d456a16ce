"""Elastic restart: a new Trainer in the same results folder resumes from
the latest checkpoint automatically."""

import numpy as np
import jax
import pytest

from naturalspeech2_tpu.parallel.mesh import make_mesh
from naturalspeech2_tpu.trainer import Trainer

from tests.test_trainer import batch_iter, tiny_ns2

# integration-scale: runs in the full (CI) matrix; 'pytest -m "not slow"' is the fast default
pytestmark = pytest.mark.slow



def make_trainer(tmp_path, steps):
    return Trainer(
        tiny_ns2(),
        batches=batch_iter(4, 640),
        train_batch_size=4,
        train_num_steps=steps,
        save_and_sample_every=2,
        sample_length=2,
        results_folder=str(tmp_path),
        mesh=make_mesh(n_data=4, devices=jax.devices()[:4]),
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
