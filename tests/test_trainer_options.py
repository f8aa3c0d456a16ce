"""Trainer AMP (bf16) and remat options; few-step sampling override."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from naturalspeech2_tpu.models.codec import SoundStream
from naturalspeech2_tpu.models.denoiser import Model
from naturalspeech2_tpu.models.naturalspeech2 import NaturalSpeech2, sample
from naturalspeech2_tpu.parallel.mesh import make_mesh
from naturalspeech2_tpu.trainer import Trainer

# integration-scale: runs in the full (CI) matrix; 'pytest -m "not slow"' is the fast default
pytestmark = pytest.mark.slow



def tiny_ns2():
    codec = SoundStream(
        codebook_dim=16, channels=4, num_quantizers=2, codebook_size=16,
        use_pallas_rvq=False,
    )
    model = Model(dim=16, depth=1, heads=2, dim_head=8, wavenet_layers=2,
                  wavenet_stacks=2, use_flash_attn=False)
    return NaturalSpeech2(model=model, codec=codec, timesteps=8)


def batch_iter(batch, length):
    rng = np.random.RandomState(0)
    while True:
        yield rng.uniform(-1, 1, size=(batch, length)).astype(np.float32)


@pytest.mark.parametrize("amp,remat", [(True, False), (False, True)])
def test_trainer_amp_and_remat(tmp_path, amp, remat):
    t = Trainer(
        tiny_ns2(),
        batches=batch_iter(4, 640),
        train_batch_size=4,
        train_num_steps=1,
        amp=amp,
        remat=remat,
        results_folder=str(tmp_path),
        mesh=make_mesh(n_data=4, devices=jax.devices()[:4]),
    )
    t.train(log_every=1)
    assert int(t.state.step) == 1
    # params stay f32 master copies
    leaf = jax.tree_util.tree_leaves(t.state.params["model"])[0]
    assert leaf.dtype == jnp.float32


def test_few_step_sampling_override():
    ns2 = tiny_ns2()
    audio = jax.random.uniform(jax.random.PRNGKey(0), (1, 640), minval=-1, maxval=1)
    key = jax.random.PRNGKey(0)
    variables = ns2.init({"params": key, "times": key, "noise": key}, audio)
    codec_full = ns2.codec.init(key, audio)
    params = dict(variables["params"])
    params["codec"] = codec_full["params"]
    variables = {"params": params}
    out = sample(ns2, variables, key, length=4, timesteps=2)
    assert out.shape == (1, 1280)
    assert np.isfinite(np.asarray(out)).all()
