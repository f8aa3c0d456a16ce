"""Conditional training through the Trainer (dict batches with
audio+text+prompt) — a capability the reference Trainer lacks."""

import numpy as np
import jax
import pytest

from naturalspeech2_tpu.parallel.mesh import make_mesh
from naturalspeech2_tpu.trainer import Trainer

from tests.test_conditional import cond_ns2

# integration-scale: runs in the full (CI) matrix; 'pytest -m "not slow"' is the fast default
pytestmark = pytest.mark.slow



def cond_batches(b, audio_len, prompt_len, text_len):
    rng = np.random.RandomState(0)
    while True:
        yield {
            "audio": rng.uniform(-1, 1, (b, audio_len)).astype(np.float32),
            "text": rng.randint(0, 20, (b, text_len)).astype(np.int32),
            "text_lens": np.full((b,), text_len, np.int32),
            "prompt": rng.uniform(-1, 1, (b, prompt_len)).astype(np.float32),
        }


def test_conditional_trainer_step(tmp_path):
    ns2 = cond_ns2()
    t = Trainer(
        ns2,
        batches=cond_batches(4, 4 * 320, 2 * 320, 5),
        train_batch_size=4,
        grad_accum_every=1,
        train_num_steps=2,
        results_folder=str(tmp_path),
        mesh=make_mesh(n_data=4, devices=jax.devices()[:4]),
    )
    t.train(log_every=1)
    assert int(t.state.step) == 2
    # conditional submodules were trained (params exist and changed)
    assert "phoneme_enc" in t.state.params


def test_conditional_milestone_sampling(tmp_path):
    """The trainer generates the held-back (prompt, text) pair at each
    milestone for conditional models (the reference crashes here,
    naturalspeech2_pytorch.py:1915-1918)."""
    ns2 = cond_ns2()
    t = Trainer(
        ns2,
        batches=cond_batches(4, 4 * 320, 2 * 320, 5),
        train_batch_size=4,
        grad_accum_every=1,
        train_num_steps=2,
        save_and_sample_every=2,
        sample_length=4,
        results_folder=str(tmp_path),
        mesh=make_mesh(n_data=4, devices=jax.devices()[:4]),
    )
    t.train(log_every=1)
    wav = tmp_path / "sample-1.wav"
    assert wav.exists(), list(tmp_path.iterdir())
    from naturalspeech2_tpu.data import load_audio

    audio, sr = load_audio(str(wav))
    assert np.all(np.isfinite(audio)) and len(audio) > 0
