"""Codec pre-training: loss decreases over steps, codebooks move via EMA
assignment statistics, multi-res STFT loss behaves."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from naturalspeech2_tpu.codec_trainer import CodecTrainer
from naturalspeech2_tpu.models.codec import SoundStream
from naturalspeech2_tpu.ops.stft_loss import multi_resolution_stft_loss
from naturalspeech2_tpu.parallel.mesh import make_mesh


def test_stft_loss_zero_for_identical():
    audio = jax.random.uniform(jax.random.PRNGKey(0), (2, 2048), minval=-1, maxval=1)
    assert float(multi_resolution_stft_loss(audio, audio)) < 1e-5
    other = jax.random.uniform(jax.random.PRNGKey(1), (2, 2048), minval=-1, maxval=1)
    assert float(multi_resolution_stft_loss(audio, other)) > 0.1


def test_codec_training_reduces_loss(tmp_path):
    rng = np.random.RandomState(0)
    # a fixed small dataset of tonal audio the codec can overfit slightly
    t = np.arange(1280) / 24000.0
    base = np.stack([
        0.5 * np.sin(2 * np.pi * f * t) for f in (220.0, 330.0, 440.0, 550.0)
    ]).astype(np.float32)

    def batches():
        while True:
            yield base

    codec = SoundStream(
        codebook_dim=16, channels=4, num_quantizers=2, codebook_size=16,
        use_pallas_rvq=False,
    )
    trainer = CodecTrainer(
        codec,
        batches=batches(),
        lr=1e-3,
        mesh=make_mesh(n_data=4, devices=jax.devices()[:4]),
        results_folder=str(tmp_path),
    )
    state = trainer.init_state(base)
    cb_before = np.asarray(state.params["codebooks"])
    losses = []
    step_fn = jax.jit(trainer._train_step, donate_argnums=(0,))
    for i in range(30):
        state, metrics = step_fn(state, jnp.asarray(base))
        losses.append(float(metrics["loss"]))
    trainer.state = state
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses
    # codebooks moved via EMA assignment updates
    cb_after = np.asarray(state.params["codebooks"])
    assert not np.allclose(cb_before, cb_after)
    # checkpoint writes
    path = trainer.save("t")
    assert path.endswith(".ckpt")
