"""Trainer tests: jitted sharded train step over the 8-device CPU mesh,
EMA, checkpoint round-trip, data pipeline."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from naturalspeech2_tpu.models.codec import SoundStream
from naturalspeech2_tpu.models.denoiser import Model
from naturalspeech2_tpu.models.naturalspeech2 import NaturalSpeech2
from naturalspeech2_tpu.parallel.mesh import make_mesh
from naturalspeech2_tpu.trainer import Trainer, write_wav

# integration-scale: runs in the full (CI) matrix; 'pytest -m "not slow"' is the fast default
pytestmark = pytest.mark.slow



def tiny_ns2():
    codec = SoundStream(
        codebook_dim=16, channels=4, num_quantizers=2, codebook_size=16,
        use_pallas_rvq=False,
    )
    model = Model(dim=16, depth=1, heads=2, dim_head=8, wavenet_layers=2,
                  wavenet_stacks=2, use_flash_attn=False)
    return NaturalSpeech2(model=model, codec=codec, timesteps=4)


def batch_iter(batch, length):
    rng = np.random.RandomState(0)
    while True:
        yield rng.uniform(-1, 1, size=(batch, length)).astype(np.float32)


@pytest.fixture(scope="module")
def trainer(tmp_path_factory):
    ns2 = tiny_ns2()
    t = Trainer(
        ns2,
        batches=batch_iter(8 * 2, 640),
        train_batch_size=8,
        grad_accum_every=2,
        ema_update_every=2,
        train_num_steps=3,
        save_and_sample_every=100,
        results_folder=str(tmp_path_factory.mktemp("results")),
        sample_length=2,
        mesh=make_mesh(n_data=8),
    )
    return t


def test_train_steps_reduce_loss_and_update(trainer):
    batch = next(trainer.batches)
    state = trainer.init_state(batch)
    step_fn = trainer.build_train_step()
    p0 = jax.tree_util.tree_leaves(state.params['model'])[0].copy()

    b = np.reshape(batch, (2, 8, -1))
    key = jax.random.PRNGKey(0)
    state, metrics = step_fn(state, jnp.asarray(b), key)
    assert int(state.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    trainer.state = state
    p1 = jax.tree_util.tree_leaves(state.params['model'])[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))


def test_ema_updates_on_schedule(trainer):
    # step 1 (odd): ema untouched; step 2: ema moves (update_every=2)
    state = trainer.state
    ema0 = jax.tree_util.tree_leaves(state.ema_params['model'])[0].copy()
    batch = jnp.asarray(np.reshape(next(trainer.batches), (2, 8, -1)))
    state, _ = trainer._jit_train_step(state, batch, jax.random.PRNGKey(1))
    assert int(state.step) == 2
    ema1 = jax.tree_util.tree_leaves(state.ema_params['model'])[0]
    assert not np.array_equal(np.asarray(ema0), np.asarray(ema1))
    trainer.state = state


def test_checkpoint_roundtrip(trainer):
    path = trainer.save("test")
    state_before = trainer.state
    # perturb then restore
    trainer.state = trainer.state.replace(
        params=jax.tree_util.tree_map(lambda p: p * 0, trainer.state.params)
    )
    trainer.load(path)
    for a, b in zip(
        jax.tree_util.tree_leaves(state_before.params),
        jax.tree_util.tree_leaves(trainer.state.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert int(trainer.state.step) == int(state_before.step)


def test_full_train_loop(tmp_path):
    ns2 = tiny_ns2()
    t = Trainer(
        ns2,
        batches=batch_iter(4, 640),
        train_batch_size=4,
        grad_accum_every=1,
        train_num_steps=2,
        save_and_sample_every=100,
        results_folder=str(tmp_path),
        sample_length=2,
        mesh=make_mesh(n_data=4, devices=jax.devices()[:4]),
    )
    t.train(log_every=1)
    assert int(t.state.step) == 2


def test_chunked_dispatch_train_loop(tmp_path):
    """steps_per_dispatch=2: one device dispatch per 2 optimizer steps, with
    periodic actions fired on boundary crossings inside the chunk."""
    ns2 = tiny_ns2()
    t = Trainer(
        ns2,
        batches=batch_iter(4, 640),
        train_batch_size=4,
        grad_accum_every=1,
        train_num_steps=4,
        save_and_sample_every=3,  # crossed mid-chunk (steps 2→4)
        results_folder=str(tmp_path),
        sample_length=2,
        mesh=make_mesh(n_data=4, devices=jax.devices()[:4]),
        steps_per_dispatch=2,
    )
    t.train(log_every=2)
    assert int(t.state.step) == 4
    # milestone 1 (step 3) fired inside the second chunk
    assert (tmp_path / "model-1.ckpt").exists()
    assert (tmp_path / "metrics.jsonl").exists()


def test_skip_nonfinite_updates(tmp_path):
    """A NaN batch must not touch params/opt state when the guard is on;
    the next clean batch applies normally."""
    ns2 = tiny_ns2()
    t = Trainer(
        ns2,
        batches=batch_iter(4, 640),
        train_batch_size=4,
        grad_accum_every=1,
        train_num_steps=4,
        save_and_sample_every=10**9,
        results_folder=str(tmp_path),
        sample_length=2,
        mesh=make_mesh(n_data=4, devices=jax.devices()[:4]),
        skip_nonfinite_updates=True,
    )
    batch = next(t.batches)
    state = t.init_state(batch)
    step_fn = t.build_train_step()
    p0 = np.asarray(jax.tree_util.tree_leaves(state.params["model"])[0])

    bad = np.reshape(batch, (1, 4, -1)).copy()
    bad[0, 0, :10] = np.nan
    state, metrics = step_fn(state, jnp.asarray(bad), jax.random.PRNGKey(0))
    assert float(metrics["skipped"]) == 1.0
    p1 = np.asarray(jax.tree_util.tree_leaves(state.params["model"])[0])
    np.testing.assert_array_equal(p0, p1)
    assert int(state.step) == 1  # step still advances

    good = np.reshape(next(t.batches), (1, 4, -1))
    state, metrics = step_fn(state, jnp.asarray(good), jax.random.PRNGKey(1))
    assert float(metrics["skipped"]) == 0.0
    assert np.isfinite(float(metrics["loss"]))
    p2 = np.asarray(jax.tree_util.tree_leaves(state.params["model"])[0])
    assert not np.array_equal(p1, p2)


def test_validation_loop(tmp_path):
    """val_batches + validate_every: val_loss is logged at boundaries and
    is deterministic across evals at the same params."""
    import json

    ns2 = tiny_ns2()
    t = Trainer(
        ns2,
        batches=batch_iter(4, 640),
        val_batches=batch_iter(4, 640),
        validate_every=2,
        train_batch_size=4,
        grad_accum_every=1,
        train_num_steps=2,
        save_and_sample_every=10**9,
        results_folder=str(tmp_path),
        sample_length=2,
        mesh=make_mesh(n_data=4, devices=jax.devices()[:4]),
    )
    t.train(log_every=1)
    lines = [
        json.loads(l)
        for l in (tmp_path / "metrics.jsonl").read_text().splitlines()
    ]
    vals = [l for l in lines if "val_loss" in l]
    assert vals and np.isfinite(vals[0]["val_loss"])
    # deterministic given fixed params + fixed eval PRNG + same batch seq:
    # val_batches iterates, so compare two evaluate() calls on fresh iters
    t.val_batches = batch_iter(4, 640)
    a = t.evaluate()["val_loss"]
    t.val_batches = batch_iter(4, 640)
    b = t.evaluate()["val_loss"]
    assert a == b


def test_lr_schedule_warmup_freezes_then_moves(tmp_path):
    """cosine schedule with warmup: step 1 runs at lr≈0 (params barely
    move), later steps apply a real lr."""
    ns2 = tiny_ns2()
    t = Trainer(
        ns2,
        batches=batch_iter(4, 640),
        train_batch_size=4,
        grad_accum_every=1,
        train_num_steps=100,
        save_and_sample_every=10**9,
        results_folder=str(tmp_path),
        sample_length=2,
        mesh=make_mesh(n_data=4, devices=jax.devices()[:4]),
        lr_schedule="cosine",
        warmup_steps=50,
    )
    batch = next(t.batches)
    state = t.init_state(batch)
    step_fn = t.build_train_step()
    p0 = np.asarray(jax.tree_util.tree_leaves(state.params["model"])[0])
    b = jnp.asarray(np.reshape(batch, (1, 4, -1)))
    state, _ = step_fn(state, b, jax.random.PRNGKey(0))
    p1 = np.asarray(jax.tree_util.tree_leaves(state.params["model"])[0])
    # warmup step 0: lr = 0 exactly → no movement
    np.testing.assert_allclose(p0, p1, atol=1e-7)
    for i in range(3):
        state, _ = step_fn(
            state, jnp.asarray(np.reshape(next(t.batches), (1, 4, -1))),
            jax.random.PRNGKey(1 + i),
        )
    p4 = np.asarray(jax.tree_util.tree_leaves(state.params["model"])[0])
    assert not np.allclose(p1, p4, atol=1e-7)


def test_chunked_dispatch_requires_whole_chunks():
    with pytest.raises(AssertionError, match="whole dispatch chunks"):
        Trainer(
            tiny_ns2(),
            batches=batch_iter(4, 640),
            train_batch_size=4,
            train_num_steps=5,
            steps_per_dispatch=2,
        )


def test_write_wav(tmp_path):
    path = tmp_path / "x.wav"
    write_wav(path, np.sin(np.linspace(0, 100, 2400)), 24000)
    from naturalspeech2_tpu.data import load_audio

    audio, sr = load_audio(str(path))
    assert sr == 24000
    assert abs(len(audio) - 2400) <= 1


def test_sound_dataset(tmp_path):
    from naturalspeech2_tpu.data import SoundDataset, data_loader

    for i in range(3):
        write_wav(tmp_path / f"a{i}.wav", np.random.uniform(-1, 1, 5000), 24000)
    ds = SoundDataset(str(tmp_path), max_length=3200, seq_len_multiple_of=320)
    assert len(ds) == 3
    x = ds[0]
    assert x.shape == (3200,)
    batch = next(data_loader(ds, batch_size=2))
    assert batch.shape == (2, 3200)


def test_sound_dataset_split(tmp_path):
    """Deterministic hash split: disjoint, covering, stable."""
    from naturalspeech2_tpu.data import SoundDataset

    for i in range(40):
        write_wav(tmp_path / f"f{i:02d}.wav", np.zeros(1000, np.float32), 24000)
    train = SoundDataset(str(tmp_path), max_length=640, split="train",
                         val_fraction=0.2)
    val = SoundDataset(str(tmp_path), max_length=640, split="val",
                       val_fraction=0.2)
    both = SoundDataset(str(tmp_path), max_length=640)
    assert len(train) + len(val) == len(both) == 40
    assert len(val) > 0
    assert set(map(str, train.paths)).isdisjoint(set(map(str, val.paths)))
    # stable across instantiations
    val2 = SoundDataset(str(tmp_path), max_length=640, split="val",
                        val_fraction=0.2)
    assert list(map(str, val.paths)) == list(map(str, val2.paths))


def test_data_loader_rejects_tiny_dataset(tmp_path):
    """drop_last=True with len(dataset) < batch_size must raise loudly, not
    hang the consumer forever (ADVICE r1)."""
    import pytest as _pytest

    from naturalspeech2_tpu.data import SoundDataset, data_loader
    from naturalspeech2_tpu.trainer import write_wav

    write_wav(str(tmp_path / "a.wav"), np.zeros(640, np.float32), 24000)
    ds = SoundDataset(str(tmp_path), max_length=640)
    with _pytest.raises(ValueError, match="drop_last"):
        next(data_loader(ds, batch_size=4))
