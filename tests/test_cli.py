"""CLI tests: `ns2-tpu train` → checkpoint → `ns2-tpu sample` → wav, config
validation, and the torch-checkpoint conversion path (all CPU, tiny configs).
"""

import json

import numpy as np
import pytest

from naturalspeech2_tpu import cli
from naturalspeech2_tpu.trainer import write_wav

pytestmark = pytest.mark.slow

TINY = {
    "codec": {
        "type": "soundstream",
        "codebook_dim": 16,
        "channels": 4,
        "num_quantizers": 2,
        "codebook_size": 16,
        "use_pallas_rvq": False,
    },
    "model": {
        "dim": 16,
        "depth": 1,
        "heads": 2,
        "dim_head": 8,
        "wavenet_layers": 2,
        "wavenet_stacks": 2,
        "use_flash_attn": False,
    },
    "ns2": {"timesteps": 4},
    "trainer": {"sample_length": 4},
}


@pytest.fixture()
def wav_folder(tmp_path):
    folder = tmp_path / "wavs"
    folder.mkdir()
    rng = np.random.RandomState(0)
    for i in range(4):
        write_wav(folder / f"a{i}.wav", rng.uniform(-1, 1, 4000), 24000)
    return folder


def test_train_then_sample(tmp_path, wav_folder):
    cfg_path = tmp_path / "tiny.json"
    cfg_path.write_text(json.dumps(TINY))
    results = tmp_path / "results"

    rc = cli.main([
        "train", "--folder", str(wav_folder), "--config", str(cfg_path),
        "--steps", "2", "--batch-size", "2", "--save-every", "2",
        "--results", str(results), "--data-seconds", "0.04",
        "--log-every", "1", "--mesh-data", "2",
    ])
    assert rc == 0
    ckpt = results / "model-1.ckpt"
    assert ckpt.exists()
    assert (results / "sample-1.wav").exists()

    out = tmp_path / "out"
    rc = cli.main([
        "sample", "--checkpoint", str(ckpt), "--config", str(cfg_path),
        "--out", str(out), "--length", "4", "--batch", "2",
        "--timesteps", "2",
    ])
    assert rc == 0
    wavs = sorted(out.glob("sample-*.wav"))
    assert len(wavs) == 2
    from naturalspeech2_tpu.data import load_audio

    audio, sr = load_audio(str(wavs[0]))
    assert sr == 24000
    assert len(audio) > 0


def test_codec_train_cli(tmp_path, wav_folder):
    cfg_path = tmp_path / "tiny.json"
    cfg_path.write_text(json.dumps({"codec": TINY["codec"]}))
    results = tmp_path / "results_codec"
    rc = cli.main([
        "codec-train", "--folder", str(wav_folder), "--config", str(cfg_path),
        "--steps", "4", "--batch-size", "2", "--save-every", "2",
        "--data-seconds", "0.04", "--results", str(results),
        "--steps-per-dispatch", "2", "--mesh-data", "2",
    ])
    assert rc == 0
    ckpts = sorted(results.glob("codec-*.ckpt"))
    assert len(ckpts) >= 2  # one per save_every segment


CONDITIONAL = {
    "codec": TINY["codec"],
    "model": {
        **TINY["model"],
        "wavenet_layers": 1,
        "wavenet_stacks": 1,
        "condition_on_prompt": True,
        "dim_prompt": 24,
        "num_latents_m": 4,
        "resampler_depth": 1,
    },
    "ns2": {
        "timesteps": 4,
        "duration_pitch_dim": 24,
        "aligner_dim_in": 8,
        "aligner_dim_hidden": 24,
        "aligner_attn_channels": 8,
        "pitch_emb_dim": 32,
        "pitch_emb_pp_hidden_dim": 24,
        "phoneme_enc_kwargs": dict(dim=24, dim_hidden=24, kernel_size=3,
                                   depth=1, dim_head=8, heads=2,
                                   use_flash=False),
        "prompt_enc_kwargs": dict(dims=(24, 24), depth=1, heads=2, dim_head=8,
                                  kernel_size=3, use_flash_attn=False),
        "duration_pitch_kwargs": dict(dim_encoded_prompts=24, depth=1,
                                      kernel_size=3, heads=2, dim_head=8,
                                      dim_hidden=24, use_flash_attn=False,
                                      num_convolutions_per_block=1,
                                      num_convs_per_resnet_block=1),
    },
    "trainer": {"sample_length": 4},
}


def test_conditional_sample_from_text_and_prompt(tmp_path, wav_folder):
    """`ns2-tpu sample --text --prompt` on a conditional checkpoint: the
    checkpoint here is a fresh init written through the Trainer save path."""
    import jax

    from naturalspeech2_tpu.parallel.mesh import make_mesh
    from naturalspeech2_tpu.trainer import Trainer

    cfg_path = tmp_path / "cond.json"
    cfg_path.write_text(json.dumps(CONDITIONAL))

    ns2 = cli.build_ns2(cli.load_config(str(cfg_path)))
    assert ns2.conditional
    trainer = Trainer(
        ns2,
        batches=cli._dummy_batches(ns2, 640),
        train_batch_size=1,
        save_and_sample_every=10**9,
        results_folder=str(tmp_path / "results"),
        mesh=make_mesh(n_data=1, devices=jax.devices()[:1]),
    )
    trainer.init_state(next(trainer.batches))
    ckpt = trainer.save(0)

    out = tmp_path / "out"
    rc = cli.main([
        "sample", "--checkpoint", ckpt, "--config", str(cfg_path),
        "--out", str(out), "--length", "4", "--timesteps", "2",
        "--cfg-interval", "0.1", "0.8",
        "--text", "hello world", "--prompt",
        str(sorted(wav_folder.glob("*.wav"))[0]),
    ])
    assert rc == 0
    wavs = sorted(out.glob("sample-*.wav"))
    assert len(wavs) == 1


def test_build_engine_from_checkpoint(tmp_path):
    """The `serve` glue: conditional checkpoint + config → working engine."""
    import jax

    from naturalspeech2_tpu.parallel.mesh import make_mesh
    from naturalspeech2_tpu.trainer import Trainer

    cfg_path = tmp_path / "cond.json"
    cfg_path.write_text(json.dumps(CONDITIONAL))
    ns2 = cli.build_ns2(cli.load_config(str(cfg_path)))
    trainer = Trainer(
        ns2,
        batches=cli._dummy_batches(ns2, 640),
        train_batch_size=1,
        save_and_sample_every=10**9,
        results_folder=str(tmp_path / "results"),
        mesh=make_mesh(n_data=1, devices=jax.devices()[:1]),
    )
    trainer.init_state(next(trainer.batches))
    ckpt = trainer.save(0)

    engine = cli.build_engine(
        str(cfg_path), ckpt, timesteps=2, cond_scale=1.0,
        text_buckets=(16,), frame_buckets=(8,), prompt_samples=640,
    )
    wav, sr = engine.tts(
        "hi", np.zeros(640, np.float32), seconds=8 * 320 / 24000
    )
    assert sr == 24000 and wav.shape == (8 * 320,)
    assert np.isfinite(wav).all()


def test_config_rejects_unknown_section(tmp_path):
    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({"modell": {"dim": 8}}))
    with pytest.raises(AssertionError, match="unknown config section"):
        cli.load_config(str(bad))


def test_flagship_defaults():
    cfg = cli.load_config(None)
    assert cfg["model"]["dim"] == 128 and cfg["model"]["depth"] == 6
    assert cfg["codec"]["type"] == "soundstream"
    assert cfg["ns2"]["timesteps"] == 1000


def test_import_torch_roundtrip(tmp_path):
    torch = pytest.importorskip("torch")
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent / "golden"))
    import refload

    if not refload.reference_available():
        pytest.skip("reference package not importable")
    REF = refload.load_reference()
    torch.manual_seed(0)
    model = REF.ns2.Model(
        dim=16, depth=1, heads=2, dim_head=8, ff_mult=2,
        wavenet_layers=1, wavenet_stacks=1, use_flash_attn=False,
    )
    pt = tmp_path / "ref.pt"
    torch.save({f"model.{k}": v for k, v in model.state_dict().items()}, pt)

    out = tmp_path / "model-0.ckpt"
    rc = cli.main(["import-torch", "--input", str(pt), "--output", str(out)])
    assert rc == 0
    assert out.exists() and out.stat().st_size > 1000
