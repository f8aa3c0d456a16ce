"""Torch-checkpoint importer: reference state_dicts -> flax param trees.

The import direction users actually take: RANDOMLY-initialised reference
torch modules (loaded via tests/golden/refload.py) are exported through
`naturalspeech2_tpu.utils.torch_import` and the resulting flax params
must reproduce the torch forward.  Also covers the torch-free `.pt` zip
reader (`load_torch_checkpoint`) including bf16 widening and nested
checkpoint flattening.
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent / "golden"))

import refload  # noqa: E402

if not refload.reference_available():  # pragma: no cover
    pytest.skip("torch reference not importable", allow_module_level=True)

import torch  # noqa: E402

from naturalspeech2_tpu.models.denoiser import Model  # noqa: E402
from naturalspeech2_tpu.models.encoders import (  # noqa: E402
    DurationPitchPredictor, PhonemeEncoder, SpeechPromptEncoder,
)
from naturalspeech2_tpu.models.aligner import AlignerNet  # noqa: E402
from naturalspeech2_tpu.utils import torch_import as ti  # noqa: E402

REF = refload.load_reference()


def _maxdiff(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b.detach().numpy() if torch.is_tensor(b) else b, np.float64)
    assert a.shape == b.shape, (a.shape, b.shape)
    return float(np.max(np.abs(a - b)))


def test_import_model_conditional():
    torch.manual_seed(0)
    ref = REF.ns2.Model(
        dim=32, depth=2, heads=2, dim_head=16, ff_mult=4,
        wavenet_layers=2, wavenet_stacks=2, dim_prompt=24, num_latents_m=4,
        resampler_depth=1, condition_on_prompt=True, use_flash_attn=False,
    )
    ref.eval()
    params = ti.model_params_from_torch(ref.state_dict())

    model = Model(
        dim=32, depth=2, heads=2, dim_head=16, wavenet_layers=2,
        wavenet_stacks=2, dim_prompt=24, num_latents_m=4, resampler_depth=1,
        condition_on_prompt=True, use_flash_attn=False,
        use_fused_wavenet=False, gelu_approximate=False,
    )
    rng = np.random.RandomState(1)
    x = rng.randn(2, 48, 32).astype(np.float32)
    times = np.array([0.3, 0.8], np.float32)
    prompt = rng.randn(2, 11, 24).astype(np.float32)
    cond = rng.randn(2, 37, 24).astype(np.float32)

    mine = model.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(times),
        prompt=jnp.asarray(prompt), cond=jnp.asarray(cond),
        cond_drop_mask=jnp.zeros((2,), bool),
    )
    with torch.no_grad():
        got = ref(
            torch.from_numpy(x), torch.from_numpy(times),
            prompt=torch.from_numpy(prompt),
            cond=torch.from_numpy(cond).permute(0, 2, 1),
            cond_drop_prob=0.0,
        )
    assert _maxdiff(mine, got) < 1e-4


def test_import_phoneme_encoder():
    torch.manual_seed(1)
    ref = REF.ns2.PhonemeEncoder(
        tokenizer=None, num_tokens=40, dim=48, dim_hidden=64, kernel_size=5,
        depth=2, dim_head=16, heads=2, conv_dropout=0.2, attn_dropout=0.0,
        use_flash=False,
    )
    ref.eval()
    params = ti.phoneme_encoder_params_from_torch(ref.state_dict())
    enc = PhonemeEncoder(
        num_tokens=40, dim=48, dim_hidden=64, kernel_size=5, depth=2,
        dim_head=16, heads=2, conv_dropout=0.0, attn_dropout=0.0,
        use_flash=False, gelu_approximate=False,
    )
    ids = np.random.RandomState(2).randint(-3, 40, size=(2, 17))
    mine = enc.apply({"params": params}, jnp.asarray(ids),
                     deterministic=True)
    with torch.no_grad():
        got = ref(torch.from_numpy(ids))
    assert _maxdiff(mine, got) < 1e-4


def test_import_speech_prompt_encoder():
    torch.manual_seed(2)
    ref = REF.ns2.SpeechPromptEncoder(
        dim_codebook=24, dims=(48, 64), depth=2, heads=2, dim_head=16,
        dropout=0.2, kernel_size=9, use_flash_attn=False,
    )
    ref.eval()
    params = ti.speech_prompt_encoder_params_from_torch(ref.state_dict())
    enc = SpeechPromptEncoder(
        dim_codebook=24, dims=(48, 64), depth=2, heads=2, dim_head=16,
        dropout=0.0, kernel_size=9, use_flash_attn=False,
        gelu_approximate=False,
    )
    x = np.random.RandomState(3).randn(2, 13, 24).astype(np.float32)
    mine = enc.apply({"params": params}, jnp.asarray(x), deterministic=True)
    with torch.no_grad():
        got = ref(torch.from_numpy(x))
    assert _maxdiff(mine, got) < 1e-4


def test_import_duration_pitch_predictor():
    torch.manual_seed(3)
    ref = REF.ns2.DurationPitchPredictor(
        dim=64, depth=2, kernel_size=3, heads=2, dim_head=16, dim_hidden=64,
        dropout=0.0, use_flash_attn=False, num_convolutions_per_block=2,
        num_convs_per_resnet_block=2,
    )
    ref.eval()
    params = ti.duration_pitch_predictor_params_from_torch(ref.state_dict())
    dp = DurationPitchPredictor(
        dim=64, dim_encoded_prompts=64, depth=2, kernel_size=3, heads=2,
        dim_head=16, dim_hidden=64, dropout=0.0, use_flash_attn=False,
        num_convolutions_per_block=2, num_convs_per_resnet_block=2,
    )
    rng = np.random.RandomState(4)
    x = rng.randn(2, 9, 64).astype(np.float32)
    prompts = rng.randn(2, 7, 64).astype(np.float32)
    pmask = np.ones((2, 7), bool)
    dur, pit = dp.apply({"params": params}, jnp.asarray(x),
                        jnp.asarray(prompts), jnp.asarray(pmask),
                        deterministic=True)
    ext = np.concatenate([np.ones((2, 9), bool), pmask], axis=1)
    with torch.no_grad():
        rdur, rpit = ref(
            torch.from_numpy(x), torch.from_numpy(prompts),
            prompt_mask=torch.from_numpy(ext),
        )
    assert _maxdiff(dur, rdur) < 1e-4
    assert _maxdiff(pit, rpit) < 1e-4


def test_import_aligner_net():
    torch.manual_seed(4)
    ref = REF.aligner.AlignerNet(dim_in=16, dim_hidden=64, attn_channels=16)
    ref.eval()
    params = ti.aligner_net_params_from_torch(ref.state_dict())
    net = AlignerNet(dim_in=16, dim_hidden=64, attn_channels=16)
    rng = np.random.RandomState(5)
    queries = rng.randn(2, 21, 16).astype(np.float32)
    keys = rng.randn(2, 9, 64).astype(np.float32)
    mask = np.ones((2, 9), bool)
    _, logp = net.apply({"params": params}, jnp.asarray(queries),
                        jnp.asarray(keys), jnp.asarray(mask))
    with torch.no_grad():
        _, rlogp = ref(
            torch.from_numpy(queries).permute(0, 2, 1),
            torch.from_numpy(keys).permute(0, 2, 1), mask=None,
        )
    # documented sign divergence: repo logits = −(reference cdist)
    assert _maxdiff(logp, -rlogp.numpy()) < 1e-4


def test_load_torch_checkpoint_zip_reader(tmp_path):
    torch.manual_seed(5)
    sd = {
        "a.weight": torch.randn(4, 3),
        "a.bias": torch.randn(4),
        "emb": torch.randn(7, 5),
        "flag": torch.tensor([1, 2, 3], dtype=torch.long),
        "half": torch.randn(6, dtype=torch.bfloat16),
        "scalar": torch.tensor(2.5),
    }
    path = tmp_path / "ckpt.pt"
    torch.save(sd, path)
    got = ti.load_torch_checkpoint(path)
    assert set(got) == set(sd)
    for k in ("a.weight", "a.bias", "emb", "scalar"):
        np.testing.assert_allclose(got[k], sd[k].numpy(), rtol=0, atol=0)
    np.testing.assert_array_equal(got["flag"], sd["flag"].numpy())
    # bf16 widening is exact (bf16 is the high 16 bits of f32)
    np.testing.assert_allclose(
        got["half"], sd["half"].float().numpy(), rtol=0, atol=0
    )

    # nested checkpoints ({'model': sd, 'step': ...}) flatten with prefixes
    nested = {"model": {"w": torch.randn(2, 2)}}
    path2 = tmp_path / "nested.pt"
    torch.save(nested, path2)
    got2 = ti.load_torch_checkpoint(path2)
    assert list(got2) == ["model.w"]


def test_unpickler_refuses_arbitrary_globals(tmp_path):
    """The torch-free reader must refuse pickles that reference globals
    outside the tensor-rebuild allowlist — a checkpoint is untrusted
    input and the stock Unpickler would execute `os.system` etc."""
    import pickle
    import zipfile

    class Evil:
        def __reduce__(self):
            import os

            return (os.path.join, ("pwned",))

    path = tmp_path / "evil.pt"
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("archive/data.pkl", pickle.dumps({"x": Evil()}))
    with pytest.raises(pickle.UnpicklingError, match="refusing to unpickle"):
        ti.load_torch_checkpoint(path)


def test_full_ns2_roundtrip_via_file(tmp_path):
    """torch.save → torch-free reader → tree import: the flax denoiser
    reproduces the torch forward from a checkpoint FILE."""
    torch.manual_seed(6)
    ref = REF.ns2.Model(
        dim=32, depth=2, heads=2, dim_head=16, ff_mult=4,
        wavenet_layers=2, wavenet_stacks=2, dim_prompt=24, num_latents_m=4,
        resampler_depth=1, condition_on_prompt=True, use_flash_attn=False,
    )
    ref.eval()
    path = tmp_path / "model.pt"
    torch.save({"model": ref.state_dict()}, path)

    flat = ti.load_torch_checkpoint(path)
    sub = {k[len("model."):]: v for k, v in flat.items()
           if k.startswith("model.")}
    params = ti.model_params_from_torch(sub)

    model = Model(
        dim=32, depth=2, heads=2, dim_head=16, wavenet_layers=2,
        wavenet_stacks=2, dim_prompt=24, num_latents_m=4, resampler_depth=1,
        condition_on_prompt=True, use_flash_attn=False,
        use_fused_wavenet=False, gelu_approximate=False,
    )
    rng = np.random.RandomState(7)
    x = rng.randn(2, 40, 32).astype(np.float32)
    times = np.array([0.1, 0.9], np.float32)
    prompt = rng.randn(2, 11, 24).astype(np.float32)
    cond = rng.randn(2, 31, 24).astype(np.float32)
    mine = model.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(times),
        prompt=jnp.asarray(prompt), cond=jnp.asarray(cond),
        cond_drop_mask=jnp.zeros((2,), bool),
    )
    with torch.no_grad():
        got = ref(
            torch.from_numpy(x), torch.from_numpy(times),
            prompt=torch.from_numpy(prompt),
            cond=torch.from_numpy(cond).permute(0, 2, 1),
            cond_drop_prob=0.0,
        )
    assert _maxdiff(mine, got) < 1e-4
