"""GOLDEN parity for the FULL conditional training forward.

The ENTIRE reference `NaturalSpeech2.forward` (:1503-1684) runs in torch
with the repo's weights: phoneme/prompt encoding, alignment, duration &
pitch prediction, expand_encodings, diffusion loss with min-SNR
weighting.  The repo's flax `NaturalSpeech2.__call__` must reproduce the
conditioning tensors fed to the denoiser AND every loss component.

Controlled divergences (all documented in the repo sources):
- aligner logits sign: torch.cdist is negated for the reference run
  (repo uses paper-correct −distance; reference attends to the farthest
  keys as written).
- the reference's returned loss OMITS the aux losses (its
  `duration_pitch_loss` is initialised 0 and never assigned, :1522,:1684)
  — so the reference return value is compared against the repo's
  `diffusion` component, and the aux components are captured from inside
  the reference forward (F.l1_loss / ForwardSumLoss call interception).
- min-SNR broadcast defect (:1666): the reference multiplies its
  [b]-shaped reduced loss by a [b,1,1]-shaped weight — an outer product
  whose mean degenerates to mean(mse)·mean(weight), decoupling each
  sample's weight from its own loss for batch > 1. The repo weights
  per-sample (the paper's formula). This test captures the reference's
  pred/target at the mse boundary, asserts the repo equals the
  per-sample form computed from the REFERENCE's own tensors, and
  asserts the reference's returned value equals the degenerate
  mean·mean form — characterising the defect rather than masking it.
- diffusion times/noise are injected identically on both sides
  (torch.Tensor.uniform_ / torch.randn_like interception vs the repo's
  explicit `times=`/`noise=` arguments).

Slow: full flax NS2 init + apply dominates (~minutes on the CPU mesh).
"""

import sys
from functools import partial
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
import torch.nn.functional as TF  # noqa: E402

import convert  # noqa: E402
from naturalspeech2_tpu.models.denoiser import Model  # noqa: E402
from naturalspeech2_tpu.models.naturalspeech2 import NaturalSpeech2  # noqa: E402

REF = refload.load_reference()

pytestmark = pytest.mark.slow

MODEL_CFG = dict(
    dim=32, depth=2, heads=2, dim_head=16, ff_mult=4, wavenet_layers=2,
    wavenet_stacks=2, condition_on_prompt=True, dim_prompt=64,
    resampler_depth=1, num_latents_m=4,
)


@pytest.fixture(scope="module")
def pair():
    model = Model(
        dim=32, depth=2, heads=2, dim_head=16, wavenet_layers=2,
        wavenet_stacks=2, dim_prompt=64, num_latents_m=4, resampler_depth=1,
        condition_on_prompt=True, cond_drop_prob=0.0, use_flash_attn=False,
        use_fused_wavenet=False, gelu_approximate=False,
    )
    ns2 = NaturalSpeech2(
        model=model, codec=None, dim_codebook=24, duration_pitch_dim=64,
        aligner_dim_in=16, aligner_dim_hidden=64, aligner_attn_channels=16,
        num_phoneme_tokens=40,
        # 256 bins: the reference's f0_to_coarse is hardcoded to 256
        # (:164); the repo generalises f0_bin=pitch_emb_dim, so matching
        # the reference requires its default bin count
        pitch_emb_dim=256, pitch_emb_pp_hidden_dim=64,
        aligner_bin_loss_weight=0.0,
        mask_duration_pitch_loss=False,  # reference's unmasked L1 (:1587/:1590)
        pitch_space="hz",  # reference's raw-Hz L1 (:1590)
        phoneme_enc_kwargs=dict(
            dim=48, dim_hidden=64, kernel_size=5, depth=2, dim_head=16,
            heads=2, conv_dropout=0.0, attn_dropout=0.0, use_flash=False,
            gelu_approximate=False,
        ),
        prompt_enc_kwargs=dict(
            dims=(48, 64), depth=2, heads=2, dim_head=16, dropout=0.0,
            kernel_size=9, use_flash_attn=False, gelu_approximate=False,
        ),
        duration_pitch_kwargs=dict(
            dim_encoded_prompts=64, depth=2, kernel_size=3, heads=2,
            dim_head=16, dim_hidden=64, dropout=0.0, use_flash_attn=False,
            num_convolutions_per_block=2, num_convs_per_resnet_block=2,
        ),
    )
    key = jax.random.PRNGKey(7)
    ks = jax.random.split(key, 6)
    b, n, t_x, frames = 2, 24, 9, 30
    data = dict(
        audio=jax.random.normal(ks[0], (b, n, 32)),
        text=jax.random.randint(ks[2], (b, t_x), 0, 40),
        text_lens=jnp.array([t_x, 6]),
        mel=jax.random.normal(ks[3], (b, 16, frames)) * 10.0,
        mel_lens=jnp.array([frames, 25]),
        prompt=jax.random.normal(ks[1], (b, 13, 24)),
        # away from coarse-bin edges (f32 rounding)
        pitch=80.0 + 200.0 * jax.random.uniform(ks[4], (b, 1, frames)),
    )
    times = jnp.array([0.3, 0.8])
    noise = jax.random.normal(ks[5], (b, n, 32))
    variables = ns2.init(
        {"params": jax.random.PRNGKey(11)}, **data, deterministic=True,
        times=times, noise=noise,
    )

    # ---- reference NS2 with the small component sizes (ctor hardcodes
    # full-size PhonemeEncoder/SpeechPromptEncoder/DurationPitchPredictor;
    # pre-fill their kwargs at the module level for construction)
    import unittest.mock as mock

    with mock.patch.object(
        REF.ns2, "PhonemeEncoder",
        partial(REF.ns2.PhonemeEncoder, dim=48, dim_hidden=64,
                kernel_size=5, depth=2, dim_head=16, heads=2,
                conv_dropout=0.0, attn_dropout=0.0, use_flash=False),
    ), mock.patch.object(
        REF.ns2, "SpeechPromptEncoder",
        partial(REF.ns2.SpeechPromptEncoder, dims=(48, 64), depth=2,
                heads=2, dim_head=16, dropout=0.0, kernel_size=9,
                use_flash_attn=False),
    ), mock.patch.object(
        REF.ns2, "DurationPitchPredictor",
        partial(REF.ns2.DurationPitchPredictor, depth=2, kernel_size=3,
                heads=2, dim_head=16, dim_hidden=64, dropout=0.0,
                use_flash_attn=False, num_convolutions_per_block=2,
                num_convs_per_resnet_block=2),
    ):
        ref_model = REF.ns2.Model(
            dim=32, depth=2, heads=2, dim_head=16, ff_mult=4,
            wavenet_layers=2, wavenet_stacks=2, dim_prompt=64,
            num_latents_m=4, resampler_depth=1, condition_on_prompt=True,
            use_flash_attn=False, cond_drop_prob=0.0,
        )
        ref_ns2 = REF.ns2.NaturalSpeech2(
            model=ref_model, codec=None, target_sample_hz=24000,
            dim_codebook=24, duration_pitch_dim=64, aligner_dim_in=16,
            aligner_dim_hidden=64, aligner_attn_channels=16,
            num_phoneme_tokens=40, pitch_emb_dim=256,
            pitch_emb_pp_hidden_dim=64, aligner_bin_loss_weight=0.0,
            objective="v", noise_schedule="sigmoid",
        )

    p = variables["params"]
    dst = {}
    for k, v in convert.model({"params": p["model"]}, MODEL_CFG).items():
        dst[f"model.{k}"] = v
    convert.phoneme_encoder(p["phoneme_enc"], dst, "phoneme_enc.", 2)
    convert.speech_prompt_encoder(p["prompt_enc"], dst, "prompt_enc.", 2,
                                  n_convs=2)
    convert.duration_pitch_predictor(p["duration_pitch"], dst,
                                     "duration_pitch.", 2)
    convert.aligner_net(p["aligner"]["aligner"], dst, "aligner.aligner.")
    dst["pitch_emb.weight"] = convert.t(p["pitch_emb"]["embedding"])
    convert.load_into(ref_ns2, dst)
    ref_ns2.eval()
    return ns2, variables, ref_ns2, data, times, noise


def test_golden_full_conditional_forward(pair, monkeypatch):
    ns2, variables, ref_ns2, data, times, noise = pair

    # --- controlled divergences / injections on the torch side
    orig_cdist = torch.cdist
    monkeypatch.setattr(
        torch, "cdist", lambda a, b, **kw: -orig_cdist(a, b, **kw)
    )
    times_t = torch.from_numpy(np.asarray(times))
    monkeypatch.setattr(
        torch.Tensor, "uniform_",
        lambda self, *a, **kw: self.copy_(times_t.to(self.dtype)),
    )
    monkeypatch.setattr(
        torch, "randn_like",
        lambda x, **kw: torch.from_numpy(np.asarray(noise)).to(x.dtype),
    )

    # capture the aux losses the reference computes but then drops
    captured = {"l1": []}
    orig_l1 = TF.l1_loss
    monkeypatch.setattr(
        REF.ns2.F, "l1_loss",
        lambda a, b, **kw: captured["l1"].append(orig_l1(a, b, **kw))
        or captured["l1"][-1],
    )
    orig_align_fwd = ref_ns2.aligner_loss.forward

    def align_spy(*a, **kw):
        captured["align"] = orig_align_fwd(*a, **kw)
        return captured["align"]

    monkeypatch.setattr(ref_ns2.aligner_loss, "forward", align_spy)

    # capture the diffusion pred/target at the mse boundary
    orig_mse = TF.mse_loss

    def mse_spy(a, b, **kw):
        captured["mse_pred"] = a.detach().numpy()
        captured["mse_target"] = b.detach().numpy()
        return orig_mse(a, b, **kw)

    monkeypatch.setattr(REF.ns2.F, "mse_loss", mse_spy)

    # capture the conditioning tensors actually fed to the denoiser
    orig_model_fwd = ref_ns2.model.forward

    def model_spy(x, t, prompt=None, prompt_mask=None, cond=None,
                  cond_drop_prob=None):
        captured["prompt_enc"] = prompt
        captured["cond"] = cond
        return orig_model_fwd(x, t, prompt=prompt, prompt_mask=prompt_mask,
                              cond=cond, cond_drop_prob=cond_drop_prob)

    monkeypatch.setattr(ref_ns2.model, "forward", model_spy)

    ref_loss = ref_ns2(
        torch.from_numpy(np.asarray(data["audio"])),
        text=torch.from_numpy(np.asarray(data["text"])),
        text_lens=torch.from_numpy(np.asarray(data["text_lens"])),
        mel=torch.from_numpy(np.asarray(data["mel"])),
        mel_lens=torch.from_numpy(np.asarray(data["mel_lens"])),
        prompt=torch.from_numpy(np.asarray(data["prompt"])),
        pitch=torch.from_numpy(np.asarray(data["pitch"])),
    )

    # --- repo side with injected times/noise
    losses = ns2.apply(
        variables, **data, deterministic=True, times=times, noise=noise,
    )

    def close(mine, ref, tol, what):
        d = abs(float(mine) - float(ref))
        rel = d / max(abs(float(ref)), 1.0)
        assert rel < tol, (what, float(mine), float(ref))

    # diffusion: per-sample min-SNR weighting from the REFERENCE's own
    # pred/target must equal the repo's value; the reference's returned
    # value must equal the degenerate mean(mse)·mean(w) broadcast form
    # (see module docstring) — and it omits the aux losses (:1684)
    gamma = np.asarray(ns2.gamma_schedule(times), np.float64)
    snr = gamma / (1.0 - gamma)
    w = np.minimum(snr, 5.0) / (snr + 1.0)
    mse = (
        (captured["mse_pred"].astype(np.float64)
         - captured["mse_target"].astype(np.float64)) ** 2
    ).mean(axis=(1, 2))
    close(losses["diffusion"], (mse * w).mean(), 1e-4, "diffusion")
    close(ref_loss, mse.mean() * w.mean(), 1e-4, "ref broadcast defect")
    close(losses["duration"], captured["l1"][0], 1e-4, "duration")
    close(losses["pitch"], captured["l1"][1], 1e-4, "pitch")
    close(losses["align"], captured["align"], 1e-3, "align")

    # conditioning tensors at the denoiser boundary
    prompt_enc, cond, _, _ = ns2.apply(
        variables, data["audio"], data["text"], data["text_lens"],
        data["mel"], data["mel_lens"], data["prompt"], data["pitch"],
        True, method=ns2._conditional_inputs_and_losses,
    )
    ref_prompt = captured["prompt_enc"].detach().numpy()
    ref_cond = captured["cond"].detach().numpy().transpose(0, 2, 1)
    assert np.max(np.abs(np.asarray(prompt_enc) - ref_prompt)) < 1e-3
    assert np.max(np.abs(np.asarray(cond) - ref_cond)) < 1e-3


def test_golden_conditional_sample_end_to_end(pair, monkeypatch):
    """The COMPLETE conditional inference path with shared weights: the
    reference `sample()` (:1457-1501 — prompt/phoneme encoding, predicted
    durations → `generate_mask_from_repeats`, expand_encodings, CFG DDIM
    loop) vs the repo's `sample` free function, identical initial noise.
    codec=None on both sides → the compared output IS the latent tensor."""
    from naturalspeech2_tpu.models.naturalspeech2 import sample as repo_sample

    ns2, variables, ref_ns2, data, _, _ = pair

    b, t_x = data["text"].shape
    prompt_latents = np.asarray(data["prompt"], np.float32)
    text = np.asarray(data["text"])
    length = 24
    steps = 8

    key = jax.random.PRNGKey(21)
    mine = repo_sample(
        ns2, variables, key, length=length,
        prompt=jnp.asarray(prompt_latents), text=jnp.asarray(text),
        cond_scale=2.0, timesteps=steps,
    )

    # identical initial noise: the repo sampler draws
    # jax.random.normal(key, shape) (tests/test_golden_sampling.py pins this)
    audio0 = jax.random.normal(key, (b, length, 32))
    monkeypatch.setattr(
        torch, "randn", lambda *a, **kw: torch.from_numpy(np.asarray(audio0))
    )
    ref_ns2.timesteps = steps
    with torch.no_grad():
        got = ref_ns2.sample(
            length=length,
            prompt=torch.from_numpy(prompt_latents),
            text=torch.from_numpy(text),
            cond_scale=2.0,
        )

    mse = np.mean((np.asarray(mine, np.float64) - got.numpy()) ** 2)
    diff = np.max(np.abs(np.asarray(mine, np.float64) - got.numpy()))
    assert mse < 1e-6, (mse, diff)
