"""GOLDEN end-to-end DDIM sampling parity vs the actual reference torch.

The full sampling loop (`NaturalSpeech2.ddim_sample`, reference
:1379-1431) runs in the torch binary with the SAME model weights and the
SAME initial noise as the repo's `lax.scan` sampler
(`models/naturalspeech2.ddim_sample`) — the strongest possible form of
the north-star "<1e-3 latent MSE vs reference" claim, previously measured
only against the numpy transliteration.

The reference's `ddpm_sample` (:1310-1377) is NOT golden-tested: it is
broken as written (documented in models/naturalspeech2.py) and cannot
produce comparable numbers.

The conditional CFG denoise step that drives conditional sampling is
golden-tested per-step in tests/test_golden_denoiser.py::test_golden_cfg;
here the loop mechanics are verified unconditionally (the reference NS2
ctor would otherwise build its full-size conditioning stack).
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

import convert  # noqa: E402
from naturalspeech2_tpu.models.denoiser import Model  # noqa: E402
from naturalspeech2_tpu.models.naturalspeech2 import ddim_sample  # noqa: E402
from naturalspeech2_tpu.ops.schedules import sigmoid_schedule  # noqa: E402

REF = refload.load_reference()

CFG = dict(
    dim=16, depth=2, heads=2, dim_head=16, ff_mult=4,
    wavenet_layers=2, wavenet_stacks=2, condition_on_prompt=False,
)


@pytest.mark.parametrize("objective", ["v", "eps", "x0"])
def test_golden_ddim_sample(objective, monkeypatch):
    model = Model(
        dim=CFG["dim"], depth=CFG["depth"], heads=CFG["heads"],
        dim_head=CFG["dim_head"], wavenet_layers=CFG["wavenet_layers"],
        wavenet_stacks=CFG["wavenet_stacks"], condition_on_prompt=False,
        use_flash_attn=False, use_fused_wavenet=False,
        gelu_approximate=False,
    )
    key = jax.random.PRNGKey(5)
    shape = (2, 32, CFG["dim"])
    x = jax.random.normal(key, shape)
    times = jnp.array([0.3, 0.8])
    variables = model.init(jax.random.fold_in(key, 1), x, times)

    ref_model = REF.ns2.Model(
        dim=CFG["dim"], depth=CFG["depth"], heads=CFG["heads"],
        dim_head=CFG["dim_head"], ff_mult=CFG["ff_mult"],
        wavenet_layers=CFG["wavenet_layers"],
        wavenet_stacks=CFG["wavenet_stacks"], condition_on_prompt=False,
        use_flash_attn=False,
    )
    convert.load_into(ref_model, convert.model(variables, CFG))
    ref_model.eval()

    ns2 = REF.ns2.NaturalSpeech2(
        model=ref_model, codec=None, target_sample_hz=24000,
        timesteps=12, objective=objective, noise_schedule="sigmoid",
    )

    # identical initial noise on both sides
    noise_key = jax.random.fold_in(key, 2)
    audio0 = jax.random.normal(noise_key, shape)
    monkeypatch.setattr(
        torch, "randn",
        lambda *a, **kw: torch.from_numpy(np.asarray(audio0)),
    )
    with torch.no_grad():
        got = ns2.ddim_sample(shape)

    def denoise_fn(audio, t):
        return model.apply(variables, audio, t)

    mine = ddim_sample(
        denoise_fn, noise_key, shape, timesteps=12,
        gamma_schedule=sigmoid_schedule, objective=objective,
    )
    # the sampler consumes the key the same way: identical starting noise
    np.testing.assert_allclose(
        np.asarray(jax.random.normal(noise_key, shape)),
        np.asarray(audio0), rtol=0, atol=0,
    )

    diff = np.max(np.abs(np.asarray(mine, np.float64) - got.numpy()))
    mse = np.mean((np.asarray(mine, np.float64) - got.numpy()) ** 2)
    if objective == "eps":
        # x̂₀ = (audio − σ·out)/α amplifies the ~1e-6 f32 forward noise by
        # 1/α ≈ 3e4 at the t≈1 boundary steps (γ clamps at 1e-9, identical
        # safe_div on both sides) — parity here is bounded by f32, not by
        # structure.  v/x0 confirm the loop itself to 1e-8 MSE.
        assert mse < 1e-3, (objective, mse, diff)
    else:
        assert mse < 1e-8, (objective, mse, diff)
        assert diff < 1e-3, (objective, diff)
