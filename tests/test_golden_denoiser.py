"""GOLDEN parity: repo flax modules vs the ACTUAL reference torch code.

`tests/golden/refload.py` imports `/root/reference` (read-only) with
import-only stubs for its unavailable pip deps; `tests/golden/convert.py`
maps the repo's flax params onto the reference modules' state_dicts.  The
expected activations here are computed by the reference binary itself —
upgrading `tests/reference_oracle.py`'s transliterated evidence to true
golden evidence (ROADMAP "Verification debt" item 1).

Covers the denoiser stack: Wavenet (:597-725), ConditionableTransformer
(:748-809), PerceiverResampler (:532-579), Model fwd + CFG (:811-1000),
noise schedules (:1131-1156) — line refs into
/root/reference/naturalspeech2_pytorch/naturalspeech2_pytorch.py.
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

import convert  # noqa: E402
from naturalspeech2_tpu.models.denoiser import Model, forward_with_cond_scale  # noqa: E402
from naturalspeech2_tpu.models.encoders import PerceiverResampler  # noqa: E402
from naturalspeech2_tpu.models.transformer import ConditionableTransformer  # noqa: E402
from naturalspeech2_tpu.models.wavenet import Wavenet  # noqa: E402
from naturalspeech2_tpu.ops.schedules import (  # noqa: E402
    gamma_to_alpha_sigma, gamma_to_log_snr, sigmoid_schedule,
)

REF = refload.load_reference()

CFG = dict(
    dim=32, depth=2, heads=2, dim_head=16, ff_mult=4,
    wavenet_layers=2, wavenet_stacks=2,
    condition_on_prompt=True, dim_prompt=24, resampler_depth=1,
    num_latents_m=4,
)


def _maxdiff(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b.detach().numpy() if torch.is_tensor(b) else b, np.float64)
    assert a.shape == b.shape, (a.shape, b.shape)
    return float(np.max(np.abs(a - b)))


@pytest.fixture(scope="module")
def cond_pair():
    """(flax model+params, torch ref model with the SAME weights, inputs)."""
    model = Model(
        dim=CFG["dim"], depth=CFG["depth"], heads=CFG["heads"],
        dim_head=CFG["dim_head"], wavenet_layers=CFG["wavenet_layers"],
        wavenet_stacks=CFG["wavenet_stacks"], dim_prompt=CFG["dim_prompt"],
        num_latents_m=CFG["num_latents_m"],
        resampler_depth=CFG["resampler_depth"],
        condition_on_prompt=True, use_flash_attn=False,
        use_fused_wavenet=False, gelu_approximate=False,
    )
    key = jax.random.PRNGKey(0)
    kx, kp, kc, ki = jax.random.split(key, 4)
    x = jax.random.normal(kx, (2, 48, CFG["dim"]))
    times = jnp.array([0.3, 0.8])
    prompt = jax.random.normal(kp, (2, 11, CFG["dim_prompt"]))
    cond = jax.random.normal(kc, (2, 37, CFG["dim_prompt"]))
    variables = model.init(
        ki, x, times, prompt=prompt, cond=cond,
        cond_drop_mask=jnp.zeros((2,), bool),
    )

    ref = REF.ns2.Model(
        dim=CFG["dim"], depth=CFG["depth"], heads=CFG["heads"],
        dim_head=CFG["dim_head"], ff_mult=CFG["ff_mult"],
        wavenet_layers=CFG["wavenet_layers"],
        wavenet_stacks=CFG["wavenet_stacks"],
        dim_prompt=CFG["dim_prompt"], num_latents_m=CFG["num_latents_m"],
        resampler_depth=CFG["resampler_depth"],
        condition_on_prompt=True, use_flash_attn=False,
    )
    convert.load_into(ref, convert.model(variables, CFG))
    ref.eval()
    return model, variables, ref, x, times, prompt, cond


def test_golden_wavenet():
    wn = Wavenet(dim=16, stacks=3, layers=3, dim_cond_mult=4)
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (2, 40, 16))
    t = jax.random.normal(jax.random.fold_in(key, 1), (2, 64))
    variables = wn.init(jax.random.fold_in(key, 2), x, t)

    ref = REF.ns2.Wavenet(dim=16, stacks=3, layers=3, dim_cond_mult=4)
    dst = {}
    convert.wavenet(variables["params"], dst, "", 3, 3)
    convert.load_into(ref, dst)

    mine = wn.apply(variables, x, t)
    with torch.no_grad():
        # reference is channels-first [b, d, n]
        got = ref(torch.from_numpy(np.asarray(x)).permute(0, 2, 1),
                  torch.from_numpy(np.asarray(t)))
    assert _maxdiff(mine, got.permute(0, 2, 1)) < 2e-5


def test_golden_conditionable_transformer():
    tr = ConditionableTransformer(
        dim=32, depth=2, dim_head=16, heads=2, ff_causal_conv=True,
        dim_cond_mult=4, cross_attn=True, gelu_approximate=False,
    )
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (2, 48, 32))
    t = jax.random.normal(jax.random.fold_in(key, 1), (2, 128))
    ctx = jax.random.normal(jax.random.fold_in(key, 2), (2, 7, 32))
    variables = tr.init(jax.random.fold_in(key, 3), x, t, context=ctx)

    ref = REF.ns2.ConditionableTransformer(
        dim=32, depth=2, dim_head=16, heads=2, ff_causal_conv=True,
        dim_cond_mult=4, use_flash=False, cross_attn=True,
    )
    dst = {}
    convert.conditionable_transformer(variables["params"], dst, "", 2,
                                      cross_attn=True, cond=True)
    convert.load_into(ref, dst)

    mine = tr.apply(variables, x, t, context=ctx)
    with torch.no_grad():
        got = ref(torch.from_numpy(np.asarray(x)),
                  times=torch.from_numpy(np.asarray(t)),
                  context=torch.from_numpy(np.asarray(ctx)))
    assert _maxdiff(mine, got) < 2e-5


def test_golden_perceiver_resampler():
    pr = PerceiverResampler(
        dim=32, dim_context=24, num_latents=4, depth=2, dim_head=16,
        heads=2, use_flash_attn=False,
    )
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (2, 11, 24))
    variables = pr.init(jax.random.fold_in(key, 1), x)

    ref = REF.ns2.PerceiverResampler(
        dim=32, dim_context=24, num_latents=4, depth=2, dim_head=16,
        heads=2, use_flash_attn=False,
    )
    dst = {}
    convert.perceiver_resampler(variables["params"], dst, "", 2)
    convert.load_into(ref, dst)

    mine = pr.apply(variables, x)
    with torch.no_grad():
        got = ref(torch.from_numpy(np.asarray(x)))
    assert _maxdiff(mine, got) < 1e-4

    # masked variant.  The reference as written ERRORS for any non-None
    # mask: cross_attn_include_queries prepends num_latents queries to the
    # keys (:1062) but the key-padding mask is not extended (attend.py:138)
    # — the documented defect in models/transformer.py.  The repo's
    # semantics (latents always attendable) equal the reference run with a
    # latents-extended mask, which is what we golden-check here.
    mask = np.zeros((2, 11), bool)
    mask[0, :7] = True
    mask[1, :] = True
    mine = pr.apply(variables, x, mask=jnp.asarray(mask))
    ext = np.concatenate([np.ones((2, 4), bool), mask], axis=1)
    with torch.no_grad():
        got = ref(torch.from_numpy(np.asarray(x)),
                  mask=torch.from_numpy(ext))
    assert _maxdiff(mine, got) < 1e-4


@pytest.mark.parametrize("drop", [0.0, 1.0])
def test_golden_model_forward(cond_pair, drop):
    model, variables, ref, x, times, prompt, cond = cond_pair
    mask = jnp.full((2,), bool(drop))
    mine = model.apply(
        variables, x, times, prompt=prompt, cond=cond, cond_drop_mask=mask,
    )
    with torch.no_grad():
        got = ref(
            torch.from_numpy(np.asarray(x)),
            torch.from_numpy(np.asarray(times)),
            prompt=torch.from_numpy(np.asarray(prompt)),
            cond=torch.from_numpy(np.asarray(cond)).permute(0, 2, 1),
            cond_drop_prob=drop,
        )
    assert _maxdiff(mine, got) < 2e-5


@pytest.mark.parametrize("cond_scale", [1.0, 3.0])
def test_golden_cfg(cond_pair, cond_scale):
    model, variables, ref, x, times, prompt, cond = cond_pair
    mine = forward_with_cond_scale(
        model, variables, x, times, prompt=prompt, cond=cond,
        cond_scale=cond_scale,
    )
    with torch.no_grad():
        got = ref.forward_with_cond_scale(
            torch.from_numpy(np.asarray(x)),
            torch.from_numpy(np.asarray(times)),
            prompt=torch.from_numpy(np.asarray(prompt)),
            cond=torch.from_numpy(np.asarray(cond)).permute(0, 2, 1),
            cond_scale=cond_scale,
        )
    assert _maxdiff(mine, got) < 5e-5


def test_golden_schedules():
    # interior points only: at t∈{0,1} log-SNR is ±inf in both
    # implementations and inf−inf poisons the diff
    t = jnp.linspace(0.01, 0.99, 33)
    tt = torch.from_numpy(np.asarray(t))
    got = REF.ns2.sigmoid_schedule(tt)
    assert _maxdiff(sigmoid_schedule(t), got) < 1e-6

    gamma = sigmoid_schedule(t)
    tg = torch.from_numpy(np.asarray(gamma))
    ga, gs = gamma_to_alpha_sigma(gamma)
    ra, rs = REF.ns2.gamma_to_alpha_sigma(tg)
    assert _maxdiff(ga, ra) < 1e-6 and _maxdiff(gs, rs) < 1e-6
    assert _maxdiff(gamma_to_log_snr(gamma),
                    REF.ns2.gamma_to_log_snr(tg)) < 1e-5
