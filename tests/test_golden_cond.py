"""GOLDEN parity for the CONDITIONING stack vs the actual reference torch.

Same harness as `tests/test_golden_denoiser.py` (refload + convert);
covers PhonemeEncoder (:228-287), SpeechPromptEncoder (:289-341),
DurationPitchPredictor (:412-527), AlignerNet / maximum_path /
ForwardSumLoss / BinLoss (aligner.py) — line refs into
/root/reference/naturalspeech2_pytorch/.

Documented reference defects are golden-checked via the *relationship*
between the two implementations rather than skipped:
- AlignerNet logits: reference uses +cdist (attends to the FARTHEST
  keys); the repo uses −distance (paper-correct).  We assert
  mine == −reference on valid entries.
- BinLoss: the reference returns +Σ logp (a negative "loss" that would
  be *maximized*); the repo returns the negated value.
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
from naturalspeech2_tpu.models.aligner import (  # noqa: E402
    AlignerNet, BinLoss, ForwardSumLoss,
)
from naturalspeech2_tpu.models.encoders import (  # noqa: E402
    DurationPitchPredictor, PhonemeEncoder, SpeechPromptEncoder,
)
from naturalspeech2_tpu.ops.mas import maximum_path  # noqa: E402

REF = refload.load_reference()


def _maxdiff(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b.detach().numpy() if torch.is_tensor(b) else b, np.float64)
    assert a.shape == b.shape, (a.shape, b.shape)
    return float(np.max(np.abs(a - b)))


def test_golden_phoneme_encoder():
    enc = PhonemeEncoder(
        num_tokens=40, dim=48, dim_hidden=64, kernel_size=5, depth=2,
        dim_head=16, heads=2, conv_dropout=0.0, attn_dropout=0.0,
        use_flash=False, gelu_approximate=False,
    )
    key = jax.random.PRNGKey(0)
    ids = jax.random.randint(key, (2, 17), -3, 40)  # negatives = padding
    mask = jnp.arange(17)[None, :] < jnp.array([17, 12])[:, None]
    variables = enc.init(jax.random.fold_in(key, 1), ids, mask=mask)
    mine = enc.apply(variables, ids, mask=mask, deterministic=True)

    ref = REF.ns2.PhonemeEncoder(
        tokenizer=None, num_tokens=40, dim=48, dim_hidden=64, kernel_size=5,
        depth=2, dim_head=16, heads=2, conv_dropout=0.2, attn_dropout=0.0,
        use_flash=False,
    )
    dst = {}
    convert.phoneme_encoder(variables["params"], dst, "", 2)
    convert.load_into(ref, dst)
    ref.eval()
    with torch.no_grad():
        got = ref(torch.from_numpy(np.asarray(ids)),
                  mask=torch.from_numpy(np.asarray(mask)))
    assert _maxdiff(mine, got) < 1e-4


def test_golden_speech_prompt_encoder():
    enc = SpeechPromptEncoder(
        dim_codebook=24, dims=(48, 64), depth=2, heads=2, dim_head=16,
        dropout=0.0, kernel_size=9, use_flash_attn=False,
        gelu_approximate=False,
    )
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (2, 13, 24))
    variables = enc.init(jax.random.fold_in(key, 1), x)
    mine = enc.apply(variables, x, deterministic=True)

    ref = REF.ns2.SpeechPromptEncoder(
        dim_codebook=24, dims=(48, 64), depth=2, heads=2, dim_head=16,
        dropout=0.2, kernel_size=9, use_flash_attn=False,
    )
    dst = {}
    convert.speech_prompt_encoder(variables["params"], dst, "", 2, n_convs=2)
    convert.load_into(ref, dst)
    ref.eval()
    with torch.no_grad():
        got = ref(torch.from_numpy(np.asarray(x)))
    assert _maxdiff(mine, got) < 1e-4


def test_golden_duration_pitch_predictor():
    dp = DurationPitchPredictor(
        dim=64, dim_encoded_prompts=64, depth=2, kernel_size=3, heads=2,
        dim_head=16, dim_hidden=64, dropout=0.0, use_flash_attn=False,
        num_convolutions_per_block=2, num_convs_per_resnet_block=2,
    )
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (2, 9, 64))
    prompts = jax.random.normal(jax.random.fold_in(key, 1), (2, 7, 64))
    pmask = jnp.arange(7)[None, :] < jnp.array([7, 5])[:, None]
    variables = dp.init(jax.random.fold_in(key, 2), x, prompts, pmask)
    dur, pit = dp.apply(variables, x, prompts, pmask, deterministic=True)

    ref = REF.ns2.DurationPitchPredictor(
        dim=64, depth=2, kernel_size=3, heads=2, dim_head=16,
        dim_hidden=64, dropout=0.0, use_flash_attn=False,
        num_convolutions_per_block=2, num_convs_per_resnet_block=2,
    )
    dst = {}
    convert.duration_pitch_predictor(variables["params"], dst, "", 2)
    convert.load_into(ref, dst)
    ref.eval()
    # the trunk's cross_attn_include_queries prepends the 9 queries to the
    # keys but the reference does not extend the key-padding mask
    # (attend.py:138 errors) — same documented defect as the perceiver;
    # golden-check against the queries-extended mask the repo implies.
    ext = np.concatenate(
        [np.ones((2, 9), bool), np.asarray(pmask)], axis=1
    )
    with torch.no_grad():
        rdur, rpit = ref(
            torch.from_numpy(np.asarray(x)),
            torch.from_numpy(np.asarray(prompts)),
            prompt_mask=torch.from_numpy(ext),
        )
    assert _maxdiff(dur, rdur) < 1e-4
    assert _maxdiff(pit, rpit) < 1e-4


@pytest.fixture(scope="module")
def aligner_pair():
    net = AlignerNet(dim_in=16, dim_hidden=64, attn_channels=16)
    key = jax.random.PRNGKey(4)
    queries = jax.random.normal(key, (2, 21, 16))  # mel frames [b, t_y, d]
    keys = jax.random.normal(jax.random.fold_in(key, 1), (2, 9, 64))
    mask = jnp.arange(9)[None, :] < jnp.array([9, 6])[:, None]
    variables = net.init(jax.random.fold_in(key, 2), queries, keys, mask)

    ref = REF.aligner.AlignerNet(dim_in=16, dim_hidden=64, attn_channels=16)
    dst = {}
    convert.aligner_net(variables["params"], dst)
    convert.load_into(ref, dst)
    ref.eval()
    return net, variables, ref, queries, keys, mask


def test_golden_aligner_net(aligner_pair):
    net, variables, ref, queries, keys, mask = aligner_pair
    attn, logp = net.apply(variables, queries, keys, mask)

    with torch.no_grad():
        # reference takes channels-first conv inputs; run UNMASKED to read
        # the raw pairwise distances (its in-place masked_fill would
        # otherwise poison the sign comparison)
        rattn_raw, rlogp_raw = ref(
            torch.from_numpy(np.asarray(queries)).permute(0, 2, 1),
            torch.from_numpy(np.asarray(keys)).permute(0, 2, 1),
            mask=None,
        )
    # sign relationship: repo logits = −(reference cdist)
    valid = np.asarray(mask)[:, None, None, :]
    assert _maxdiff(
        np.where(valid, np.asarray(logp), 0.0),
        np.where(valid, -rlogp_raw.numpy(), 0.0),
    ) < 1e-4
    # repo soft attention == softmax of the corrected-sign masked logits
    corrected = (-rlogp_raw).masked_fill(
        ~torch.from_numpy(np.asarray(mask))[:, None, None, :],
        -torch.finfo(torch.float32).max,
    )
    expected = corrected.softmax(dim=-1)
    assert _maxdiff(attn, expected) < 1e-5


def test_golden_maximum_path(aligner_pair):
    net, variables, ref, queries, keys, mask = aligner_pair
    attn, _ = net.apply(variables, queries, keys, mask)
    # ref Aligner wrapper layout (aligner.py:205-215): value [b, t_x, t_y],
    # mask = text-mask × frame-mask
    value = jnp.asarray(np.asarray(attn)[:, 0].transpose(0, 2, 1))
    amask = (jnp.asarray(mask)[:, :, None]
             & jnp.ones((2, 21), bool)[:, None, :])
    mine = maximum_path(value, amask)
    got = REF.aligner.maximum_path(
        torch.from_numpy(np.asarray(value)),
        torch.from_numpy(np.asarray(amask)),
    )
    assert _maxdiff(mine, got) < 1e-6


def test_golden_forward_sum_loss(aligner_pair):
    net, variables, ref, queries, keys, mask = aligner_pair
    _, logp = net.apply(variables, queries, keys, mask)
    key_lens = jnp.array([9, 6])
    query_lens = jnp.array([21, 21])
    mine = ForwardSumLoss().apply({}, logp, key_lens, query_lens)
    ref_loss = REF.aligner.ForwardSumLoss()
    got = ref_loss(
        torch.from_numpy(np.asarray(logp)).clone(),
        torch.from_numpy(np.asarray(key_lens)),
        torch.from_numpy(np.asarray(query_lens)),
    )
    assert abs(float(mine) - float(got)) < 1e-3, (float(mine), float(got))


def test_golden_bin_loss(aligner_pair):
    net, variables, ref, queries, keys, mask = aligner_pair
    attn, logp = net.apply(variables, queries, keys, mask)
    value = jnp.asarray(np.asarray(attn)[:, 0].transpose(0, 2, 1))
    amask = (jnp.asarray(mask)[:, :, None]
             & jnp.ones((2, 21), bool)[:, None, :])
    hard = maximum_path(value, amask)
    key_lens = jnp.array([9, 6])
    mine = BinLoss().apply({}, hard, logp, key_lens)
    ref_loss = REF.aligner.BinLoss()
    got = ref_loss(
        torch.from_numpy(np.asarray(hard)),
        torch.from_numpy(np.asarray(logp)).clone(),
        torch.from_numpy(np.asarray(key_lens)),
    )
    # documented sign correction: repo loss = −(reference sum)
    assert abs(float(mine) - (-float(got))) < 1e-3, (float(mine), float(got))
