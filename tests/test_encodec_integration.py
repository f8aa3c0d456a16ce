"""`models.encodec.Encodec` behind the NaturalSpeech2 codec boundary.

The Encodec port must be a drop-in for SoundStream at the L0 contract
(SURVEY.md §2.5 row 1): raw-audio training forward, prompt processing
with `curtail_from_left`, and sample→decode shapes (ref :1445,:1496,
:1611,:1682).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from naturalspeech2_tpu.models.denoiser import Model
from naturalspeech2_tpu.models.encodec import Encodec
from naturalspeech2_tpu.models.naturalspeech2 import NaturalSpeech2, sample


@pytest.fixture(scope="module")
def tiny():
    codec = Encodec(
        codebook_dim=16,
        num_filters=4,
        upsampling_ratios=(4, 2),
        num_quantizers=2,
        codebook_size=32,
        num_lstm_layers=1,
        use_pallas_rvq=False,
    )
    model = Model(
        dim=16, depth=1, heads=2, dim_head=8, wavenet_layers=1,
        wavenet_stacks=1, condition_on_prompt=False, use_flash_attn=False,
        use_fused_wavenet=False,
    )
    ns2 = NaturalSpeech2(model=model, codec=codec, timesteps=4)
    return ns2, codec


def test_contract_shapes(tiny):
    ns2, codec = tiny
    wav = jax.random.normal(jax.random.PRNGKey(0), (2, 8 * 11 + 5)) * 0.2
    # init through the full encode→quantize→decode path so decoder params
    # exist too
    variables = codec.init(jax.random.PRNGKey(1), wav)
    latents, codes, none = codec.apply(
        variables, wav, return_encoded=True, curtail_from_left=True
    )
    assert latents.shape == (2, 11, 16)
    assert codes.shape == (2, 11, 2)
    assert none is None
    # curtail_from_left drops the first samples, not the last
    latents2, _, _ = codec.apply(variables, wav[:, 5:], return_encoded=True)
    np.testing.assert_allclose(
        np.asarray(latents), np.asarray(latents2), atol=1e-6
    )

    q, ce = codec.apply(variables, latents, codes, method=codec.rq)
    assert q.shape == latents.shape and ce.shape == ()

    audio = codec.apply(variables, latents, method=codec.decode)
    assert audio.shape == (2, 11 * 8)


def test_ns2_train_and_sample_through_encodec(tiny):
    ns2, _ = tiny
    wav = jax.random.normal(jax.random.PRNGKey(2), (2, 8 * 16)) * 0.2
    variables = ns2.init(
        {"params": jax.random.PRNGKey(3), "times": jax.random.PRNGKey(4),
         "noise": jax.random.PRNGKey(5)},
        wav,
    )
    # decoder params are only traced by sampling; init them via the codec
    codec_full = ns2.codec.init(jax.random.PRNGKey(3), wav)
    params = dict(variables["params"])
    params["codec"] = codec_full["params"]
    variables = {"params": params}
    losses = ns2.apply(
        variables, wav,
        rngs={"times": jax.random.PRNGKey(6), "noise": jax.random.PRNGKey(7)},
    )
    assert jnp.isfinite(losses["loss"])

    audio = sample(ns2, variables, jax.random.PRNGKey(8), length=12)
    assert audio.shape == (1, 12 * 8)
    assert bool(jnp.all(jnp.isfinite(audio)))
