import jax
import jax.numpy as jnp
import numpy as np
import pytest

from naturalspeech2_tpu.models.codec import SoundStream

# integration-scale: runs in the full (CI) matrix; 'pytest -m "not slow"' is the fast default
pytestmark = pytest.mark.slow


KEY = jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def codec_and_params():
    codec = SoundStream(
        codebook_dim=32, channels=4, num_quantizers=2, codebook_size=16,
        use_pallas_rvq=False,
    )
    audio = jax.random.uniform(KEY, (2, 3200), minval=-1, maxval=1)
    params = codec.init(KEY, audio)  # full path → creates encoder+decoder+codebooks
    return codec, params


def test_hop_is_320(codec_and_params):
    codec, _ = codec_and_params
    assert codec.seq_len_multiple_of == 320
    assert codec.target_sample_hz == 24000


def test_encode_contract(codec_and_params):
    codec, params = codec_and_params
    audio = jax.random.uniform(jax.random.PRNGKey(1), (2, 3200), minval=-1, maxval=1)
    latents, codes, _ = codec.apply(params, audio, return_encoded=True)
    assert latents.shape == (2, 10, 32)
    assert codes.shape == (2, 10, 2)
    assert codes.dtype == jnp.int32


def test_curtail_behavior(codec_and_params):
    codec, params = codec_and_params
    audio = jax.random.uniform(jax.random.PRNGKey(2), (1, 3200 + 100), minval=-1, maxval=1)
    lat_right, _, _ = codec.apply(params, audio, return_encoded=True)
    assert lat_right.shape[1] == 10
    # curtail_from_left keeps the END of the audio
    lat_left, _, _ = codec.apply(
        params, audio, return_encoded=True, curtail_from_left=True
    )
    ref, _, _ = codec.apply(params, audio[..., 100:], return_encoded=True)
    np.testing.assert_allclose(np.asarray(lat_left), np.asarray(ref), atol=1e-5)


def test_decode_roundtrip_shape(codec_and_params):
    codec, params = codec_and_params
    latents = jax.random.normal(jax.random.PRNGKey(3), (2, 10, 32))
    audio = codec.apply(params, latents, method=codec.decode)
    assert audio.shape == (2, 3200)


def test_rq_loss(codec_and_params):
    codec, params = codec_and_params
    audio = jax.random.uniform(jax.random.PRNGKey(4), (2, 3200), minval=-1, maxval=1)
    latents, codes, _ = codec.apply(params, audio, return_encoded=True)
    quantized, ce = codec.apply(params, latents, codes, method=codec.rq)
    assert quantized.shape == latents.shape
    assert np.isfinite(float(ce))


def test_codec_loss_grads(codec_and_params):
    codec, params = codec_and_params
    audio = jax.random.uniform(jax.random.PRNGKey(5), (1, 640), minval=-1, maxval=1)

    def loss_fn(p):
        losses = codec.apply(p, audio, method=codec.codec_loss)
        return losses["recon"] + 0.25 * losses["commitment"]

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # encoder gets gradient signal (commitment + recon through STE)
    flat = jax.tree_util.tree_leaves(
        {k: v for k, v in g["params"].items() if "encoder" in k}
    )
    assert any(float(jnp.abs(l).max()) > 0 for l in flat)


def test_reconstruction_path(codec_and_params):
    codec, params = codec_and_params
    audio = jax.random.uniform(jax.random.PRNGKey(6), (1, 640), minval=-1, maxval=1)
    recon = codec.apply(params, audio)
    assert recon.shape == audio.shape
