"""Self-conditioning — declared by the reference (`train_prob_self_cond`,
naturalspeech2_pytorch.py:1179,1279) but left unimplemented (README TODO
:157). Here it is real: zero-init projection of the previous x₀ estimate
into the denoiser, bootstrap pass during training, x₀ carried through the
sampling scan."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# every test here builds + traces a full NaturalSpeech2 (10-55 s each)
pytestmark = pytest.mark.slow

from naturalspeech2_tpu.models.codec import SoundStream
from naturalspeech2_tpu.models.denoiser import Model
from naturalspeech2_tpu.models.naturalspeech2 import (
    NaturalSpeech2,
    ddim_sample,
    sample,
)
from naturalspeech2_tpu.ops.schedules import sigmoid_schedule

KEY = jax.random.PRNGKey(0)


def _model(self_cond=True):
    return Model(
        dim=16, depth=1, heads=2, dim_head=8, wavenet_layers=2,
        wavenet_stacks=2, use_flash_attn=False, self_cond=self_cond,
    )


def test_zero_init_projection_is_noop():
    """At init, feeding any x_self_cond must not change the output (the
    projection kernel is zero-init), so enabling the flag is safe."""
    model = _model()
    x = jax.random.normal(KEY, (2, 32, 16))
    times = jnp.array([0.3, 0.7])
    variables = model.init(jax.random.fold_in(KEY, 1), x, times)
    out_none = model.apply(variables, x, times)
    out_sc = model.apply(
        variables, x, times, x_self_cond=jax.random.normal(KEY, x.shape)
    )
    np.testing.assert_allclose(np.asarray(out_none), np.asarray(out_sc), atol=1e-6)


def test_self_cond_affects_output_after_perturbation():
    model = _model()
    x = jax.random.normal(KEY, (2, 32, 16))
    times = jnp.array([0.3, 0.7])
    variables = model.init(jax.random.fold_in(KEY, 1), x, times)
    # nudge the projection kernel off zero
    params = jax.tree_util.tree_map(lambda p: p, variables["params"])
    params = flax_unfreeze(params)
    params["to_self_cond"]["kernel"] = (
        jnp.ones_like(params["to_self_cond"]["kernel"]) * 0.1
    )
    v2 = {"params": params}
    out_a = model.apply(v2, x, times, x_self_cond=jnp.zeros_like(x))
    out_b = model.apply(v2, x, times, x_self_cond=jnp.ones_like(x))
    assert not np.allclose(np.asarray(out_a), np.asarray(out_b))


def flax_unfreeze(tree):
    import flax

    return flax.core.unfreeze(tree) if isinstance(
        tree, flax.core.FrozenDict
    ) else dict(tree)


def test_training_loss_with_self_cond():
    codec = SoundStream(
        codebook_dim=16, channels=4, num_quantizers=2, codebook_size=16,
        use_pallas_rvq=False,
    )
    ns2 = NaturalSpeech2(model=_model(), codec=codec, timesteps=4)
    audio = jax.random.uniform(KEY, (2, 4 * 320), minval=-1, maxval=1)
    rngs = {
        k: jax.random.fold_in(KEY, i)
        for i, k in enumerate(("params", "times", "noise", "self_cond"))
    }
    variables = ns2.init(rngs, audio)
    losses = ns2.apply(
        variables, audio,
        rngs={k: rngs[k] for k in ("times", "noise", "self_cond")},
    )
    assert np.isfinite(float(losses["loss"]))
    # gradient flows into the self-cond projection
    def loss_fn(params):
        return ns2.apply(
            {"params": params}, audio,
            rngs={k: rngs[k] for k in ("times", "noise", "self_cond")},
        )["loss"]

    g = jax.grad(loss_fn)(variables["params"])
    assert "to_self_cond" in g["model"]


def test_sampling_carries_self_cond():
    """With a non-zero projection, the sampler's carried x₀ must influence
    the result: zeroing the carry (self_cond=False path on the same
    weights) produces a different sample."""
    model = _model()
    x = jax.random.normal(KEY, (1, 32, 16))
    variables = model.init(jax.random.fold_in(KEY, 1), x, jnp.zeros((1,)))
    params = flax_unfreeze(variables["params"])
    params["to_self_cond"] = dict(params["to_self_cond"])
    params["to_self_cond"]["kernel"] = (
        jnp.eye(16) * 0.3
    )
    v2 = {"params": params}

    def denoise_fn(audio, times, x_self_cond=None):
        return model.apply(v2, audio, times, x_self_cond=x_self_cond)

    out_sc = ddim_sample(
        denoise_fn, KEY, (1, 32, 16), timesteps=6,
        gamma_schedule=sigmoid_schedule, self_cond=True,
    )
    out_nosc = ddim_sample(
        lambda a, t: denoise_fn(a, t, None), KEY, (1, 32, 16), timesteps=6,
        gamma_schedule=sigmoid_schedule, self_cond=False,
    )
    assert np.all(np.isfinite(np.asarray(out_sc)))
    assert not np.allclose(np.asarray(out_sc), np.asarray(out_nosc))


def test_end_to_end_sample_with_self_cond():
    codec = SoundStream(
        codebook_dim=16, channels=4, num_quantizers=2, codebook_size=16,
        use_pallas_rvq=False,
    )
    ns2 = NaturalSpeech2(model=_model(), codec=codec, timesteps=4)
    audio = jax.random.uniform(KEY, (2, 4 * 320), minval=-1, maxval=1)
    rngs = {
        k: jax.random.fold_in(KEY, i)
        for i, k in enumerate(("params", "times", "noise", "self_cond"))
    }
    variables = ns2.init(rngs, audio)
    cp = codec.init(KEY, audio)["params"]
    variables = {"params": dict(variables["params"], codec=cp)}
    wav = sample(ns2, variables, KEY, length=4, batch_size=2)
    assert wav.shape == (2, 1280)
    assert np.all(np.isfinite(np.asarray(wav)))
