"""Direct numerical parity vs the reference with SHARED weights.

Every test here initializes a repo flax module, then runs the same weights
through `tests/reference_oracle.py` — a numpy transliteration of the
reference forward math (`/root/reference/naturalspeech2_pytorch/
naturalspeech2_pytorch.py`). Any structural divergence between the repo
implementation and the reference shows up as a failed closeness assertion.
This is the measurement behind the north-star "<1e-3 latent MSE vs
reference @ 100-step CFG sampling" (BASELINE.json; VERDICT r1 item 2).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import reference_oracle as oracle
from naturalspeech2_tpu.models.denoiser import Model, forward_with_cond_scale
from naturalspeech2_tpu.models.encoders import PerceiverResampler
from naturalspeech2_tpu.models.naturalspeech2 import ddim_sample
from naturalspeech2_tpu.models.transformer import ConditionableTransformer
from naturalspeech2_tpu.models.wavenet import Wavenet
from naturalspeech2_tpu.ops.schedules import sigmoid_schedule

CFG = dict(
    dim=32, depth=2, heads=2, dim_head=16, ff_mult=4,
    wavenet_layers=2, wavenet_stacks=2,
    condition_on_prompt=True, dim_prompt=24, resampler_depth=1,
)


def _mse(a, b):
    return float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))


def _maxdiff(a, b):
    return float(np.max(np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64))))


@pytest.fixture(scope="module")
def cond_model():
    model = Model(
        dim=CFG["dim"], depth=CFG["depth"], heads=CFG["heads"],
        dim_head=CFG["dim_head"], wavenet_layers=CFG["wavenet_layers"],
        wavenet_stacks=CFG["wavenet_stacks"], dim_prompt=CFG["dim_prompt"],
        num_latents_m=4, resampler_depth=CFG["resampler_depth"],
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
    return model, variables, x, times, prompt, cond


def test_wavenet_parity():
    wn = Wavenet(dim=16, stacks=3, layers=3, dim_cond_mult=4)
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (2, 40, 16))
    t = jax.random.normal(jax.random.fold_in(key, 1), (2, 64))
    variables = wn.init(jax.random.fold_in(key, 2), x, t)
    mine = wn.apply(variables, x, t)
    ref = oracle.wavenet(variables["params"], np.asarray(x), np.asarray(t), 3, 3)
    assert _maxdiff(mine, ref) < 1e-4, _maxdiff(mine, ref)


def test_conditionable_transformer_parity():
    tr = ConditionableTransformer(
        dim=32, depth=2, dim_head=16, heads=2, ff_causal_conv=True,
        dim_cond_mult=4, cross_attn=True, gelu_approximate=False,
    )
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (2, 48, 32))
    t = jax.random.normal(jax.random.fold_in(key, 1), (2, 128))
    ctx = jax.random.normal(jax.random.fold_in(key, 2), (2, 7, 32))
    variables = tr.init(jax.random.fold_in(key, 3), x, times=t, context=ctx)
    mine = tr.apply(variables, x, times=t, context=ctx)
    ref = oracle.conditionable_transformer(
        variables["params"], np.asarray(x), np.asarray(t),
        depth=2, dim=32, heads=2, dim_head=16, ff_mult=4,
        context=np.asarray(ctx), cross_attn=True,
    )
    assert _maxdiff(mine, ref) < 1e-4, _maxdiff(mine, ref)


def test_perceiver_resampler_parity():
    pr = PerceiverResampler(
        dim=32, depth=2, dim_context=24, num_latents=4, dim_head=16, heads=2,
        gelu_approximate=False,
    )
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (2, 13, 24))
    variables = pr.init(jax.random.fold_in(key, 1), x)
    # strict reference semantics: mask=None (the reference errors on any
    # real mask with cross_attn_include_queries — transformer.py docstring)
    mine = pr.apply(variables, x)
    ref = oracle.perceiver_resampler(
        variables["params"], np.asarray(x), dim=32, depth=2, heads=2,
        dim_head=16,
    )
    assert _maxdiff(mine, ref) < 1e-4, _maxdiff(mine, ref)
    # repo extension: masked prompt (queries padded valid)
    mask = jnp.arange(13)[None, :] < jnp.array([[9], [13]])
    mine_m = pr.apply(variables, x, mask=mask)
    ref_m = oracle.perceiver_resampler(
        variables["params"], np.asarray(x), dim=32, depth=2, heads=2,
        dim_head=16, mask=np.asarray(mask),
    )
    assert _maxdiff(mine_m, ref_m) < 1e-4


def test_model_forward_parity_conditioned(cond_model):
    model, variables, x, times, prompt, cond = cond_model
    mine = model.apply(
        variables, x, times, prompt=prompt, cond=cond,
        cond_drop_mask=jnp.zeros((2,), bool),
    )
    ref = oracle.model_forward(
        variables["params"], CFG, np.asarray(x), np.asarray(times),
        prompt=np.asarray(prompt), cond=np.asarray(cond), cond_drop=False,
    )
    assert _maxdiff(mine, ref) < 1e-4, _maxdiff(mine, ref)


def test_model_forward_parity_null(cond_model):
    """cond_drop_prob=1 path: null prompt cond / null tokens / null cond."""
    model, variables, x, times, prompt, cond = cond_model
    mine = model.apply(
        variables, x, times, prompt=prompt, cond=cond,
        cond_drop_mask=jnp.ones((2,), bool),
    )
    ref = oracle.model_forward(
        variables["params"], CFG, np.asarray(x), np.asarray(times),
        prompt=np.asarray(prompt), cond=np.asarray(cond), cond_drop=True,
    )
    assert _maxdiff(mine, ref) < 1e-4, _maxdiff(mine, ref)


def test_cfg_fused_matches_reference_two_pass(cond_model):
    """The repo's batch-doubled CFG == the reference's two sequential
    forwards lerped by cond_scale (ref :914-927)."""
    model, variables, x, times, prompt, cond = cond_model
    mine = forward_with_cond_scale(
        model, variables, x, times, prompt=prompt, cond=cond, cond_scale=2.5
    )
    ref = oracle.forward_with_cond_scale(
        variables["params"], CFG, np.asarray(x), np.asarray(times),
        cond_scale=2.5, prompt=np.asarray(prompt), cond=np.asarray(cond),
    )
    assert _maxdiff(mine, ref) < 2e-4, _maxdiff(mine, ref)


def test_unconditional_model_parity():
    model = Model(
        dim=32, depth=2, heads=2, dim_head=16, wavenet_layers=2,
        wavenet_stacks=2, use_flash_attn=False, use_fused_wavenet=False,
        gelu_approximate=False,
    )
    key = jax.random.PRNGKey(5)
    x = jax.random.normal(key, (2, 48, 32))
    times = jnp.array([0.1, 0.9])
    variables = model.init(jax.random.fold_in(key, 1), x, times)
    mine = model.apply(variables, x, times)
    cfg = dict(CFG, condition_on_prompt=False)
    ref = oracle.model_forward(
        variables["params"], cfg, np.asarray(x), np.asarray(times)
    )
    assert _maxdiff(mine, ref) < 1e-4, _maxdiff(mine, ref)


def test_ddim_cfg_sampling_latent_mse(cond_model):
    """Latent MSE between the repo's scanned, CFG-fused DDIM loop and the
    reference ddim_sample transliteration over 20 steps at cond_scale=2."""
    model, variables, x, times, prompt, cond = cond_model
    key = jax.random.PRNGKey(11)
    shape = (2, 48, CFG["dim"])

    def denoise_fn(audio, ts):
        return forward_with_cond_scale(
            model, variables, audio, ts,
            prompt=prompt, cond=cond, cond_scale=2.0,
        )

    mine = ddim_sample(
        denoise_fn, key, shape, timesteps=20,
        gamma_schedule=sigmoid_schedule, objective="v",
    )
    audio0 = np.asarray(jax.random.normal(key, shape))
    ref = oracle.ddim_sample(
        variables["params"], CFG, audio0, timesteps=20, cond_scale=2.0,
        objective="v", prompt=np.asarray(prompt), cond=np.asarray(cond),
    )
    mse = _mse(mine, ref)
    assert mse < 1e-3, f"latent MSE {mse} vs north-star 1e-3"
    # at f32-vs-f64 the only divergence should be rounding noise
    assert mse < 1e-6, f"latent MSE {mse}"


@pytest.mark.parametrize("objective", ["eps", "x0"])
def test_ddim_objective_step_parity(cond_model, objective):
    """The eps/x0 objectives differ from v only in the x₀ reconstruction
    (ref :1414-1421); compare ONE DDIM update at a well-conditioned t.
    (A multi-step rollout with a *random* eps model divides by α≈3e-5 near
    t=1, amplifying f32-vs-f64 rounding chaotically — not a parity signal.)
    """
    from naturalspeech2_tpu.models.naturalspeech2 import (
        _reconstruct_x0,
        safe_div,
    )
    from naturalspeech2_tpu.ops.schedules import gamma_to_alpha_sigma

    model, variables, x, times, prompt, cond = cond_model
    audio = np.asarray(x)
    t, t_next = 0.5, 0.45
    ts = jnp.full((2,), t)

    out = forward_with_cond_scale(
        model, variables, jnp.asarray(audio), ts,
        prompt=prompt, cond=cond, cond_scale=1.5,
    )
    gamma, gamma_next = sigmoid_schedule(jnp.float32(t)), sigmoid_schedule(
        jnp.float32(t_next)
    )
    alpha, sigma = gamma_to_alpha_sigma(gamma)
    alpha_n, sigma_n = gamma_to_alpha_sigma(gamma_next)
    x_start = _reconstruct_x0(objective, jnp.asarray(audio), out, alpha, sigma)
    mine = x_start * alpha_n + safe_div(
        jnp.asarray(audio) - alpha * x_start, sigma
    ) * sigma_n

    ref_out = oracle.forward_with_cond_scale(
        variables["params"], CFG, audio, np.full((2,), t), cond_scale=1.5,
        prompt=np.asarray(prompt), cond=np.asarray(cond),
    )
    g, gn = oracle.sigmoid_schedule(t), oracle.sigmoid_schedule(t_next)
    a, s = oracle.gamma_to_alpha_sigma(g)
    an, sn = oracle.gamma_to_alpha_sigma(gn)
    if objective == "x0":
        ref_x0 = ref_out
    else:
        ref_x0 = oracle.safe_div(audio - s * ref_out, a)
    ref = ref_x0 * an + oracle.safe_div(audio - a * ref_x0, s) * sn
    assert _mse(mine, ref) < 1e-6, _mse(mine, ref)


@pytest.mark.slow
def test_flagship_100step_cfg_parity():
    """North-star shape-class run: flagship dims (128/depth 6/heads 8),
    100-step CFG DDIM, latent MSE < 1e-3. Sequence shortened to 256 frames
    to keep the numpy oracle tractable on one CPU core; the math exercised
    is identical at n=1024."""
    cfg = dict(
        dim=128, depth=6, heads=8, dim_head=64, ff_mult=4,
        wavenet_layers=8, wavenet_stacks=4,
        condition_on_prompt=True, dim_prompt=512, resampler_depth=2,
    )
    model = Model(
        dim=128, depth=6, heads=8, dim_head=64, wavenet_layers=8,
        wavenet_stacks=4, dim_prompt=512, num_latents_m=32,
        resampler_depth=2, condition_on_prompt=True,
        use_flash_attn=False, use_fused_wavenet=False,
        gelu_approximate=False,
    )
    key = jax.random.PRNGKey(42)
    kp, kc, ki, ks = jax.random.split(key, 4)
    n = 256
    prompt = jax.random.normal(kp, (1, 64, 512))
    cond = jax.random.normal(kc, (1, n, 512))
    x0 = jax.random.normal(ki, (1, n, 128))
    variables = model.init(
        jax.random.fold_in(key, 9), x0, jnp.array([0.5]), prompt=prompt,
        cond=cond, cond_drop_mask=jnp.zeros((1,), bool),
    )

    def denoise_fn(audio, ts):
        return forward_with_cond_scale(
            model, variables, audio, ts,
            prompt=prompt, cond=cond, cond_scale=2.0,
        )

    mine = jax.jit(
        lambda k: ddim_sample(
            denoise_fn, k, (1, n, 128), timesteps=100,
            gamma_schedule=sigmoid_schedule, objective="v",
        )
    )(ks)
    audio0 = np.asarray(jax.random.normal(ks, (1, n, 128)))
    ref = oracle.ddim_sample(
        variables["params"], cfg, audio0, timesteps=100, cond_scale=2.0,
        objective="v", prompt=np.asarray(prompt), cond=np.asarray(cond),
    )
    mse = _mse(mine, ref)
    print(f"flagship 100-step CFG latent MSE: {mse:.3e}")
    assert mse < 1e-3, f"latent MSE {mse} vs north-star 1e-3"


def test_default_config_still_meets_north_star():
    """The DEFAULT model (tanh-approximate gelu — the TPU-fast setting)
    must still satisfy the <1e-3 latent-MSE north star against the
    exact-erf reference oracle. (Measured at flagship dims: 1.8e-08 vs
    1.3e-12 for exact; see FeedForward.gelu_approximate.)"""
    model = Model(
        dim=CFG["dim"], depth=CFG["depth"], heads=CFG["heads"],
        dim_head=CFG["dim_head"], wavenet_layers=CFG["wavenet_layers"],
        wavenet_stacks=CFG["wavenet_stacks"], dim_prompt=CFG["dim_prompt"],
        num_latents_m=4, resampler_depth=CFG["resampler_depth"],
        condition_on_prompt=True, use_flash_attn=False,
        use_fused_wavenet=False,  # default gelu_approximate=True
    )
    key = jax.random.PRNGKey(21)
    kx, kp, kc, ki = jax.random.split(key, 4)
    prompt = jax.random.normal(kp, (2, 11, CFG["dim_prompt"]))
    cond = jax.random.normal(kc, (2, 37, CFG["dim_prompt"]))
    x = jax.random.normal(kx, (2, 48, CFG["dim"]))
    variables = model.init(
        ki, x, jnp.array([0.5, 0.5]), prompt=prompt, cond=cond,
        cond_drop_mask=jnp.zeros((2,), bool),
    )

    def denoise_fn(audio, ts):
        return forward_with_cond_scale(
            model, variables, audio, ts,
            prompt=prompt, cond=cond, cond_scale=2.0,
        )

    skey = jax.random.PRNGKey(22)
    mine = ddim_sample(
        denoise_fn, skey, (2, 48, CFG["dim"]), timesteps=20,
        gamma_schedule=sigmoid_schedule, objective="v",
    )
    audio0 = np.asarray(jax.random.normal(skey, (2, 48, CFG["dim"])))
    ref = oracle.ddim_sample(
        variables["params"], CFG, audio0, timesteps=20, cond_scale=2.0,
        objective="v", prompt=np.asarray(prompt), cond=np.asarray(cond),
    )
    mse = _mse(mine, ref)
    assert mse < 1e-3, f"default-config latent MSE {mse} vs north-star 1e-3"
