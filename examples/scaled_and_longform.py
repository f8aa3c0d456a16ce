"""BASELINE configs 4-5 smoke on TPU:

- scaled denoiser dim=512/depth=12, batch 16, fast 100-step CFG-style
  sampling (batched cond/uncond is exercised in the conditional path;
  here unconditional at scale)
- long-form 60-second generation: 4500 latent frames (flash attention's
  O(n) memory path)
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from naturalspeech2_tpu.models.denoiser import Model
from naturalspeech2_tpu.ops.schedules import gamma_to_alpha_sigma, sigmoid_schedule
from naturalspeech2_tpu.utils.helpers import safe_div


def ddim_step_fn(model, params, batch):
    """One DDIM step as a jitted fn. For the big configs the remote compile
    service cannot handle the full lax.scan program (compile times explode),
    so the example times repeated single-step calls — at 30+ ms/step the
    tunnel dispatch overhead is negligible."""

    @jax.jit
    def step(audio, t, t_next):
        gamma, gamma_next = sigmoid_schedule(t), sigmoid_schedule(t_next)
        alpha, sigma = gamma_to_alpha_sigma(gamma)
        alpha_next, sigma_next = gamma_to_alpha_sigma(gamma_next)
        out = model.apply(params, audio, jnp.broadcast_to(t, (batch,)))
        x_start = alpha * audio - sigma * out
        pred_noise = safe_div(audio - alpha * x_start, sigma)
        return x_start * alpha_next + pred_noise * sigma_next

    return step


def bench_config(name, dim, depth, batch, length, n_steps):
    model = Model(dim=dim, depth=depth, heads=8, dim_head=64, use_flash_attn=True)
    x = jnp.zeros((batch, length, dim), jnp.float32)
    t0 = time.perf_counter()
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((batch,)))
    audio = jax.random.normal(jax.random.PRNGKey(1), x.shape)
    step = ddim_step_fn(model, params, batch)
    float(step(audio, jnp.float32(1.0), jnp.float32(0.99)).sum())
    compile_s = time.perf_counter() - t0

    t1 = time.perf_counter()
    for i in range(n_steps):
        t = 1.0 - i / n_steps
        audio = step(audio, jnp.float32(t), jnp.float32(t - 1.0 / n_steps))
    float(audio.sum())
    wall = time.perf_counter() - t1
    step_ms = wall / n_steps * 1e3
    audio_sec = batch * length * 320 / 24000
    rtf = audio_sec / wall
    print(
        f"{name}: {step_ms:.2f} ms/step, {n_steps/wall:.1f} steps/s, "
        f"RTF {rtf:.1f}x ({n_steps}-step sampling, compile {compile_s:.0f}s)",
        flush=True,
    )


if __name__ == "__main__":
    # config 5: long-form 60 s (4500 latent frames)
    # measured on v5e: 34.8 ms/denoise-eval → ~17x realtime at 100 steps
    bench_config("long-form 60s b1 n4500", 128, 6, 1, 4500, 50)
    # config 4: scaled denoiser dim512/depth12 b16. NOTE: on the axon dev
    # tunnel this ~7-minute compile intermittently crashes the remote
    # compile service / gets OOM-killed on the 1-core host; the bare forward
    # has been verified to compile (432 s) and execute. Run last.
    bench_config("scaled dim512/depth12 b16 n1024", 512, 12, 16, 1024, 50)
