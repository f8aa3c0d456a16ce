"""Progressive distillation end-to-end: train a toy latent diffusion model,
run the full halving schedule (64 → 4 DDIM steps), and measure how close
the 4-step student lands to the 64-step teacher vs naively running the
teacher at 4 steps.

The reference cites progressive distillation as future work and never
implements it (`/root/reference/README.md:189-197`); this demonstrates the
TPU-native implementation (`naturalspeech2_tpu/distill.py`) actually
distilling. Data is a 2-factor sinusoidal latent manifold — structured
enough that the teacher learns a real conditional distribution in ~2k
steps at toy scale.

Usage: python examples/distill_fast_sampler.py
(runs anywhere; ~a few minutes on the v5e via the axon tunnel)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from naturalspeech2_tpu.distill import ProgressiveDistiller
from naturalspeech2_tpu.models.denoiser import Model
from naturalspeech2_tpu.models.naturalspeech2 import NaturalSpeech2, ddim_sample

B, N, D = 8, 64, 32
TRAIN_STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
UPDATES_PER_ROUND = int(sys.argv[2]) if len(sys.argv) > 2 else 400
CHUNK = 50  # updates per jitted scan (amortizes tunnel dispatch)


def latent_manifold_batch(key, b=B):
    """[b, N, D] latents on a 2-factor sinusoidal manifold."""
    k1, k2 = jax.random.split(key)
    proj = jax.random.normal(jax.random.PRNGKey(777), (2, D)) / np.sqrt(2)
    freq = jax.random.uniform(k1, (b, 1, 1), minval=1.0, maxval=3.0)
    phase = jax.random.uniform(k2, (b, 1, 1), minval=0.0, maxval=2 * np.pi)
    pos = jnp.linspace(0.0, 1.0, N)[None, :, None]
    w1 = jnp.sin(2 * np.pi * freq * pos + phase)
    w2 = jnp.cos(2 * np.pi * freq * pos + phase)
    return w1 * proj[0] + w2 * proj[1]


def main():
    on_tpu = jax.default_backend() == "tpu"
    model = Model(
        dim=D, depth=2, heads=4, dim_head=16, wavenet_layers=2,
        wavenet_stacks=2, use_flash_attn=False, use_fused_wavenet=on_tpu,
    )
    ns2 = NaturalSpeech2(model=model, codec=None, timesteps=64)

    key = jax.random.PRNGKey(0)
    x0 = latent_manifold_batch(key)
    variables = ns2.init(
        {"params": key, "times": key, "noise": key}, x0
    )
    opt = optax.adam(2e-4)
    opt_state = opt.init(variables["params"])

    @jax.jit
    def train_chunk(params, opt_state, keys):
        def step(carry, k):
            params, opt_state = carry
            kd, kt, kn = jax.random.split(k, 3)
            batch = latent_manifold_batch(kd)

            def loss_fn(p):
                out = ns2.apply(
                    {"params": p}, batch, rngs={"times": kt, "noise": kn}
                )
                return out["loss"] if isinstance(out, dict) else out

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            step, (params, opt_state), keys
        )
        return params, opt_state, losses.mean()

    params = variables["params"]
    t0 = time.time()
    for i in range(TRAIN_STEPS // CHUNK):
        key, k = jax.random.split(key)
        params, opt_state, mean_loss = train_chunk(
            params, opt_state, jax.random.split(k, CHUNK)
        )
        if (i + 1) % 10 == 0:
            print(
                f"teacher step {(i + 1) * CHUNK}: loss {float(mean_loss):.4f}"
                f" ({time.time() - t0:.0f}s)"
            )

    teacher_params = {"params": params["model"]}

    # ---- progressive distillation 64 → 4 ------------------------------- #
    def latent_iter():
        k = jax.random.PRNGKey(123)
        while True:
            k, sub = jax.random.split(k)
            yield latent_manifold_batch(sub)

    distiller = ProgressiveDistiller(ns2, teacher_params, lr=1e-4)
    t0 = time.time()
    student_params, history = distiller.run_schedule(
        latent_iter(), start_steps=64, target_steps=4,
        updates_per_round=UPDATES_PER_ROUND, updates_per_jit=CHUNK,
    )
    print(f"distillation schedule ({time.time() - t0:.0f}s):")
    for steps, loss in history:
        print(f"  -> {steps:3d}-step student: final loss {loss:.5f}")

    # ---- evaluate: 4-step student vs 64-step teacher -------------------- #
    def sampler(model_vars, steps, key):
        return ddim_sample(
            lambda audio, times: model.apply(model_vars, audio, times),
            key, (B, N, D),
            timesteps=steps, gamma_schedule=ns2.gamma_schedule,
            objective=ns2.objective, scale=ns2.scale,
        )

    eval_key = jax.random.PRNGKey(9)
    sample_fn = jax.jit(sampler, static_argnums=1)
    ref64 = sample_fn(teacher_params, 64, eval_key)
    naive4 = sample_fn(teacher_params, 4, eval_key)
    student4 = sample_fn(student_params, 4, eval_key)

    def mse(a, b_):
        return float(jnp.mean((a - b_) ** 2))

    print(f"teacher 64-step vs teacher  4-step MSE: {mse(ref64, naive4):.5f}")
    print(f"teacher 64-step vs STUDENT  4-step MSE: {mse(ref64, student4):.5f}")
    ratio = mse(ref64, naive4) / max(mse(ref64, student4), 1e-12)
    print(f"distillation closes the few-step gap by {ratio:.1f}x")


if __name__ == "__main__":
    main()
