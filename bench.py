"""Benchmark: DDPM/DDIM denoise steps/sec/chip at the reference's canonical
config (Model dim=128, depth=6, batch 4, 1024 latent frames — README.md:43-68).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Methodology: the denoise loop is a jitted `lax.scan` of K full denoiser
forwards (the exact per-step cost of `ddim_sample`); timing syncs by pulling
a scalar (`float(out)`) because `block_until_ready` does not reliably
synchronize through the axon device tunnel. `vs_baseline` is TPU steps/sec ÷
CPU steps/sec of the same model (the north-star's "CPU-reference sampling
throughput" — the upstream reference publishes no numbers and its torch deps
are not installed, so the CPU-JAX run of the identical architecture is the
measured stand-in; BASELINE.md)."""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

BATCH = 4
LENGTH = 1024
DIM = 128
DEPTH = 6


def build(platform):
    from naturalspeech2_tpu.models.denoiser import Model
    from naturalspeech2_tpu.ops.schedules import gamma_to_alpha_sigma, sigmoid_schedule
    from naturalspeech2_tpu.utils.helpers import safe_div

    device = jax.devices(platform)[0]
    model = Model(
        dim=DIM, depth=DEPTH, heads=8, dim_head=64,
        use_flash_attn=(platform == "tpu"),
    )
    with jax.default_device(device):
        x = jnp.zeros((BATCH, LENGTH, DIM), jnp.float32)
        params = jax.device_put(
            model.init(jax.random.PRNGKey(0), x, jnp.zeros((BATCH,))), device
        )

        def denoise_chain(x0, n_steps):
            times = jnp.linspace(1.0, 0.0, n_steps + 1)
            pairs = jnp.stack([times[:-1], times[1:]], -1)

            def body(audio, pair):
                t, t_next = pair[0], pair[1]
                gamma, gamma_next = sigmoid_schedule(t), sigmoid_schedule(t_next)
                alpha, sigma = gamma_to_alpha_sigma(gamma)
                alpha_next, sigma_next = gamma_to_alpha_sigma(gamma_next)
                out = model.apply(params, audio, jnp.broadcast_to(t, (BATCH,)))
                x_start = alpha * audio - sigma * out  # v-objective
                pred_noise = safe_div(audio - alpha * x_start, sigma)
                return x_start * alpha_next + pred_noise * sigma_next, ()

            audio, _ = jax.lax.scan(body, x0, pairs)
            return audio.sum()

        return device, denoise_chain


def measure(platform, n_steps, repeats):
    device, chain = build(platform)
    with jax.default_device(device):
        fn = jax.jit(chain, static_argnums=1, device=device)
        x0 = jax.device_put(
            jax.random.normal(jax.random.PRNGKey(1), (BATCH, LENGTH, DIM)), device
        )
        float(fn(x0, n_steps))  # compile + warm
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(fn(x0, n_steps))
            best = min(best, (time.perf_counter() - t0) / n_steps)
    return 1.0 / best  # steps/sec


# CPU baseline measured on this image (1-core host, same model/config):
# ~0.37 denoise steps/sec. Used as fallback if the live CPU run fails.
CPU_BASELINE_FALLBACK = 0.37


def _retry(fn, attempts=2):
    last = None
    for _ in range(attempts):
        try:
            return fn()
        except Exception as e:  # compile service through the tunnel is flaky
            last = e
    raise last


def main():
    tpu_steps_per_sec = _retry(lambda: measure("tpu", n_steps=50, repeats=3))
    try:
        cpu_steps_per_sec = measure("cpu", n_steps=2, repeats=2)
    except Exception:
        cpu_steps_per_sec = CPU_BASELINE_FALLBACK

    vs_baseline = tpu_steps_per_sec / cpu_steps_per_sec

    print(
        json.dumps(
            {
                "metric": "ddim denoise steps/sec/chip (dim128/depth6, b4xn1024)",
                "value": round(tpu_steps_per_sec, 2),
                "unit": "steps/sec",
                "vs_baseline": round(vs_baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
