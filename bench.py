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


def build(platform, *, cfg=False, bf16=False):
    """Build the denoise chain. ``cfg=True`` runs each step as the
    batch-doubled classifier-free-guided forward (cond ‖ null in ONE call —
    the headline sampling mode); ``bf16=True`` casts params and latents to
    bfloat16 (the memory-bound sampling fast path)."""
    from naturalspeech2_tpu.models.denoiser import Model
    from naturalspeech2_tpu.ops.schedules import gamma_to_alpha_sigma, sigmoid_schedule
    from naturalspeech2_tpu.utils.helpers import safe_div

    device = jax.devices(platform)[0]
    # Pallas paths only lower for the TPU backend; the CPU-baseline leg
    # runs the structurally-identical XLA twins (same math, same tests).
    # This is also why the old 0.37 fallback was a trap: the live CPU run
    # silently crashed here and the fallback hid it.
    model = Model(
        dim=DIM, depth=DEPTH, heads=8, dim_head=64,
        use_flash_attn=(platform == "tpu"),
        use_fused_wavenet=(platform == "tpu"),
    )
    with jax.default_device(device):
        x = jnp.zeros((BATCH, LENGTH, DIM), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((BATCH,)))
        if bf16:
            params = jax.tree_util.tree_map(
                lambda p: p.astype(jnp.bfloat16)
                if p.dtype == jnp.float32 else p,
                params,
            )
        params = jax.device_put(params, device)
        eval_batch = 2 * BATCH if cfg else BATCH
        dtype = jnp.bfloat16 if bf16 else jnp.float32

        def denoise_chain(params, x0, n_steps):
            times = jnp.linspace(1.0, 0.0, n_steps + 1)
            pairs = jnp.stack([times[:-1], times[1:]], -1)

            def body(audio, pair):
                t, t_next = pair[0], pair[1]
                gamma, gamma_next = sigmoid_schedule(t), sigmoid_schedule(t_next)
                alpha, sigma = gamma_to_alpha_sigma(gamma)
                alpha_next, sigma_next = gamma_to_alpha_sigma(gamma_next)
                net_in = (
                    jnp.concatenate([audio, audio], axis=0) if cfg else audio
                )
                out = model.apply(
                    params, net_in, jnp.broadcast_to(t, (eval_batch,))
                ).astype(jnp.float32)
                if cfg:
                    cond_out, null_out = out[:BATCH], out[BATCH:]
                    out = null_out + (cond_out - null_out) * 2.0
                audio32 = audio.astype(jnp.float32)
                x_start = alpha * audio32 - sigma * out  # v-objective
                pred_noise = safe_div(audio32 - alpha * x_start, sigma)
                nxt = x_start * alpha_next + pred_noise * sigma_next
                return nxt.astype(dtype), ()

            audio, _ = jax.lax.scan(body, x0.astype(dtype), pairs)
            return audio.astype(jnp.float32).sum()

        return device, params, denoise_chain


def measure(platform, n_steps, repeats, *, cfg=False, bf16=False):
    device, params, chain = build(platform, cfg=cfg, bf16=bf16)
    with jax.default_device(device):
        # params as jit ARGUMENTS (closure constants get embedded as HLO
        # literals, which melts the remote compile service at scale)
        fn = jax.jit(chain, static_argnums=2, device=device)
        x0 = jax.device_put(
            jax.random.normal(jax.random.PRNGKey(1), (BATCH, LENGTH, DIM)), device
        )
        float(fn(params, x0, n_steps))  # compile + warm
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(fn(params, x0, n_steps))
            best = min(best, (time.perf_counter() - t0) / n_steps)
    return 1.0 / best  # steps/sec


def _retry(fn, attempts=2):
    last = None
    for _ in range(attempts):
        try:
            return fn()
        except Exception as e:  # compile service through the tunnel is flaky
            last = e
    raise last


def main():
    # 200-step chains: real sampling runs 100-1000 steps in ONE scan, so
    # the per-dispatch tunnel latency (~25 ms) must be amortized to noise
    # (at 50 steps it inflated the per-step cost by ~0.5 ms)
    tpu_steps_per_sec = _retry(lambda: measure("tpu", n_steps=200, repeats=3))
    cfg_steps_per_sec = _retry(
        lambda: measure("tpu", n_steps=200, repeats=3, cfg=True)
    )
    bf16_steps_per_sec = _retry(
        lambda: measure("tpu", n_steps=200, repeats=3, bf16=True)
    )
    # live CPU baseline of the identical architecture — the north-star's
    # "CPU-reference sampling throughput". No silent fallback: if this
    # cannot run, the benchmark result would be meaningless, so fail loudly.
    cpu_steps_per_sec = measure("cpu", n_steps=2, repeats=2)

    vs_baseline = tpu_steps_per_sec / cpu_steps_per_sec

    print(
        json.dumps(
            {
                # per-step denoiser cost is identical for DDPM and DDIM
                # (one forward + elementwise update); labelled per
                # BASELINE.json's "DDPM denoise steps/sec" metric
                "metric": "DDPM denoise steps/sec/chip (dim128/depth6, b4xn1024)",
                "value": round(tpu_steps_per_sec, 2),
                "unit": "steps/sec",
                "vs_baseline": round(vs_baseline, 2),
                "cfg_batch_doubled_steps_per_sec": round(cfg_steps_per_sec, 2),
                "bf16_steps_per_sec": round(bf16_steps_per_sec, 2),
                "cpu_baseline_steps_per_sec": round(cpu_steps_per_sec, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
