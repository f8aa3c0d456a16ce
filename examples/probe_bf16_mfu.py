"""Round-4 probe: does bf16 actually engage, and what MFU does a denoise
step achieve?  (VERDICT r3 #2: BENCH_r03 showed bf16 ~= f32 on every leg
while DESIGN.md claimed it matters at dim512.)

Measures the flagship (dim128/depth6 b4xn1024) and scaled (dim512/depth12
b16xn1024) denoise steps in f32 and bf16, prints XLA's own FLOP estimate
(`compiled.cost_analysis()`), achieved FLOP/s and MFU vs v5e peak
(197 TFLOP/s bf16, 98.5 f32 — the MXU runs f32 via 3-pass bf16 passes).

Run on the real chip:  python examples/probe_bf16_mfu.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

V5E_PEAK_BF16 = 197e12
V5E_PEAK_F32 = 98.5e12  # considered f32-class ceiling for mixed chains


def build_step(dim, depth, batch, length, bf16, scan_layers=False):
    from naturalspeech2_tpu.models.denoiser import Model
    from naturalspeech2_tpu.ops.schedules import gamma_to_alpha_sigma, sigmoid_schedule
    from naturalspeech2_tpu.utils.helpers import safe_div

    model = Model(dim=dim, depth=depth, heads=8, dim_head=64,
                  use_flash_attn=True, scan_layers=scan_layers)
    x = jnp.zeros((batch, length, dim), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((batch,)))
    if bf16:
        params = jax.tree_util.tree_map(
            lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
            params)
    dtype = jnp.bfloat16 if bf16 else jnp.float32

    def chain(params, x0, n_steps):
        times = jnp.linspace(1.0, 0.0, n_steps + 1)
        pairs = jnp.stack([times[:-1], times[1:]], -1)

        def body(audio, pair):
            t, t_next = pair[0], pair[1]
            gamma, gamma_next = sigmoid_schedule(t), sigmoid_schedule(t_next)
            alpha, sigma = gamma_to_alpha_sigma(gamma)
            alpha_next, sigma_next = gamma_to_alpha_sigma(gamma_next)
            out = model.apply(
                params, audio, jnp.broadcast_to(t, (batch,))
            ).astype(jnp.float32)
            audio32 = audio.astype(jnp.float32)
            x_start = alpha * audio32 - sigma * out
            pred_noise = safe_div(audio32 - alpha * x_start, sigma)
            nxt = x_start * alpha_next + pred_noise * sigma_next
            return nxt.astype(dtype), ()

        audio, _ = jax.lax.scan(body, x0.astype(dtype), pairs)
        return audio.astype(jnp.float32).sum()

    return params, chain


def measure(dim, depth, batch, length, bf16, n_steps=100, repeats=3,
            scan_layers=False):
    params, chain = build_step(dim, depth, batch, length, bf16, scan_layers)
    fn = jax.jit(chain, static_argnums=2)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (batch, length, dim))
    lowered = fn.lower(params, x0, n_steps)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    flops_total = (ca or {}).get("flops", float("nan"))
    float(fn(params, x0, n_steps))  # warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(fn(params, x0, n_steps))
        best = min(best, time.perf_counter() - t0)
    step_s = best / n_steps
    flops_per_step = flops_total / n_steps
    achieved = flops_per_step / step_s
    peak = V5E_PEAK_BF16 if bf16 else V5E_PEAK_F32
    return {
        "step_ms": step_s * 1e3,
        "steps_per_sec": 1.0 / step_s,
        "gflop_per_step": flops_per_step / 1e9,
        "achieved_tflops": achieved / 1e12,
        "mfu_vs_bf16_peak": achieved / V5E_PEAK_BF16,
        "mfu_vs_dtype_peak": achieved / peak,
    }


def main():
    for label, cfg in [
        ("flagship dim128/d6 b4n1024", dict(dim=128, depth=6, batch=4, length=1024)),
        ("cfg-doubled dim128/d6 b8n1024", dict(dim=128, depth=6, batch=8, length=1024)),
        ("scaled dim512/d12 b16n1024", dict(dim=512, depth=12, batch=16,
                                            length=1024, scan_layers=True)),
    ]:
        for bf16 in (False, True):
            r = measure(bf16=bf16, **cfg)
            print(f"{label:34s} {'bf16' if bf16 else 'f32 '} "
                  f"step {r['step_ms']:8.3f} ms  {r['steps_per_sec']:7.1f} steps/s  "
                  f"{r['gflop_per_step']:7.1f} GF/step  "
                  f"{r['achieved_tflops']:6.1f} TF/s  "
                  f"MFU(bf16 peak) {100*r['mfu_vs_bf16_peak']:5.1f}%")


if __name__ == "__main__":
    main()
