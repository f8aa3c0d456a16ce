"""Few-step sampling accuracy/speed: DDIM vs DPM-Solver++(2M) on the
flagship denoiser (dim128/depth6, b4×n1024).

Solver accuracy is measured on the real model: the 1000-step DDIM
trajectory is ground truth (both solvers integrate the same
probability-flow ODE), and each solver's K-step result is scored by
latent MSE against it — exactly the metric by which fewer steps trade
off against fidelity. Speed is the jitted full-scan wall time.

Usage: python examples/fast_sampling_solvers.py [K ...]   (default 8 16 25 50)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from naturalspeech2_tpu.models.denoiser import Model
from naturalspeech2_tpu.models.naturalspeech2 import ddim_sample, dpmpp_sample
from naturalspeech2_tpu.ops.schedules import sigmoid_schedule

BATCH, LENGTH, DIM = 4, 1024, 128


def main():
    ks = [int(a) for a in sys.argv[1:]] or [8, 16, 25, 50]
    model = Model(dim=DIM, depth=6, heads=8, dim_head=64, scan_layers=True,
                  use_flash_attn=True)
    x = jnp.zeros((BATCH, LENGTH, DIM), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((BATCH,)))

    def run(sampler, steps):
        @jax.jit
        def f(params, key):
            def denoise_fn(audio, times):
                return model.apply(params, audio, times)

            return sampler(
                denoise_fn, key, (BATCH, LENGTH, DIM), timesteps=steps,
                gamma_schedule=sigmoid_schedule, objective="v",
            )

        key = jax.random.PRNGKey(1)
        out = f(params, key)
        float(out.sum())  # compile + sync
        t0 = time.perf_counter()
        out = f(params, key)
        s = float(out.sum())
        wall = time.perf_counter() - t0
        assert np.isfinite(s)
        return np.asarray(out), wall

    print("reference: 1000-step DDIM...", flush=True)
    ref, ref_wall = run(ddim_sample, 1000)
    print(f"  {ref_wall:.2f}s", flush=True)

    print(f"{'K':>5} {'ddim MSE':>12} {'dpm++ MSE':>12} "
          f"{'ddim s':>8} {'dpm++ s':>8}")
    for k in ks:
        a, wa = run(ddim_sample, k)
        b, wb = run(dpmpp_sample, k)
        mse = lambda y: float(((y - ref) ** 2).mean())
        print(f"{k:>5} {mse(a):>12.6f} {mse(b):>12.6f} "
              f"{wa:>8.3f} {wb:>8.3f}", flush=True)


if __name__ == "__main__":
    main()
