"""BASELINE configs 4-5 on TPU — full sampling scans, no workarounds:

- config 4: scaled denoiser dim=512/depth=12, batch 16, n=1024, the FULL
  100-step DDIM `lax.scan` compiled as one program. Layers run under
  `nn.scan` (Model(scan_layers=True)) so the traced program stays small
  enough for the compile service; the fused-WaveNet VMEM guard auto-routes
  this shape to the scanned XLA twin.
- config 5: long-form 60-second generation, 4500 latent frames (flash
  attention's O(n) memory path), full 50-step scan.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from naturalspeech2_tpu.models.denoiser import Model
from naturalspeech2_tpu.models.naturalspeech2 import ddim_sample
from naturalspeech2_tpu.ops.schedules import sigmoid_schedule


def bench_config(name, dim, depth, batch, length, n_steps, scan_layers=True,
                 bf16=False):
    model = Model(
        dim=dim, depth=depth, heads=8, dim_head=64, use_flash_attn=True,
        scan_layers=scan_layers,
    )
    x = jnp.zeros((batch, length, dim), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((batch,)))
    if bf16:
        # bf16 params + latents: the fused block kernels keep bf16 MXU
        # operands with f32 accumulation/statistics (2× v5e matmul rate)
        params = jax.tree_util.tree_map(
            lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
            params,
        )
        name += " [bf16]"

    # params MUST be a jit argument, not a closure constant: closed-over
    # arrays are embedded as HLO literals, and a dim512 model's ~200 MB of
    # constants sends the remote compile service into a death spiral
    @jax.jit
    def run(params, key):
        def denoise_fn(audio, times):
            out = model.apply(params, audio.astype(
                jnp.bfloat16 if bf16 else jnp.float32), times)
            return out.astype(jnp.float32)

        return ddim_sample(
            denoise_fn, key, (batch, length, dim), timesteps=n_steps,
            gamma_schedule=sigmoid_schedule, objective="v",
        )

    t0 = time.perf_counter()
    out = run(params, jax.random.PRNGKey(1))
    s = float(out.sum())  # pull a scalar: true sync through the axon tunnel
    compile_s = time.perf_counter() - t0
    assert jnp.isfinite(s), s

    reps = 3
    t1 = time.perf_counter()
    best = float("inf")
    for r in range(reps):
        ts = time.perf_counter()
        float(run(params, jax.random.PRNGKey(2 + r)).sum())
        best = min(best, time.perf_counter() - ts)
    wall = best
    step_ms = wall / n_steps * 1e3
    audio_sec = batch * length * 320 / 24000
    rtf = audio_sec / wall
    print(
        f"{name}: {step_ms:.2f} ms/step, {n_steps/wall:.1f} steps/s, "
        f"RTF {rtf:.1f}x ({n_steps}-step FULL-SCAN sampling, "
        f"compile {compile_s:.0f}s, best of {reps})",
        flush=True,
    )


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "longform"):
        # config 5: long-form 60 s (4500 latent frames)
        bench_config("long-form 60s b1 n4500", 128, 6, 1, 4500, 50)
    if which in ("all", "scaled"):
        # config 4: scaled denoiser dim512/depth12 b16, full 100-step scan
        bench_config("scaled dim512/depth12 b16 n1024", 512, 12, 16, 1024, 100)
    if which in ("all", "scaled-bf16"):
        bench_config("scaled dim512/depth12 b16 n1024", 512, 12, 16, 1024, 100,
                     bf16=True)
    if which in ("all", "longform-bf16"):
        bench_config("long-form 60s b1 n4500", 128, 6, 1, 4500, 50, bf16=True)
