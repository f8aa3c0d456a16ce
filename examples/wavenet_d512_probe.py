"""Decide the d=512 WaveNet kernel question with data (VERDICT r2 item 9).

Round 2 measured a TRUE-f32 per-lane kernel losing ~3× to the XLA twin at
d=512 — because XLA's DEFAULT f32 matmul precision on TPU runs bf16
passes. This probe measures the missing variant: the per-lane kernel with
bf16 MXU operands + f32 accumulation (precision-equivalent to the XLA
default), at the config-4 WaveNet body shape (b16 × n1024 × d512,
stacks=4 × layers=8).

Methodology (docs/tpu memory): in-jit `lax.scan` chains with a data
dependency, synced by pulling a scalar, best of 3 — standalone kernel
timings through the axon tunnel are garbage.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from naturalspeech2_tpu.ops.wavenet_kernel import (
    _fused_forward_per_lane,
    wavenet_body_xla,
)

B, N, D, S, L = 16, 1024, 512, 4, 8
ITERS = 20


def make_args(key):
    ks = jax.random.split(key, 8)
    shapes = [
        (B, N, D), (S, L, 3 * D, D), (S, L, D), (S, L, D, D), (S, L, D),
        (L, D, D), (L, D), (B, S, L, 2 * D),
    ]
    return tuple(
        jax.random.normal(k, s, jnp.float32) * 0.05 for k, s in zip(ks, shapes)
    )


def bench(name, fn, args):
    @jax.jit
    def chain(args):
        x0, *rest = args

        def body(x, _):
            return fn(x, *rest) * 1e-2 + x, ()

        x, _ = jax.lax.scan(body, x0, None, length=ITERS)
        return x.sum()

    t0 = time.perf_counter()
    s = float(chain(args))
    print(f"{name}: compile+1st {time.perf_counter()-t0:.1f}s (sum {s:.3e})",
          flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(args))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    print(f"{name}: {best*1e3:.2f} ms/iter (best of 3, {ITERS}-iter scan)",
          flush=True)
    return best


def main():
    args = make_args(jax.random.PRNGKey(0))

    t_xla = bench("xla twin (default precision)", wavenet_body_xla, args)
    t_bf16 = bench(
        "per-lane kernel bf16-matmul",
        lambda *a: _fused_forward_per_lane(*a, bf16_matmul=True), args,
    )
    t_f32 = bench(
        "per-lane kernel true-f32",
        lambda *a: _fused_forward_per_lane(*a, bf16_matmul=False), args,
    )

    # numerical check: bf16-matmul kernel vs the XLA twin (same nominal
    # precision class) — relative error should be small
    ref = wavenet_body_xla(*args)
    k_bf16 = _fused_forward_per_lane(*args, bf16_matmul=True)
    import numpy as np

    rel = float(
        np.abs(np.asarray(k_bf16) - np.asarray(ref)).max()
        / np.abs(np.asarray(ref)).max()
    )
    print(f"bf16 kernel vs xla twin: max rel diff {rel:.2e}")
    print(
        f"summary ms/iter: xla {t_xla*1e3:.2f}, bf16-kernel {t_bf16*1e3:.2f},"
        f" f32-kernel {t_f32*1e3:.2f}"
    )


if __name__ == "__main__":
    main()
