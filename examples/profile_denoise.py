"""Component-level timing of the flagship denoise step on the live device.

Times each building block of the denoiser (Model dim=128, depth=6 — the
bench.py flagship) as its own jitted `lax.scan` chain so per-dispatch tunnel
latency amortizes away, and prints a per-component share table. This is the
measurement tool behind the perf notes in DESIGN.md ("attention is the
wall").

Usage: python examples/profile_denoise.py [n_steps]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

BATCH = 4
LENGTH = 1024
DIM = 128
DEPTH = 6
HEADS = 8
DIM_HEAD = 64


def timed_chain(fn, params, x, n_steps, repeats=3):
    """Best per-step seconds for a scanned chain of `fn`."""

    def chain(params, x0):
        def body(h, _):
            return fn(params, h), ()

        out, _ = jax.lax.scan(body, x0, None, length=n_steps)
        return out.sum()

    jfn = jax.jit(chain)
    float(jfn(params, x))  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(jfn(params, x))
        best = min(best, (time.perf_counter() - t0) / n_steps)
    return best


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    on_tpu = jax.default_backend() == "tpu"
    print(f"backend={jax.default_backend()} steps={n_steps}")

    from naturalspeech2_tpu.models.denoiser import Model
    from naturalspeech2_tpu.models.transformer import (
        Attention,
        ConditionableTransformer,
    )
    from naturalspeech2_tpu.models.blocks import FeedForward, RMSNorm
    from naturalspeech2_tpu.models.wavenet import FusedWavenet, Wavenet
    from naturalspeech2_tpu.ops.flash_attention import flash_attention
    from naturalspeech2_tpu.ops.attention import attend_xla

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (BATCH, LENGTH, DIM))
    times = jnp.full((BATCH,), 0.5)
    rows = []

    # --- full denoiser step -------------------------------------------- #
    model = Model(
        dim=DIM, depth=DEPTH, heads=HEADS, dim_head=DIM_HEAD,
        use_flash_attn=on_tpu, use_fused_wavenet=on_tpu,
    )
    params = model.init(key, x, times)
    full = timed_chain(lambda p, h: model.apply(p, h, times), params, x, n_steps)
    rows.append(("full denoiser step", full))

    # --- wavenet body --------------------------------------------------- #
    t_cond = jax.random.normal(key, (BATCH, DIM * 4))
    for name, cls in (("FusedWavenet", FusedWavenet), ("Wavenet(XLA)", Wavenet)):
        if not on_tpu and cls is FusedWavenet:
            continue
        wn = cls(dim=DIM, stacks=4, layers=8, dim_cond_mult=4)
        wp = wn.init(key, x, t_cond)
        rows.append((name, timed_chain(
            lambda p, h, wn=wn: wn.apply(p, h, t_cond), wp, x, n_steps)))

    # --- transformer stack ---------------------------------------------- #
    ct = ConditionableTransformer(
        dim=DIM, depth=DEPTH, dim_head=DIM_HEAD, heads=HEADS,
        ff_causal_conv=True, dim_cond_mult=4, use_flash=on_tpu,
    )
    tc = jax.random.normal(key, (BATCH, DIM * 4))
    cp = ct.init(key, x, tc)
    rows.append(("transformer (6 layers)", timed_chain(
        lambda p, h: ct.apply(p, h, tc), cp, x, n_steps)))

    # --- one attention module (proj + kernel + out proj) ---------------- #
    at = Attention(dim=DIM, dim_head=DIM_HEAD, heads=HEADS, use_flash=on_tpu)
    ap = at.init(key, x)
    rows.append(("attention module ×1", timed_chain(
        lambda p, h: at.apply(p, h), ap, x, n_steps)))

    # --- fused pre-norm attention block (norm+qkv+attn+out+res, 1 launch) #
    gb = (jnp.ones((BATCH, DIM)), jnp.zeros((BATCH, DIM)))
    rows.append(("fused attn block ×1 (norm+proj+attn)", timed_chain(
        lambda p, h: at.apply(p, h, pre_norm=gb, residual=True),
        ap, x, n_steps)))

    # --- bare attention kernels ------------------------------------------ #
    qkv = jax.random.normal(key, (3, BATCH, HEADS, LENGTH, DIM_HEAD))

    def bare(kernel):
        def chain(_, q):
            def body(h, _x):
                return kernel(h, qkv[1], qkv[2]), ()

            out, _ = jax.lax.scan(body, q, None, length=n_steps)
            return out.sum()

        jfn = jax.jit(chain)
        float(jfn(None, qkv[0]))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(jfn(None, qkv[0]))
            best = min(best, (time.perf_counter() - t0) / n_steps)
        return best

    if on_tpu:
        rows.append(("flash kernel ×1 (b4 h8 n1024 d64)", bare(
            lambda q, k, v: flash_attention(q, k, v))))
    rows.append(("xla attention ×1", bare(
        lambda q, k, v: attend_xla(q, k, v))))

    # --- one feedforward (causal-conv GEGLU) ----------------------------- #
    ff = FeedForward(DIM, mult=4, causal_conv=True)
    fp = ff.init(key, x)
    rows.append(("feedforward ×1", timed_chain(
        lambda p, h: ff.apply(p, h), fp, x, n_steps)))

    rn = RMSNorm(DIM)
    rp = rn.init(key, x)
    rows.append(("rmsnorm ×1", timed_chain(
        lambda p, h: rn.apply(p, h), rp, x, n_steps)))

    print(f"{'component':40s} {'us/step':>10s} {'share of full':>14s}")
    for name, sec in rows:
        share = sec / full * 100
        print(f"{name:40s} {sec * 1e6:10.1f} {share:13.1f}%")


if __name__ == "__main__":
    main()
