"""Round-4 probe: conditional TRAINING step on TPU — the last unmeasured
hot path (VERDICT r3 #1; reference forward
naturalspeech2_pytorch.py:1503-1684, MAS loop aligner.py:88-122).

README config 2 at reference scale: full conditioning stack (prompt
encoder, phoneme encoder 512, duration/pitch predictor, aligner soft
attention + MAS + CTC forward-sum, on-device pitch + mel) + diffusion
grads, batch 16, 2-s crops, text 100 tokens, 1.4-s prompt.

Prints the full-step time plus a component breakdown (forward-only loss,
conditioning-only, MAS alone, CTC alone, pitch alone, mel alone) so the
optimization target is measured, not guessed.

Run on the real chip:  python examples/probe_cond_train.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 16
SECONDS = 2.0
SR = 24000
TEXT_LEN = 100
PROMPT_SAMPLES = 32768


def build():
    from naturalspeech2_tpu import Model, NaturalSpeech2, SoundStream

    codec = SoundStream()
    model = Model(
        dim=128, depth=6, heads=8, dim_head=64,
        condition_on_prompt=True, dim_prompt=512, cond_drop_prob=0.25,
        scan_layers=True,
    )
    ns2 = NaturalSpeech2(model=model, codec=codec, timesteps=1000)
    return ns2


def timeit(fn, *args, repeats=3, warm=1):
    for _ in range(warm):
        out = fn(*args)
        jax.tree_util.tree_map(
            lambda x: float(np.asarray(x).sum()), out
        )
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree_util.tree_map(lambda x: float(np.asarray(x).sum()), out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from naturalspeech2_tpu.trainer import Trainer
    from naturalspeech2_tpu.parallel.mesh import DATA_AXIS
    from jax.sharding import NamedSharding, PartitionSpec as P

    ns2 = build()
    samples = int(SR * SECONDS) // 320 * 320
    rng = np.random.RandomState(0)

    def batches():
        while True:
            yield {
                "audio": rng.uniform(-1, 1, (BATCH, samples)).astype(np.float32),
                "text": rng.randint(0, 150, (BATCH, TEXT_LEN)).astype(np.int32),
                "text_lens": np.full((BATCH,), TEXT_LEN, np.int32),
                "prompt": rng.uniform(-1, 1, (BATCH, PROMPT_SAMPLES)).astype(np.float32),
            }

    trainer = Trainer(
        ns2, batches=batches(), train_batch_size=BATCH, grad_accum_every=1,
        train_num_steps=10_000, results_folder="/tmp/ns2_probe_cond_train",
        save_and_sample_every=10**9,
    )
    t0 = time.perf_counter()
    state = trainer.init_state(next(trainer.batches))
    print(f"init {time.perf_counter()-t0:.1f} s")
    step_fn = trainer.build_train_step()
    bsh = NamedSharding(trainer.mesh, P(None, DATA_AXIS))

    def chunk():
        b = next(trainer.batches)
        b = jax.tree_util.tree_map(
            lambda x: np.reshape(x, (1, BATCH) + x.shape[1:]), b
        )
        return jax.device_put(b, bsh)

    t0 = time.perf_counter()
    state, metrics = step_fn(state, chunk(), jax.random.PRNGKey(0))
    print(f"train-step compile+run {time.perf_counter()-t0:.1f} s, "
          f"loss {float(metrics['loss']):.4f}")
    best = float("inf")
    for r in range(3):
        c = chunk()
        t0 = time.perf_counter()
        state, metrics = step_fn(state, c, jax.random.PRNGKey(1 + r))
        float(metrics["loss"])
        best = min(best, time.perf_counter() - t0)
    print(f"conditional train step: {best*1e3:.1f} ms  "
          f"({1.0/best:.2f} steps/s, {BATCH*SECONDS/best:.0f} audio-sec/s)")

    # ---------------- component breakdown ---------------- #
    params = state.params
    raw = next(trainer.batches)
    audio = jnp.asarray(raw["audio"])
    text = jnp.asarray(raw["text"])
    text_lens = jnp.asarray(raw["text_lens"])
    prompt = jnp.asarray(raw["prompt"])
    key = jax.random.PRNGKey(9)
    rngs = {n: jax.random.fold_in(key, i) for i, n in enumerate(
        ("times", "noise", "cfg", "dropout"))}

    fwd = jax.jit(lambda p, a, t, tl, pr: ns2.apply(
        {"params": p}, a, text=t, text_lens=tl, prompt=pr, rngs=rngs
    )["loss"])
    t_fwd = timeit(fwd, params, audio, text, text_lens, prompt)
    print(f"forward loss only:      {t_fwd*1e3:.1f} ms")

    cond_only = jax.jit(lambda p, a, t, tl, pr: ns2.apply(
        {"params": p}, a, t, tl, None, None, pr, None, False,
        rngs=rngs, method=ns2._conditional_inputs_and_losses,
    )[2])
    t_cond = timeit(cond_only, params, audio, text, text_lens, prompt)
    print(f"conditioning+aux only:  {t_cond*1e3:.1f} ms")

    # isolated hot ops at the in-step shapes. Per DESIGN.md's methodology,
    # one dispatch through the axon tunnel costs 30-100 ms — far more than
    # any of these ops — so each op is chained N times ON-DEVICE inside one
    # jit (fori_loop whose input depends on the iteration index, defeating
    # CSE/LICM) and we report wall/N.
    from naturalspeech2_tpu.ops.mas import maximum_path
    from naturalspeech2_tpu.ops.mel import audio_to_mel
    from naturalspeech2_tpu.ops.pitch import compute_pitch
    from naturalspeech2_tpu.models.aligner import ForwardSumLoss

    def timeit_op(op, x, n=50, repeats=3):
        @jax.jit
        def run(x):
            def body(i, acc):
                return acc + op(x * (1.0 + i.astype(x.dtype) * 1e-9)).sum()

            return jax.lax.fori_loop(0, n, body, jnp.zeros((), x.dtype))

        float(np.asarray(run(x)))  # compile + first run
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(np.asarray(run(x)))
            best = min(best, time.perf_counter() - t0)
        return best / n

    frames = samples // 160
    value = jax.random.normal(jax.random.PRNGKey(3), (BATCH, TEXT_LEN, frames))
    mask = jnp.ones((BATCH, TEXT_LEN, frames))
    for unroll in (1, 2, 4, 8):
        t_mas = timeit_op(
            lambda v, u=unroll: maximum_path(v, mask, unroll=u), value
        )
        print(f"MAS alone [b16,{TEXT_LEN}x{frames}] unroll={unroll}: "
              f"{t_mas*1e3:.2f} ms", flush=True)

    logp = jax.nn.log_softmax(
        jax.random.normal(
            jax.random.PRNGKey(4), (BATCH, 1, frames, TEXT_LEN)
        ), -1
    )
    fsl = ForwardSumLoss()
    q_lens = jnp.full((BATCH,), frames)
    t_ctc = timeit_op(lambda lp: fsl.apply({}, lp, text_lens, q_lens), logp)
    print(f"CTC fwd-sum alone:      {t_ctc*1e3:.2f} ms", flush=True)

    t_pitch = timeit_op(
        lambda a: compute_pitch(a, sample_rate=SR, hop_length=160), audio
    )
    print(f"pitch (ACF) alone:      {t_pitch*1e3:.2f} ms", flush=True)

    t_mel = timeit_op(
        lambda a: audio_to_mel(a, sample_rate=SR, n_mels=80, hop_length=160),
        audio,
    )
    print(f"mel alone:              {t_mel*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
