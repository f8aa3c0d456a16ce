"""Conditional TTS training demonstration on the live chip: the FULL
conditioning stack (phoneme encoder, prompt encoder + perceiver resampler,
aligner + CTC/bin losses, duration/pitch predictors, CFG dropout) trains
end-to-end at real scale — loss dropping over a few hundred steps, one
jitted program. A capability the reference Trainer lacks entirely (its
conditional sampling path crashes, naturalspeech2_pytorch.py:1915-1918).

Usage: python examples/train_demo_conditional.py [n_steps]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np

from examples.train_demo import synthetic_speech  # shared harmonic generator
from naturalspeech2_tpu import Model, NaturalSpeech2, SoundStream, Trainer


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    codec = SoundStream()
    model = Model(
        dim=128, depth=6, dim_prompt=512, cond_drop_prob=0.25,
        condition_on_prompt=True, scan_layers=True,
    )
    ns2 = NaturalSpeech2(model=model, codec=codec, timesteps=1000)

    rng = np.random.RandomState(0)
    batch = 8
    audio_len = 2 * 24000 // 320 * 320   # 2 s
    prompt_len = 32000                   # ~1.3 s
    text_len = 40

    def batches():
        while True:
            yield {
                "audio": synthetic_speech(rng, batch, audio_len),
                "text": rng.randint(0, 100, (batch, text_len)).astype(np.int32),
                "text_lens": np.full((batch,), text_len, np.int32),
                "prompt": synthetic_speech(rng, batch, prompt_len),
            }

    trainer = Trainer(
        ns2, batches=batches(), train_batch_size=batch, grad_accum_every=1,
        train_num_steps=n_steps, results_folder="/tmp/ns2_train_demo_cond",
        save_and_sample_every=10**9,
    )
    b0 = next(trainer.batches)
    state = trainer.init_state(b0)
    step_fn = trainer.build_train_step()

    from jax.sharding import NamedSharding, PartitionSpec as P

    bsh = NamedSharding(trainer.mesh, P(None, "data"))

    def put(b):
        return {
            k: jax.device_put(np.reshape(v, (1,) + v.shape), bsh)
            for k, v in b.items()
        }

    losses = []
    t0 = time.perf_counter()
    for i in range(n_steps):
        state, metrics = step_fn(state, put(next(trainer.batches)),
                                 jax.random.PRNGKey(i))
        if i % 25 == 0 or i == n_steps - 1:
            loss = float(metrics["loss"])
            losses.append((i, loss))
            print(f"step {i:4d}: loss {loss:.4f}", flush=True)
    wall = time.perf_counter() - t0
    first, last = losses[0][1], losses[-1][1]
    print(
        f"\n{n_steps} conditional steps in {wall:.0f}s (incl. compile and "
        f"host-side synthetic data gen) — loss {first:.4f} → {last:.4f} "
        f"({'LEARNING' if last < first * 0.9 else 'check setup'})",
        flush=True,
    )


if __name__ == "__main__":
    main()
