"""End-to-end training demonstration on the live chip: train the flagship
unconditional model on synthetic harmonic "speech" for a few hundred steps
and show the diffusion loss dropping — evidence the full system (codec
encode → diffusion loss → grads → clip → Adam → EMA, all one jitted
program) trains at speed, not just that single steps run.

Usage: python examples/train_demo.py [n_steps]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np

from naturalspeech2_tpu import Model, NaturalSpeech2, SoundStream, Trainer


def synthetic_speech(rng, batch, samples, sr=24000):
    """Harmonic stacks with pitch drift + amplitude envelope — structured
    enough that the loss trajectory is meaningful, unlike white noise."""
    t = np.arange(samples) / sr
    out = np.zeros((batch, samples), np.float32)
    for b in range(batch):
        f0 = rng.uniform(90, 280)
        drift = np.cumsum(rng.normal(0, 0.3, samples)) / sr
        phase = 2 * np.pi * np.cumsum(f0 * (1 + drift)) / sr
        env = 0.4 * (0.6 + 0.4 * np.sin(2 * np.pi * rng.uniform(1, 4) * t))
        sig = np.zeros(samples)
        for h in range(1, 6):
            sig += np.sin(h * phase) / h
        out[b] = (env * sig / 2.5).astype(np.float32)
    return out


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    codec = SoundStream()
    model = Model(dim=128, depth=6, scan_layers=True)
    ns2 = NaturalSpeech2(model=model, codec=codec, timesteps=1000)

    rng = np.random.RandomState(0)
    batch = 16
    samples = 48000 // 320 * 320

    def batches():
        while True:
            yield synthetic_speech(rng, batch, samples)

    trainer = Trainer(
        ns2, batches=batches(), train_batch_size=batch, grad_accum_every=1,
        train_num_steps=n_steps, results_folder="/tmp/ns2_train_demo",
        save_and_sample_every=10**9,
    )
    b0 = next(trainer.batches)
    state = trainer.init_state(b0)
    step_fn = trainer.build_train_step()

    from jax.sharding import NamedSharding, PartitionSpec as P

    bsh = NamedSharding(trainer.mesh, P(None, "data"))
    losses = []
    t0 = time.perf_counter()
    for i in range(n_steps):
        b = jax.device_put(
            np.reshape(next(trainer.batches), (1, batch, -1)), bsh
        )
        state, metrics = step_fn(state, b, jax.random.PRNGKey(i))
        if i % 50 == 0 or i == n_steps - 1:
            loss = float(metrics["loss"])
            losses.append((i, loss))
            print(f"step {i:4d}: loss {loss:.4f}", flush=True)
    wall = time.perf_counter() - t0
    first, last = losses[0][1], losses[-1][1]
    print(
        f"\n{n_steps} steps in {wall:.0f}s ({n_steps/wall:.1f} steps/s incl. "
        f"compile) — loss {first:.4f} → {last:.4f} "
        f"({'LEARNING' if last < first * 0.8 else 'check setup'})",
        flush=True,
    )


if __name__ == "__main__":
    main()
