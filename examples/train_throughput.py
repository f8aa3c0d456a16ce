"""Training throughput at the reference Trainer defaults: batch 16,
2-second 24 kHz crops (32000→ hop-multiple samples), dim128/depth6 model,
grad-accum 1, full train step (codec encode → diffusion loss → grads →
clip → Adam → EMA) as one jitted program."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np

from naturalspeech2_tpu import Model, NaturalSpeech2, SoundStream, Trainer


def main():
    codec = SoundStream()
    # scan_layers: one transformer layer traced once (same math, tested
    # identical) — with the flash-composed fused-block backward the 6-layer
    # unrolled train step overruns the remote compile service's budget,
    # while the scanned form compiles in ~17 s and runs faster too
    model = Model(dim=128, depth=6, scan_layers=True)
    ns2 = NaturalSpeech2(model=model, codec=codec, timesteps=1000)

    rng = np.random.RandomState(0)
    batch = 16
    samples = 48000 // 320 * 320  # 2 s at 24 kHz, hop-aligned

    def batches():
        while True:
            yield rng.uniform(-1, 1, (batch, samples)).astype(np.float32)

    trainer = Trainer(
        ns2, batches=batches(), train_batch_size=batch, grad_accum_every=1,
        train_num_steps=10, results_folder="/tmp/ns2_train_smoke",
        save_and_sample_every=10**9,
    )
    b0 = next(trainer.batches)
    state = trainer.init_state(b0)
    step_fn = trainer.build_train_step()

    from jax.sharding import NamedSharding, PartitionSpec as P

    bsh = NamedSharding(trainer.mesh, P(None, "data"))
    b = jax.device_put(np.reshape(b0, (1, batch, -1)), bsh)
    t0 = time.perf_counter()
    state, metrics = step_fn(state, b, jax.random.PRNGKey(0))
    print(f"compile+first step: {time.perf_counter()-t0:.1f}s "
          f"loss={float(metrics['loss']):.4f}", flush=True)

    n = 20
    t0 = time.perf_counter()
    for i in range(n):
        b = jax.device_put(
            np.reshape(next(trainer.batches), (1, batch, -1)), bsh
        )
        state, metrics = step_fn(state, b, jax.random.PRNGKey(i))
    _ = float(metrics["loss"])  # sync
    wall = time.perf_counter() - t0
    audio_sec = n * batch * samples / 24000
    print(
        f"train: {wall/n*1e3:.1f} ms/step, {n/wall:.2f} steps/s, "
        f"{audio_sec/wall:.0f} audio-sec/s throughput", flush=True,
    )


if __name__ == "__main__":
    main()
