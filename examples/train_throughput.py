"""Training throughput at the reference Trainer defaults: batch 16,
2-second 24 kHz crops (32000→ hop-multiple samples), dim128/depth6 model,
grad-accum 1, full train step (codec encode → diffusion loss → grads →
clip → Adam → EMA) as one jitted program.

Usage: python examples/train_throughput.py [steps_per_dispatch ...]
Measures each requested dispatch chunking (default: 1 and 8) — through a
device tunnel the per-step host→device upload+sync, not FLOPs, bounds
small-model training, so K steps per dispatch amortizes it K×."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np

from naturalspeech2_tpu import Model, NaturalSpeech2, SoundStream, Trainer


def measure(k: int):
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
        train_num_steps=1000 * k, results_folder="/tmp/ns2_train_smoke",
        save_and_sample_every=10**9, steps_per_dispatch=k,
    )
    b0 = next(trainer.batches)
    state = trainer.init_state(b0)
    step_fn = trainer.build_train_step()

    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = P(None, None, "data") if k > 1 else P(None, "data")
    bsh = NamedSharding(trainer.mesh, spec)

    def chunk():
        bs = [
            np.reshape(next(trainer.batches), (1, batch, -1))
            for _ in range(k)
        ]
        arr = bs[0] if k == 1 else np.stack(bs)
        return jax.device_put(arr, bsh)

    t0 = time.perf_counter()
    state, metrics = step_fn(state, chunk(), jax.random.PRNGKey(0))
    print(f"K={k}: compile+first dispatch: {time.perf_counter()-t0:.1f}s "
          f"loss={float(np.asarray(metrics['loss']).mean()):.4f}", flush=True)

    n_dispatch = max(1, 24 // k)
    t0 = time.perf_counter()
    for i in range(n_dispatch):
        state, metrics = step_fn(state, chunk(), jax.random.PRNGKey(i + 1))
    _ = float(np.asarray(metrics["loss"]).mean())  # sync
    wall = time.perf_counter() - t0
    n_steps = n_dispatch * k
    audio_sec = n_steps * batch * samples / 24000
    print(
        f"K={k}: {wall/n_steps*1e3:.1f} ms/step, {n_steps/wall:.2f} steps/s, "
        f"{audio_sec/wall:.0f} audio-sec/s throughput", flush=True,
    )


def main():
    ks = [int(a) for a in sys.argv[1:]] or [1, 8]
    for k in ks:
        measure(k)


if __name__ == "__main__":
    main()
