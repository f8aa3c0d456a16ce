"""README config 1 at real scale (reference README.md:33-70 semantics):

Model(dim=128, depth=6) + codec, mock (4, 327680) audio @ 24 kHz →
training loss + grads; then 1000-step DDIM sampling of 1024 latent frames →
(1, 327680) waveform. Run on the TPU chip:  python examples/readme_unconditional.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from naturalspeech2_tpu import Model, NaturalSpeech2, SoundStream, sample


def main():
    codec = SoundStream()  # codebook_dim 128, hop 320, 24 kHz
    model = Model(dim=128, depth=6)
    ns2 = NaturalSpeech2(model=model, codec=codec, timesteps=1000)

    key = jax.random.PRNGKey(0)
    audio = jax.random.uniform(key, (4, 327680), minval=-1, maxval=1)

    rngs = {n: key for n in ("params", "times", "noise")}
    t0 = time.perf_counter()
    variables = ns2.init(rngs, audio)
    codec_full = codec.init(key, audio[:1, :3200])
    params = dict(variables["params"])
    params["codec"] = codec_full["params"]
    variables = {"params": params}
    print(f"init: {time.perf_counter() - t0:.1f}s")

    # training loss + grads (README: loss.backward())
    def loss_fn(p):
        return ns2.apply(
            {"params": p}, audio,
            rngs={"times": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
        )["loss"]

    t0 = time.perf_counter()
    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(variables["params"])
    print(f"loss {float(loss):.4f}  (compile+step {time.perf_counter() - t0:.1f}s)")

    # sampling (README: generated_audio = model.sample(length=1024))
    t0 = time.perf_counter()
    f = jax.jit(lambda v, k: sample(ns2, v, k, length=1024, batch_size=1))
    audio_out = f(variables, jax.random.PRNGKey(3))
    wall = time.perf_counter() - t0
    audio_sec = audio_out.shape[-1] / 24000
    print(
        f"sampled {audio_out.shape} in {wall:.1f}s (incl. compile); "
        f"RTF first-call {audio_sec / wall:.2f}"
    )
    t0 = time.perf_counter()
    audio_out = f(variables, jax.random.PRNGKey(4))
    float(audio_out.sum())
    wall = time.perf_counter() - t0
    print(f"steady-state: {wall:.2f}s for 1000 steps → RTF {audio_sec / wall:.2f}x realtime")
    assert audio_out.shape == (1, 327680)


if __name__ == "__main__":
    main()
