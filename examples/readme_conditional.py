"""README config 2 at real scale (reference README.md:74-146 semantics):

conditional NaturalSpeech2 — Model(dim=128, depth=6, dim_prompt=512,
condition_on_prompt=True, cond_drop_prob=0.25) with the full conditioning
stack at reference dimensions (SpeechPromptEncoder 512, PhonemeEncoder 512,
DurationPitchPredictor 512, aligner 80-mel) — training loss on mock audio +
prompt (4, 32768) + text (4, 100), then 100-step CFG sampling (cond_scale 3,
batch-doubled cond/uncond fused forward).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from naturalspeech2_tpu import Model, NaturalSpeech2, SoundStream, sample


def main():
    codec = SoundStream()
    model = Model(
        dim=128, depth=6, dim_prompt=512, cond_drop_prob=0.25,
        condition_on_prompt=True,
    )
    ns2 = NaturalSpeech2(model=model, codec=codec, timesteps=1000)

    key = jax.random.PRNGKey(0)
    audio = jax.random.uniform(key, (4, 98304), minval=-1, maxval=1)  # 4 s
    prompt = jax.random.uniform(jax.random.PRNGKey(1), (4, 32768), minval=-1, maxval=1)
    text = jax.random.randint(jax.random.PRNGKey(2), (4, 100), 0, 100)
    text_lens = jnp.array([100, 100, 80, 120])

    rngs = {n: key for n in ("params", "times", "noise", "cfg", "dropout")}
    t0 = time.perf_counter()
    variables = ns2.init(rngs, audio, text=text, text_lens=text_lens, prompt=prompt)
    codec_full = codec.init(key, audio[:1, :3200])
    params = dict(variables["params"])
    params["codec"] = codec_full["params"]
    variables = {"params": params}
    print(f"init: {time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    losses = jax.jit(
        lambda v: ns2.apply(
            v, audio, text=text, text_lens=text_lens, prompt=prompt,
            rngs={n: jax.random.PRNGKey(i) for i, n in enumerate(
                ("times", "noise", "cfg", "dropout"))},
        )
    )(variables)
    print(
        "losses:",
        {k: round(float(v), 4) for k, v in losses.items()},
        f"({time.perf_counter() - t0:.1f}s incl. compile)",
        flush=True,
    )

    t0 = time.perf_counter()
    f = jax.jit(lambda v, k: sample(
        ns2, v, k, length=512, prompt=prompt, text=text, text_lens=text_lens,
        cond_scale=3.0, timesteps=100,
    ))
    out = f(variables, jax.random.PRNGKey(3))
    float(out.sum())
    print(
        f"100-step CFG sample: {out.shape} in {time.perf_counter()-t0:.1f}s "
        "(incl. compile)", flush=True,
    )
    t0 = time.perf_counter()
    out = f(variables, jax.random.PRNGKey(4))
    float(out.sum())
    wall = time.perf_counter() - t0
    audio_sec = out.shape[0] * out.shape[1] / 24000
    print(f"steady-state: {wall:.2f}s → RTF {audio_sec/wall:.1f}x realtime", flush=True)


if __name__ == "__main__":
    main()
