"""Serving latency/throughput of the flagship conditional pipeline on TPU.

Builds the README config-2 model (dim 128 / depth 6 / dim_prompt 512 +
SoundStream codec) behind `serve.TTSEngine`, warms the (100-token,
512-frame) bucket, then measures end-to-end request latency through the
REAL HTTP endpoint (`POST /tts` with raw English text + a WAV prompt
upload): host text frontend → bucketed jitted 100-step CFG sampling →
codec decode → WAV encode. Prints p50/p95 latency and realtime factor.

Usage: PYTHONPATH=.:/root/.axon_site python examples/serve_throughput.py [n_requests]
"""

from __future__ import annotations

import base64
import io
import json
import sys
import threading
import time
import urllib.request
import wave
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

import naturalspeech2_tpu as ns
from naturalspeech2_tpu.serve import TTSEngine, TTSServer, _wav_bytes

TEXTS = [
    "The quick brown fox jumps over the lazy dog.",
    "Speech synthesis on tensor processing units runs in real time.",
    "Hello world, this is a serving throughput measurement.",
    "Numbers like 42 and times like 9:30 am get normalized first.",
]


def main():
    n_requests = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    print(f"backend={jax.default_backend()}", flush=True)

    codec = ns.SoundStream()
    model = ns.Model(
        dim=128, depth=6, dim_prompt=512, cond_drop_prob=0.25,
        condition_on_prompt=True,
    )
    ns2 = ns.NaturalSpeech2(
        model=model, codec=codec, timesteps=1000, tokenizer=ns.Tokenizer()
    )
    key = jax.random.PRNGKey(0)
    audio = jax.random.uniform(key, (1, 98304), minval=-1, maxval=1)
    prompt = jax.random.uniform(key, (1, 32768), minval=-1, maxval=1)
    text = jnp.asarray(ns2.tokenizer.texts_to_tensor_ids([TEXTS[0]]))
    t0 = time.perf_counter()
    # jit the init: eager init dispatches hundreds of tiny programs through
    # the device tunnel (~8 min); one compiled program takes seconds
    rngs = {n: key for n in ("params", "times", "noise", "cfg", "dropout")}
    variables = jax.jit(
        lambda rngs: ns2.init(rngs, audio, text=text, prompt=prompt)
    )(rngs)
    params = dict(variables["params"])
    params["codec"] = jax.jit(lambda k: codec.init(k, audio[:, :3200]))(key)[
        "params"
    ]
    print(f"init: {time.perf_counter() - t0:.1f}s", flush=True)

    engine = TTSEngine(
        ns2, {"params": params},
        text_buckets=(128,), frame_buckets=(512,),
        prompt_samples=32768, cond_scale=3.0, timesteps=100,
    )
    t0 = time.perf_counter()
    engine.warmup()
    print(f"warmup compile: {time.perf_counter() - t0:.1f}s", flush=True)

    server = TTSServer(engine)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{server.port}"

    prompt_wav = base64.b64encode(
        _wav_bytes(np.asarray(prompt)[0], 24000)
    ).decode()
    seconds = 512 * 320 / 24000  # 6.83 s of audio per request

    lat = []
    for i in range(n_requests):
        req = urllib.request.Request(
            f"{base}/tts",
            data=json.dumps({
                "text": TEXTS[i % len(TEXTS)],
                "prompt_wav_base64": prompt_wav,
                "seconds": seconds,
                "seed": i,
            }).encode(),
        )
        t0 = time.perf_counter()
        with urllib.request.urlopen(req, timeout=600) as r:
            body = r.read()
        lat.append(time.perf_counter() - t0)
        if i == 0:
            with wave.open(io.BytesIO(body)) as w:
                assert w.getnframes() == 512 * 320, w.getnframes()

    lat = np.array(lat[1:])  # drop first (residual warm effects)
    p50, p95 = np.percentile(lat, 50), np.percentile(lat, 95)
    print(
        f"requests={len(lat)} audio/request={seconds:.2f}s "
        f"p50={p50*1e3:.0f}ms p95={p95*1e3:.0f}ms "
        f"RTF_p50={seconds/p50:.1f}x throughput={seconds/lat.mean():.1f} "
        f"audio-sec/wall-sec (sequential)", flush=True,
    )

    # --- concurrent leg: dynamic batching ------------------------------- #
    engine.batch_window_ms = 50.0
    engine.start_batcher()
    # compile the batch-4 program off the clock
    engine._run_batch([engine._prepare(TEXTS[0], np.asarray(prompt)[0],
                                       seconds, 0)] * 4)
    n_conc, waves = 16, [None] * 16
    calls0 = engine._device_calls

    def worker(i):
        req = urllib.request.Request(
            f"{base}/tts",
            data=json.dumps({
                "text": TEXTS[i % len(TEXTS)],
                "prompt_wav_base64": prompt_wav,
                "seconds": seconds,
                "seed": i,
            }).encode(),
        )
        with urllib.request.urlopen(req, timeout=600) as r:
            waves[i] = r.read()

    t0 = time.perf_counter()
    threads = [threading.Thread(target=worker, args=(i,)) for i in range(n_conc)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    calls = engine._device_calls - calls0
    print(
        f"concurrent: {n_conc} requests in {wall:.2f}s over {calls} device "
        f"calls -> throughput={n_conc*seconds/wall:.1f} audio-sec/wall-sec "
        f"(batched)"
    )
    engine.stop_batcher()
    server.shutdown()


if __name__ == "__main__":
    main()
