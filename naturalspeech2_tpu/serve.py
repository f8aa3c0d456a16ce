"""Production TTS serving: compiled-bucket inference + a stdlib HTTP server.

The reference stops at a Python `sample()` call; serving it for real on
TPU needs three things it does not provide, all handled here:

1. **Static-shape buckets.** XLA compiles one program per input shape, so
   free-form text/length requests would retrace constantly. `TTSEngine`
   pads text ids and latent lengths up to a fixed bucket grid and
   precompiles each bucket once at startup (`warmup()`); runtime requests
   then always hit the jit cache.
2. **Serialized device access + dynamic batching.** One engine owns the
   chip; a lock serializes sampling while the (host-side) text frontend
   runs concurrently in request threads. With `start_batcher()`,
   concurrent same-bucket requests arriving within `batch_window_ms`
   share ONE batched device call (batch dim padded to a power of two ≤
   `max_batch`) — batched sampling amortizes the per-step cost ~3× at
   batch 4 on the flagship config.
3. **A transport.** `TTSServer` is a dependency-free `http.server`
   endpoint: `POST /tts {"text": "...", "seconds": 2.0, "prompt": "<path
   or base64 wav>"}` → `audio/wav` bytes; `GET /healthz` → build/bucket
   info. Run: `python -m naturalspeech2_tpu.serve --demo` (tiny random
   model) or construct `TTSServer(engine)` around a trained one.

TPU notes: buckets keep every program static-shape (SURVEY §7 design
stance); the engine samples through the same jitted `sample` path the
benchmarks measure, so serving throughput tracks `bench.py` numbers.
"""

from __future__ import annotations

import base64
import io
import json
import threading
import time
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["TTSEngine", "TTSServer"]


def _wav_bytes(audio: np.ndarray, sample_rate: int) -> bytes:
    """float waveform [-1, 1] → 16-bit PCM WAV bytes (stdlib only)."""
    import struct
    import wave

    pcm = (np.clip(audio, -1.0, 1.0) * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(struct.pack(f"<{pcm.size}h", *pcm.tolist()))
    return buf.getvalue()


@dataclass
class _Request:
    """A prepared request travelling through the batcher."""

    ids: np.ndarray          # [t_bucket] int token ids (padded)
    n_tokens: int
    prompt: np.ndarray       # [prompt_samples] float32
    frames: int
    t_bucket: int
    f_bucket: int
    seed: int
    done: threading.Event = field(default_factory=threading.Event)
    result: Optional[np.ndarray] = None
    error: Optional[Exception] = None


@dataclass
class TTSEngine:
    """Bucketed, precompiled inference around `NaturalSpeech2`.

    ``text_buckets`` are token-length ceilings, ``frame_buckets`` latent
    frame counts; every (text_bucket, frame_bucket) pair is one compiled
    program. ``prompt_samples`` fixes the conditioning prompt crop.
    """

    ns2: object
    variables: dict
    text_buckets: Sequence[int] = (32, 64, 128)
    frame_buckets: Sequence[int] = (256, 512, 1024)
    prompt_samples: int = 32768
    cond_scale: float = 2.5
    cfg_rescale: float = 0.0
    # (t_lo, t_hi): limited-interval CFG — guidance (the batch-doubled
    # forward) only at diffusion times inside the interval; outside, one
    # conditional forward. ~30% fewer denoiser FLOPs at (0.1, 0.8)/100 steps.
    cfg_interval: Optional[Tuple[float, float]] = None
    timesteps: Optional[int] = 100
    max_batch: int = 4
    batch_window_ms: float = 8.0
    mesh: Optional[object] = None  # jax.sharding.Mesh: multi-chip TP serving
    dtype: Optional[str] = None    # "bfloat16": denoiser scan in bf16
    _lock: threading.Lock = field(default_factory=threading.Lock, repr=False)

    def __post_init__(self):
        from naturalspeech2_tpu.models.naturalspeech2 import sample as _sample

        self._sample = _sample
        self._dur_jitted = {}
        # observability ring buffer: (wall_seconds, bucket) per request
        self._latencies: list = []
        self._requests = 0
        if self.dtype:
            # cast the denoiser params ONCE at engine init: `sample(dtype=)`
            # casts inside the jitted program, which would otherwise hold
            # both the f32 inputs and a bf16 copy live per dispatch
            # (transient ~1.5× param HBM in serving — ADVICE r3). With the
            # leaves already bf16, sample()'s in-program cast is a no-op.
            dt = jnp.dtype(self.dtype)
            params = dict(self.variables["params"])
            params["model"] = jax.tree_util.tree_map(
                lambda p: p.astype(dt) if p.dtype == jnp.float32 else p,
                params["model"],
            )
            self.variables = {**self.variables, "params": params}
        if self.mesh is not None:
            # latency-oriented multi-chip serving: Megatron-pattern tensor
            # parallelism over the mesh's ``model`` axis — params carry the
            # shardings, GSPMD inserts the attention/FF all-reduces inside
            # every denoise step of the jitted sampling scan (same layout
            # the driver's dryrun exercises). Inputs stay host-side numpy
            # (uncommitted), so jit places them on the mesh per program.
            from naturalspeech2_tpu.parallel import tp

            self.variables = jax.device_put(
                self.variables, tp.state_shardings(self.mesh, self.variables)
            )
        self._jitted = {}
        self._hop = (
            self.ns2.codec.seq_len_multiple_of
            if self.ns2.codec is not None
            else 320
        )
        self._sr = self.ns2.sample_hz
        self._queue = None
        self._batcher = None
        self._device_calls = 0  # observability: jitted dispatches issued
        if not self.ns2.conditional:
            raise ValueError("TTSEngine serves conditional (text+prompt) models")
        if self.ns2.tokenizer is None:
            raise ValueError("NaturalSpeech2 needs tokenizer= for raw text")

    # ------------------------------------------------------------------ #

    def _bucket(self, value: int, buckets: Sequence[int], what: str) -> int:
        for b in sorted(buckets):
            if value <= b:
                return b
        raise ValueError(
            f"{what}={value} exceeds the largest serving bucket "
            f"{max(buckets)}; raise {what}_buckets"
        )

    def _dur_fn_for(self, t_bucket: int):
        """Jitted duration-predictor program (one per text bucket): total
        predicted frames for a batch of token ids — the NaturalSpeech 2
        way to choose output length when the caller gives no ``seconds``
        (prompt-conditioned duration predictor, same truncation as the
        sampler's `generate_mask_from_repeats` int cast)."""
        if t_bucket not in self._dur_jitted:
            ns2 = self.ns2

            def duration_only(mdl, prompt, text):
                prompt_latents = mdl.process_prompt(prompt)
                prompt_enc = mdl.prompt_enc(prompt_latents, deterministic=True)
                phoneme_enc = mdl.phoneme_enc(text, deterministic=True)
                d, _ = mdl.duration_pitch(
                    phoneme_enc, prompt_enc, deterministic=True
                )
                return d

            def run(variables, prompt, text, text_lens):
                d = ns2.apply(variables, prompt, text, method=duration_only)
                pos = jnp.arange(d.shape[-1])[None, :]
                keep = pos < text_lens[:, None]
                return jnp.sum(
                    jnp.where(keep, d.astype(jnp.int32), 0), axis=-1
                )

            self._dur_jitted[t_bucket] = jax.jit(run)
        return self._dur_jitted[t_bucket]

    def _fn_for(self, t_bucket: int, f_bucket: int):
        key = (t_bucket, f_bucket)
        if key not in self._jitted:
            ns2, cond_scale, timesteps = self.ns2, self.cond_scale, self.timesteps
            sample_dtype = jnp.dtype(self.dtype) if self.dtype else None

            def run(variables, prompt, text, text_lens, rng):
                return self._sample(
                    ns2, variables, rng, length=f_bucket, prompt=prompt,
                    text=text, text_lens=text_lens, cond_scale=cond_scale,
                    cfg_rescale=self.cfg_rescale,
                    cfg_interval=self.cfg_interval, timesteps=timesteps,
                    dtype=sample_dtype,
                )

            self._jitted[key] = jax.jit(run)
        return self._jitted[key]

    def warmup(self, buckets: Optional[Sequence[Tuple[int, int]]] = None):
        """Compile serving buckets ahead of traffic (all pairs by default)."""
        pairs = buckets or [
            (t, f) for t in self.text_buckets for f in self.frame_buckets
        ]
        prompt = jnp.zeros((1, self.prompt_samples), jnp.float32)
        for t_bucket, f_bucket in pairs:
            fn = self._fn_for(t_bucket, f_bucket)
            ids = jnp.zeros((1, t_bucket), jnp.int32)
            lens = jnp.ones((1,), jnp.int32)
            jax.block_until_ready(
                fn(self.variables, prompt, ids, lens, jax.random.PRNGKey(0))
            )
        return sorted(self._jitted)

    # ------------------------------------------------------------------ #

    def _prepare(self, text: str, prompt_audio: np.ndarray,
                 seconds: Optional[float], seed: int) -> "_Request":
        """Host-side frontend: clean/phonemize/tokenize, pad to buckets."""
        ids = np.asarray(self.ns2.tokenizer.texts_to_tensor_ids([text]))[0]
        n_tokens = ids.shape[0]
        t_bucket = self._bucket(n_tokens, self.text_buckets, "text tokens")
        ids = np.concatenate([
            ids,
            np.full((t_bucket - n_tokens,), self.ns2.tokenizer.pad_id,
                    dtype=ids.dtype),
        ])

        prompt = np.zeros((self.prompt_samples,), np.float32)
        crop = prompt_audio.reshape(-1)[-self.prompt_samples:]
        prompt[: crop.shape[0]] = crop

        if seconds is None:
            # no duration requested → ask the model: prompt-conditioned
            # duration predictor decides the output length (one extra small
            # device call; program cached per text bucket)
            fn = self._dur_fn_for(t_bucket)
            with self._lock:
                pred = fn(
                    self.variables,
                    jnp.asarray(prompt)[None],
                    jnp.asarray(ids)[None],
                    jnp.asarray([n_tokens], jnp.int32),
                )
                frames = max(1, int(np.asarray(pred)[0]))
            frames = min(frames, max(self.frame_buckets))
        else:
            frames = int(round(seconds * self._sr / self._hop))
        f_bucket = self._bucket(frames, self.frame_buckets, "frames")
        return _Request(ids, n_tokens, prompt, frames, t_bucket, f_bucket, seed)

    def _run_batch(self, reqs: Sequence["_Request"]):
        """Run same-bucket requests as ONE device call. The batch dim is
        padded to the next power of two (≤ max_batch) so jit's shape cache
        stays small; padding rows repeat row 0 and are dropped.

        Batched randomness: the device call uses the FIRST request's seed
        (folded per batch); per-request `seed` is only reproducible at
        batch size 1 (single-request traffic or batcher off)."""
        t_bucket, f_bucket = reqs[0].t_bucket, reqs[0].f_bucket
        n = len(reqs)
        b = 1
        while b < n:
            b *= 2
        rows = list(reqs) + [reqs[0]] * (b - n)
        ids = jnp.asarray(np.stack([r.ids for r in rows]))
        prompts = jnp.asarray(np.stack([r.prompt for r in rows]))
        lens = jnp.asarray([r.n_tokens for r in rows], jnp.int32)
        fn = self._fn_for(t_bucket, f_bucket)
        with self._lock:
            self._device_calls += 1
            wav = fn(self.variables, prompts, ids, lens,
                     jax.random.PRNGKey(reqs[0].seed))
            wav = np.asarray(jax.block_until_ready(wav))
        return [wav[i, : r.frames * self._hop] for i, r in enumerate(reqs)]

    def tts(
        self,
        text: str,
        prompt_audio: np.ndarray,
        seconds: Optional[float] = None,
        seed: int = 0,
    ) -> Tuple[np.ndarray, int]:
        """text + prompt waveform → (waveform float32 [-1,1], sample_rate).

        With the batcher running (`start_batcher`), concurrent requests
        that land in the same (text, frame) bucket share one device call;
        otherwise each request dispatches directly.
        """
        t0 = time.monotonic()
        req = self._prepare(text, prompt_audio, seconds, seed)
        if self._queue is not None:
            self._queue.put(req)
            req.done.wait()
            if req.error is not None:
                raise req.error
            result = req.result
        else:
            result = self._run_batch([req])[0]
        self._record(time.monotonic() - t0, req)
        return result, self._sr

    def _record(self, wall_s: float, req: "_Request"):
        self._requests += 1
        self._latencies.append((wall_s, (req.t_bucket, req.f_bucket)))
        if len(self._latencies) > 1024:  # bounded ring
            del self._latencies[: len(self._latencies) - 1024]

    def stats(self) -> dict:
        """Serving metrics: request/device-call counts and end-to-end
        latency percentiles (over the last ≤1024 requests), per bucket."""
        lats = sorted(w for w, _ in self._latencies)

        def pct(p):
            if not lats:
                return None
            return round(lats[min(len(lats) - 1, int(p * len(lats)))] * 1e3, 1)

        by_bucket: dict = {}
        for _, b in self._latencies:
            by_bucket[str(b)] = by_bucket.get(str(b), 0) + 1
        return {
            "requests": self._requests,
            "device_calls": self._device_calls,
            "latency_ms": {"p50": pct(0.5), "p95": pct(0.95), "p99": pct(0.99)},
            "requests_by_bucket": by_bucket,
            "compiled_buckets": sorted(self._jitted),
        }

    def tts_long(
        self,
        text: str,
        prompt_audio: np.ndarray,
        seed: int = 0,
        crossfade_ms: float = 20.0,
    ) -> Tuple[np.ndarray, int]:
        """Long-form TTS: split ``text`` at sentence boundaries into chunks
        that fit the text buckets, synthesize each (duration-predictor
        length), and join with a short equal-power crossfade.

        Chunks are independently sampled — the shared prompt keeps the
        voice consistent (the zero-shot premise); the crossfade removes
        boundary clicks. With the batcher running, chunks are submitted
        concurrently and same-bucket chunks share device calls.
        """
        chunks = self._split_text(text)
        if len(chunks) == 1:
            return self.tts(chunks[0], prompt_audio, seed=seed)

        results: list = [None] * len(chunks)
        if self._queue is not None:
            # concurrent submission → the batcher groups same-bucket chunks
            errors: list = [None] * len(chunks)

            def worker(i):
                try:
                    results[i] = self.tts(
                        chunks[i], prompt_audio, seed=seed + i
                    )[0]
                except Exception as e:  # noqa: BLE001 — re-raised below
                    errors[i] = e

            threads = [
                threading.Thread(target=worker, args=(i,))
                for i in range(len(chunks))
            ]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            for e in errors:
                if e is not None:
                    raise e
        else:
            for i, c in enumerate(chunks):
                results[i] = self.tts(c, prompt_audio, seed=seed + i)[0]

        fade = int(self._sr * crossfade_ms / 1e3)
        out = results[0]
        for nxt in results[1:]:
            f = min(fade, len(out), len(nxt))
            if f > 0:
                ramp = np.sin(
                    np.linspace(0, np.pi / 2, f, dtype=np.float32)
                )
                mixed = out[-f:] * np.flip(ramp) + nxt[:f] * ramp
                out = np.concatenate([out[:-f], mixed, nxt[f:]])
            else:
                out = np.concatenate([out, nxt])
        return out, self._sr

    def tts_long_stream(
        self,
        text: str,
        prompt_audio: np.ndarray,
        seed: int = 0,
        crossfade_ms: float = 20.0,
    ):
        """Generator of float32 waveform chunks — the streaming form of
        `tts_long`: each sentence chunk is emitted as soon as it is
        synthesized (time-to-first-audio ≈ one chunk's latency instead of
        the whole utterance), with the crossfade applied at boundaries by
        holding back ``fade`` samples between chunks. Concatenating the
        yields equals `tts_long`'s output for the same seeds."""
        chunks = self._split_text(text)
        fade = int(self._sr * crossfade_ms / 1e3)
        held: Optional[np.ndarray] = None
        for i, c in enumerate(chunks):
            wav = self.tts(c, prompt_audio, seed=seed + i)[0]
            if held is not None:
                f = min(fade, len(held), len(wav))
                if f > 0:
                    r = np.sin(np.linspace(0, np.pi / 2, f, dtype=np.float32))
                    mixed = held[-f:] * np.flip(r) + wav[:f] * r
                    yield np.concatenate([held[:-f], mixed])
                    wav = wav[f:]
                elif len(held):
                    yield held
            if i < len(chunks) - 1:
                k = min(fade, len(wav))
                held, emit = wav[len(wav) - k:], wav[: len(wav) - k]
            else:
                held, emit = None, wav
            if len(emit):
                yield emit
        if held is not None and len(held):
            yield held

    def _split_text(self, text: str) -> list:
        """Sentence-boundary split, greedily re-packed so every chunk fits
        the largest text bucket (token count measured with the real
        tokenizer)."""
        import re

        budget = max(self.text_buckets)
        pieces = [
            p.strip() for p in re.split(r"(?<=[.!?;:])\s+", text) if p.strip()
        ]

        def n_tok(s: str) -> int:
            return np.asarray(
                self.ns2.tokenizer.texts_to_tensor_ids([s])
            ).shape[1]

        chunks, current = [], ""
        for p in pieces:
            candidate = f"{current} {p}".strip() if current else p
            if current and n_tok(candidate) > budget:
                chunks.append(current)
                current = p
            else:
                current = candidate
        if current:
            chunks.append(current)

        # a single sentence can still overflow: split it on whitespace
        final = []
        for c in chunks:
            if n_tok(c) <= budget:
                final.append(c)
                continue
            words = c.split()
            cur = ""
            for w in words:
                cand = f"{cur} {w}".strip() if cur else w
                if cur and n_tok(cand) > budget:
                    final.append(cur)
                    cur = w
                else:
                    cur = cand
            if cur:
                final.append(cur)
        return final or [text]

    # ------------------------------------------------------------------ #
    # dynamic batching
    # ------------------------------------------------------------------ #

    def start_batcher(self):
        """Spawn the micro-batching worker: requests arriving within
        ``batch_window_ms`` of each other in the same bucket run as one
        batched device call (up to ``max_batch``)."""
        import queue

        if self._batcher is not None:
            return
        self._queue = queue.Queue()
        self._stop = threading.Event()
        self._batcher = threading.Thread(target=self._batch_loop, daemon=True)
        self._batcher.start()

    def stop_batcher(self):
        if self._batcher is None:
            return
        self._stop.set()
        self._queue.put(None)  # wake the worker
        self._batcher.join()
        self._batcher = None
        self._queue = None

    def _batch_loop(self):
        import queue

        while not self._stop.is_set():
            first = self._queue.get()
            if first is None:
                continue
            group, holdback = [first], []
            deadline = time.monotonic() + self.batch_window_ms / 1e3
            while len(group) < self.max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    nxt = self._queue.get(timeout=remaining)
                except queue.Empty:
                    break
                if nxt is None:
                    break
                if (nxt.t_bucket, nxt.f_bucket) == (
                    first.t_bucket, first.f_bucket
                ):
                    group.append(nxt)
                else:
                    holdback.append(nxt)
            for item in holdback:  # different bucket: next rounds
                self._queue.put(item)
            try:
                outs = self._run_batch(group)
                for r, out in zip(group, outs):
                    r.result = out
            except Exception as e:  # surface to every waiter
                for r in group:
                    r.error = e
            for r in group:
                r.done.set()


class TTSServer(ThreadingHTTPServer):
    """`POST /tts` + `GET /healthz` around a `TTSEngine` (stdlib only)."""

    daemon_threads = True

    def __init__(self, engine: TTSEngine, address: Tuple[str, int] = ("127.0.0.1", 0)):
        self.engine = engine
        super().__init__(address, _Handler)

    @property
    def port(self) -> int:
        return self.server_address[1]


def _wav_stream_header(sample_rate: int) -> bytes:
    """WAV header with unknown (maximal) length — for chunked streaming."""
    import struct

    return (
        b"RIFF" + struct.pack("<I", 0xFFFFFFFF) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate,
                                sample_rate * 2, 2, 16)
        + b"data" + struct.pack("<I", 0xFFFFFFFF)
    )


class _Handler(BaseHTTPRequestHandler):
    # HTTP/1.1 for Transfer-Encoding: chunked (every non-streaming response
    # sets Content-Length, so keep-alive stays correct)
    protocol_version = "HTTP/1.1"

    def log_message(self, *args):  # quiet
        pass

    def _stream_tts(self, engine, text, prompt, seed):
        """Chunked audio/wav: each sentence chunk is flushed as soon as it
        is synthesized — time-to-first-audio ≈ one chunk's latency."""
        gen = engine.tts_long_stream(text, np.asarray(prompt), seed=seed)
        first = next(gen)  # synthesize before headers so errors still 400
        self.send_response(200)
        self.send_header("Content-Type", "audio/wav")
        self.send_header("Transfer-Encoding", "chunked")
        self.end_headers()

        def chunk(b: bytes):
            self.wfile.write(f"{len(b):X}\r\n".encode() + b + b"\r\n")

        def pcm(wav):
            return (np.clip(wav, -1.0, 1.0) * 32767.0).astype("<i2").tobytes()

        chunk(_wav_stream_header(engine._sr))
        chunk(pcm(first))
        for wav in gen:
            chunk(pcm(wav))
        self.wfile.write(b"0\r\n\r\n")

    def _json(self, code: int, obj):
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path == "/metrics":
            return self._json(200, self.server.engine.stats())
        if self.path != "/healthz":
            return self._json(404, {"error": "not found"})
        eng = self.server.engine
        self._json(200, {
            "status": "ok",
            "sample_rate": eng._sr,
            "compiled_buckets": sorted(map(list, eng._jitted)),
            "text_buckets": list(eng.text_buckets),
            "frame_buckets": list(eng.frame_buckets),
            "batching": eng._batcher is not None,
            "device_calls": eng._device_calls,
        })

    def do_POST(self):
        if self.path != "/tts":
            return self._json(404, {"error": "not found"})
        try:
            length = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(length) or b"{}")
            text = req["text"]
            if "prompt_wav_base64" in req:
                from naturalspeech2_tpu.data import decode_audio_bytes

                raw = base64.b64decode(req["prompt_wav_base64"])
                prompt, _sr = decode_audio_bytes(raw)
            elif "prompt_path" in req:
                from naturalspeech2_tpu.data import load_audio

                prompt, _sr = load_audio(req["prompt_path"])
            else:
                raise KeyError("prompt_wav_base64 or prompt_path required")
            engine = self.server.engine
            if req.get("stream"):
                return self._stream_tts(
                    engine, text, prompt, int(req.get("seed", 0))
                )
            n_tokens = np.asarray(
                engine.ns2.tokenizer.texts_to_tensor_ids([text])
            ).shape[1]
            if n_tokens > max(engine.text_buckets) or req.get("long"):
                # long-form: sentence-chunked synthesis instead of a 400
                wav, sr = engine.tts_long(
                    text, np.asarray(prompt), seed=int(req.get("seed", 0))
                )
            else:
                wav, sr = engine.tts(
                    text, np.asarray(prompt), seconds=req.get("seconds"),
                    seed=int(req.get("seed", 0)),
                )
        except (KeyError, ValueError) as e:
            return self._json(400, {"error": str(e)})
        body = _wav_bytes(wav, sr)
        self.send_response(200)
        self.send_header("Content-Type", "audio/wav")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


def _demo_engine() -> TTSEngine:
    """Tiny randomly-initialised conditional pipeline (serving plumbing
    demo — swap in trained variables for real speech)."""
    import naturalspeech2_tpu as ns

    codec = ns.SoundStream(
        codebook_dim=16, channels=4, num_quantizers=2, codebook_size=16,
        use_pallas_rvq=False,
    )
    model = ns.Model(
        dim=16, depth=1, heads=2, dim_head=8, wavenet_layers=1,
        wavenet_stacks=1, condition_on_prompt=True, dim_prompt=24,
        num_latents_m=4, resampler_depth=1, use_flash_attn=False,
    )
    ns2 = ns.NaturalSpeech2(
        model=model, codec=codec, timesteps=4, tokenizer=ns.Tokenizer(),
        duration_pitch_dim=24, aligner_dim_in=8, aligner_dim_hidden=24,
        aligner_attn_channels=8, pitch_emb_dim=32, pitch_emb_pp_hidden_dim=24,
        phoneme_enc_kwargs=dict(dim=24, dim_hidden=24, kernel_size=3, depth=1,
                                dim_head=8, heads=2, use_flash=False),
        prompt_enc_kwargs=dict(dims=(24, 24), depth=1, heads=2, dim_head=8,
                               kernel_size=3, use_flash_attn=False),
        duration_pitch_kwargs=dict(dim_encoded_prompts=24, depth=1,
                                   kernel_size=3, heads=2, dim_head=8,
                                   dim_hidden=24, use_flash_attn=False,
                                   num_convolutions_per_block=1,
                                   num_convs_per_resnet_block=1),
    )
    key = jax.random.PRNGKey(0)
    audio = jax.random.uniform(key, (1, 640), minval=-1, maxval=1)
    variables = ns2.init(
        {"params": key, "times": key, "noise": key},
        audio,
        text=jnp.asarray(ns2.tokenizer.texts_to_tensor_ids(["hi"])),
        mel=jax.random.normal(key, (1, 8, 10)),
        pitch=100.0 + 50.0 * jax.random.uniform(key, (1, 1, 10)),
        prompt=audio,
    )
    params = dict(variables["params"])
    params["codec"] = codec.init(key, audio)["params"]
    return TTSEngine(
        ns2, {"params": params}, text_buckets=(16, 32),
        frame_buckets=(8, 16), prompt_samples=640, timesteps=2,
        cond_scale=1.0,
    )


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--demo", action="store_true",
                    help="serve a tiny random model (plumbing demo)")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8777)
    args = ap.parse_args()
    if not args.demo:
        raise SystemExit(
            "construct TTSServer(TTSEngine(ns2, variables)) around a trained "
            "model, or pass --demo for the plumbing demo"
        )
    eng = _demo_engine()
    print("compiling serving buckets...", flush=True)
    print("compiled:", eng.warmup())
    eng.start_batcher()
    srv = TTSServer(eng, (args.host, args.port))
    print(f"serving on http://{args.host}:{srv.port}  (POST /tts, GET /healthz)")
    srv.serve_forever()
