"""TTS serving: bucketed compiled inference + the HTTP endpoint.

Drives the real server over a socket: POST /tts with raw text and a
base64 WAV prompt must return playable 16-bit WAV audio; bucket routing
must reuse compiled programs; oversize requests must 400.
"""

import base64
import io
import json
import threading
import urllib.request
import wave

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import naturalspeech2_tpu as ns
from naturalspeech2_tpu.serve import TTSEngine, TTSServer, _wav_bytes


def _build_tiny_engine(mesh=None, dtype=None):
    codec = ns.SoundStream(
        codebook_dim=16, channels=4, num_quantizers=2, codebook_size=16,
        use_pallas_rvq=False,
    )
    model = ns.Model(
        dim=16, depth=1, heads=2, dim_head=8, wavenet_layers=1,
        wavenet_stacks=1, condition_on_prompt=True, dim_prompt=24,
        num_latents_m=4, resampler_depth=1, use_flash_attn=False,
    )
    small = dict(
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
    ns2 = ns.NaturalSpeech2(
        model=model, codec=codec, timesteps=4, tokenizer=ns.Tokenizer(),
        **small,
    )
    key = jax.random.PRNGKey(0)
    audio = jax.random.uniform(key, (1, 2 * 320), minval=-1, maxval=1)
    text_ids = jnp.asarray(ns2.tokenizer.texts_to_tensor_ids(["hi"]))
    mel = jax.random.normal(key, (1, 8, 10))
    pitch = 100.0 + 50.0 * jax.random.uniform(key, (1, 1, 10))
    variables = ns2.init(
        {"params": key, "times": key, "noise": key},
        audio, text=text_ids, mel=mel, pitch=pitch, prompt=audio,
    )
    params = dict(variables["params"])
    params["codec"] = codec.init(key, audio)["params"]
    return TTSEngine(
        ns2, {"params": params},
        text_buckets=(16, 32), frame_buckets=(8, 16),
        prompt_samples=640, timesteps=2, cond_scale=1.0,
        mesh=mesh, dtype=dtype,
    )


@pytest.fixture(scope="module")
def engine():
    return _build_tiny_engine()


def test_tp_mesh_serving_matches_single_device(engine):
    """TTSEngine(mesh=…): params TP-sharded over the 'model' axis must
    produce the same waveform as the unsharded engine (same init key)."""
    from naturalspeech2_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n_data=1, n_model=2, devices=jax.devices()[:2])
    tp_engine = _build_tiny_engine(mesh=mesh)

    # params actually carry the mesh
    leaves = jax.tree_util.tree_leaves(tp_engine.variables)
    assert any(
        getattr(l.sharding, "mesh", None) is not None
        and l.sharding.mesh.shape.get("model") == 2
        for l in leaves
    )

    prompt = np.sin(np.linspace(0, 40, 960)).astype(np.float32)
    wav_tp, sr = tp_engine.tts("hello", prompt, seconds=8 * 320 / 24000, seed=3)
    wav_1d, _ = engine.tts("hello", prompt, seconds=8 * 320 / 24000, seed=3)
    assert sr == 24000
    np.testing.assert_allclose(wav_tp, wav_1d, atol=2e-4)


def test_engine_buckets_and_tts(engine):
    compiled = engine.warmup(buckets=[(16, 8)])
    assert (16, 8) in compiled

    prompt = np.sin(np.linspace(0, 40, 960)).astype(np.float32)
    wav, sr = engine.tts("hello", prompt, seconds=8 * 320 / 24000)
    assert sr == 24000
    assert wav.shape == (8 * 320,)
    assert np.isfinite(wav).all()
    # same bucket → no new compilation entries beyond (16, 8)
    assert (16, 8) in engine._jitted

    with pytest.raises(ValueError, match="bucket"):
        engine.tts("x " * 200, prompt)  # text exceeds the largest bucket


def test_bf16_engine_matches_f32(engine):
    """`TTSEngine(dtype="bfloat16")` (denoiser scan in bf16) must serve
    finite audio that closely tracks the f32 engine's waveform for the
    same request + seed (schedule math and codec decode stay f32)."""
    bf16_engine = _build_tiny_engine(dtype="bfloat16")
    prompt = np.sin(np.linspace(0, 40, 960)).astype(np.float32)
    secs = 8 * 320 / 24000
    w32, _ = engine.tts("hello", prompt, seconds=secs, seed=3)
    w16, sr = bf16_engine.tts("hello", prompt, seconds=secs, seed=3)
    assert sr == 24000
    assert w16.shape == w32.shape
    assert np.isfinite(w16).all()
    corr = np.corrcoef(w16.ravel(), w32.ravel())[0, 1]
    assert corr > 0.98, corr


def test_auto_length_uses_duration_predictor(engine):
    """seconds=None → the prompt-conditioned duration predictor chooses the
    output length (clamped into the frame-bucket range)."""
    prompt = np.sin(np.linspace(0, 40, 960)).astype(np.float32)
    wav, sr = engine.tts("hello there", prompt)  # no seconds
    assert sr == 24000
    assert 1 * 320 <= wav.shape[0] <= max(engine.frame_buckets) * 320
    assert wav.shape[0] % 320 == 0
    # the duration program is cached per text bucket
    assert len(engine._dur_jitted) == 1


def test_dynamic_batching_shares_device_calls(engine):
    """Concurrent same-bucket requests must run as ONE batched dispatch;
    results must match the same request run solo at the same batch."""
    engine.batch_window_ms = 300.0
    engine.start_batcher()
    try:
        prompt = np.sin(np.linspace(0, 40, 960)).astype(np.float32)
        calls_before = engine._device_calls
        results = [None] * 4

        def worker(i):
            results[i] = engine.tts(
                "hello", prompt, seconds=8 * 320 / 24000, seed=7
            )[0]

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

        made = engine._device_calls - calls_before
        assert made < 4, f"batching inactive: {made} device calls for 4 requests"
        for wav in results:
            assert wav.shape == (8 * 320,) and np.isfinite(wav).all()
    finally:
        engine.stop_batcher()
        engine.batch_window_ms = 8.0

    # direct (batcher off) path still works after stop
    wav, sr = engine.tts("hi again", np.zeros(320, np.float32),
                         seconds=8 * 320 / 24000)
    assert wav.shape == (8 * 320,)


def test_tts_long_sentence_chunking(engine):
    """tts_long: text beyond the largest bucket is sentence-split, chunks
    synthesized (duration-predictor lengths) and crossfaded together."""
    text = "hello there. " * 6  # well past the 32-token budget
    chunks = engine._split_text(text)
    assert len(chunks) >= 2
    for c in chunks:
        n = np.asarray(engine.ns2.tokenizer.texts_to_tensor_ids([c])).shape[1]
        assert n <= max(engine.text_buckets)

    prompt = np.sin(np.linspace(0, 40, 960)).astype(np.float32)
    wav, sr = engine.tts_long(text, prompt, seed=1)
    assert sr == 24000
    assert np.isfinite(wav).all()
    # at least two chunks minus crossfade overlap
    assert wav.shape[0] > 320


def test_stream_equals_batch_long_form(engine):
    """Concatenated tts_long_stream chunks == tts_long output (same seeds)."""
    text = "hello there. " * 6
    prompt = np.sin(np.linspace(0, 40, 960)).astype(np.float32)
    whole, _ = engine.tts_long(text, prompt, seed=5, crossfade_ms=10.0)
    streamed = np.concatenate(
        list(engine.tts_long_stream(text, prompt, seed=5, crossfade_ms=10.0))
    )
    np.testing.assert_allclose(streamed, whole, atol=1e-5)


def test_http_streaming_tts(engine):
    """POST /tts with stream:true → chunked audio/wav (header + PCM16)."""
    server = TTSServer(engine)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{server.port}"
        prompt = np.sin(np.linspace(0, 40, 960)).astype(np.float32)
        req = urllib.request.Request(
            f"{base}/tts",
            data=json.dumps({
                "text": "hello there. " * 4,
                "prompt_wav_base64": base64.b64encode(
                    _wav_bytes(prompt, 24000)
                ).decode(),
                "stream": True,
            }).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            assert r.headers["Content-Type"] == "audio/wav"
            body = r.read()  # urllib reassembles the chunked stream
        assert body[:4] == b"RIFF" and body[8:12] == b"WAVE"
        pcm = np.frombuffer(body[44:], dtype="<i2")
        assert pcm.size > 320 and np.isfinite(pcm.astype(np.float32)).all()
    finally:
        server.shutdown()


def test_http_server_roundtrip(engine):
    server = TTSServer(engine)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{server.port}"

        with urllib.request.urlopen(f"{base}/healthz") as r:
            health = json.loads(r.read())
        assert health["status"] == "ok" and health["sample_rate"] == 24000

        prompt = np.sin(np.linspace(0, 40, 960)).astype(np.float32)
        req = urllib.request.Request(
            f"{base}/tts",
            data=json.dumps({
                "text": "hello world",
                "prompt_wav_base64": base64.b64encode(
                    _wav_bytes(prompt, 24000)
                ).decode(),
                "seconds": 8 * 320 / 24000,
            }).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            assert r.headers["Content-Type"] == "audio/wav"
            body = r.read()
        with wave.open(io.BytesIO(body)) as w:
            assert w.getframerate() == 24000
            assert w.getnframes() == 8 * 320

        # observability: /metrics reflects the traffic this module sent
        with urllib.request.urlopen(f"{base}/metrics") as r:
            stats = json.loads(r.read())
        assert stats["requests"] >= 1
        assert stats["latency_ms"]["p50"] is not None
        assert stats["device_calls"] >= 1

        # bad request: missing prompt
        bad = urllib.request.Request(
            f"{base}/tts", data=json.dumps({"text": "x"}).encode(),
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad)
        assert ei.value.code == 400
    finally:
        server.shutdown()
