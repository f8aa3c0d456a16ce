"""Production-scale adversarial codec training (VERDICT r2 item 1b).

The reference's audio quality rests on a *pretrained* Encodec
(`/root/reference/naturalspeech2_pytorch/naturalspeech2_pytorch.py:23`,
used at :1496/:1611); this image has no speech dataset and no egress, so
the codec trains on a rich SYNTHETIC MULTI-SPEAKER speech generator:

- per-utterance speaker: F0 base/range (male/female/child registers), a
  vocal-tract length factor scaling a 6-vowel formant inventory (F1-F3
  from GenAm vowel tables), speech rate, breathiness;
- syllable strings: optional onset consonant (stop: closure + burst;
  fricative: shaped noise; approximant glide) + vowel nucleus with
  per-syllable formant targets, F0 declination + jitter, and a coda
  amplitude fall — the harmonic/formant/transient structure a speech
  codec must model;
- held-out evaluation: multi-resolution STFT distance, SI-SNR and
  mel-cepstral distortion (MCD dB) vs the input, plus saved .wav
  artifacts (docs/audio/) for listening.

Training is resumable (CodecTrainer.save/load carry both optimizer
states + codebook EMA) and checkpoints every --ckpt-every steps, so a
killed run continues where it stopped.

Usage:
  python examples/codec_speech_production.py [--steps N] [--warmup N]
      [--batch N] [--results DIR] [--eval-only]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from naturalspeech2_tpu.codec_trainer import CodecTrainer
from naturalspeech2_tpu.models.codec import SoundStream
from naturalspeech2_tpu.ops.stft_loss import multi_resolution_stft_loss

SR = 24000
T = 9600  # 0.4 s = 30 latent frames at hop 320

# GenAm vowel formant targets (F1, F2, F3) in Hz — /i ɛ æ ɑ o u/
VOWELS = np.array([
    [270, 2290, 3010],
    [530, 1840, 2480],
    [660, 1720, 2410],
    [730, 1090, 2440],
    [570, 840, 2410],
    [300, 870, 2240],
], dtype=np.float64)


def _resonator(x: np.ndarray, freq: float, bw: float) -> np.ndarray:
    from scipy.signal import lfilter

    r = np.exp(-np.pi * bw / SR)
    theta = 2 * np.pi * max(min(freq, SR / 2 - 200), 60.0) / SR
    gain = (1 - r) * np.sqrt(1 - 2 * r * np.cos(2 * theta) + r * r)
    return lfilter([gain], [1.0, -2 * r * np.cos(theta), r * r], x)


def _glottal_source(f0_track: np.ndarray, rng) -> np.ndarray:
    """Pulse-train glottal proxy with jitter + spectral tilt."""
    jitter = 1.0 + 0.01 * rng.randn(len(f0_track))
    phase = 2 * np.pi * np.cumsum(f0_track * jitter) / SR
    saw = ((phase / (2 * np.pi)) % 1.0) * 2 - 1
    # one-pole lowpass for glottal spectral tilt (-6 dB/oct-ish)
    from scipy.signal import lfilter

    return lfilter([1.0], [1.0, -0.9], saw)


def synth_speaker(rng: np.random.RandomState) -> dict:
    """Speaker = register + vocal-tract scale + rate + breathiness."""
    register = rng.choice(3)  # male / female / child
    f0_base = [rng.uniform(85, 140), rng.uniform(160, 240),
               rng.uniform(250, 330)][register]
    return dict(
        f0_base=f0_base,
        f0_range=rng.uniform(0.1, 0.35),  # relative excursion
        vtl=rng.uniform(0.85, 1.25),  # formant scale (vocal tract length)
        rate=rng.uniform(3.0, 6.0),  # syllables / s
        breath=rng.uniform(0.005, 0.04),
        vowels=VOWELS * rng.uniform(0.93, 1.07, size=VOWELS.shape),
    )


def synth_utterance(rng: np.random.RandomState, spk: dict | None = None
                    ) -> np.ndarray:
    """One 0.4 s multi-syllable utterance for a (possibly fresh) speaker."""
    if spk is None:
        spk = synth_speaker(rng)
    out = np.zeros(T)
    pos = 0
    syl_len = int(SR / spk["rate"])
    # F0 declination across the utterance + slow intonation wiggle
    t_all = np.arange(T) / SR
    f0_track = spk["f0_base"] * (
        1.0
        + spk["f0_range"] * np.sin(2 * np.pi * rng.uniform(0.8, 2.5) * t_all
                                   + rng.uniform(0, 6.28))
    ) * (1.0 - 0.15 * t_all / t_all[-1])
    source_all = _glottal_source(f0_track, rng)

    while pos < T - 400:
        n = min(int(syl_len * rng.uniform(0.7, 1.3)), T - pos)
        seg = np.zeros(n)
        i = 0
        # --- onset consonant (70% of syllables)
        c = rng.rand()
        if c < 0.30:  # stop: closure + burst
            closure = min(int(0.020 * SR), n // 3)
            burst = min(int(0.012 * SR), n // 4)
            b = rng.randn(burst)
            b = _resonator(b, rng.uniform(1500, 4000) * spk["vtl"], 600.0)
            seg[closure:closure + burst] = 6.0 * b
            i = closure + burst
        elif c < 0.55:  # fricative: high shaped noise
            fr = min(int(rng.uniform(0.03, 0.07) * SR), n // 2)
            f = rng.randn(fr)
            f = _resonator(f, rng.uniform(3500, 6500) * spk["vtl"], 1500.0)
            seg[:fr] = 3.0 * f
            i = int(fr * 0.8)  # slight overlap into the vowel
        elif c < 0.70:  # approximant: short low-F2 glide handled by vowel ramp
            i = int(0.015 * SR)

        # --- vowel nucleus with per-syllable formant target
        vow = spk["vowels"][rng.randint(len(spk["vowels"]))] * spk["vtl"]
        v_src = source_all[pos + i : pos + n].copy()
        v_src += spk["breath"] * rng.randn(len(v_src)) * 20.0
        v = (
            _resonator(v_src, vow[0], 90.0)
            + 0.63 * _resonator(v_src, vow[1], 110.0)
            + 0.25 * _resonator(v_src, vow[2], 170.0)
        )
        # syllable envelope: fast attack, slow fall into the coda
        env = np.minimum(np.arange(len(v)) / (0.012 * SR), 1.0)
        env *= np.linspace(1.0, rng.uniform(0.25, 0.7), len(v)) ** 1.5
        seg[i:] += v * env
        out[pos : pos + n] += seg
        pos += n

    out *= 0.7 / (np.abs(out).max() + 1e-6)
    return out.astype(np.float32)


def batches(seed: int, batch: int):
    rng = np.random.RandomState(seed)
    while True:
        # half the batch reuses one speaker (speaker consistency), half are
        # fresh speakers (coverage)
        spk = synth_speaker(rng)
        yield np.stack(
            [synth_utterance(rng, spk if i % 2 == 0 else None)
             for i in range(batch)]
        )


def prefetched_batches(seed: int, batch: int, depth: int = 64):
    """Producer-thread wrapper: synthesis (~90 ms/batch host-side) overlaps
    the device step instead of serializing with it."""
    import queue
    import threading

    q: "queue.Queue[np.ndarray]" = queue.Queue(maxsize=depth)

    def produce():
        for item in batches(seed, batch):
            q.put(item)

    threading.Thread(target=produce, daemon=True).start()
    while True:
        yield q.get()


# ----------------------------------------------------------------- metrics


@functools.partial(jax.jit, static_argnums=0)
def _reconstruct(codec, params, audio):
    latents, _, _ = codec.apply({"params": params}, audio, return_encoded=True)
    recon = codec.apply({"params": params}, latents, method=codec.decode)
    return recon[:, : audio.shape[1]]


def si_snr(ref: np.ndarray, est: np.ndarray) -> float:
    """Scale-invariant SNR (dB), mean over batch."""
    ref = ref - ref.mean(axis=1, keepdims=True)
    est = est - est.mean(axis=1, keepdims=True)
    proj = (np.sum(est * ref, 1, keepdims=True)
            / np.maximum(np.sum(ref * ref, 1, keepdims=True), 1e-9)) * ref
    noise = est - proj
    r = np.sum(proj**2, 1) / np.maximum(np.sum(noise**2, 1), 1e-9)
    return float(np.mean(10 * np.log10(np.maximum(r, 1e-9))))


def mcd_db(ref: np.ndarray, est: np.ndarray, n_mfc: int = 13) -> float:
    """Mel-cepstral distortion (dB) on 13 cepstra (excl. c0), mean frame."""
    from scipy.fftpack import dct

    from naturalspeech2_tpu.ops.mel import audio_to_mel

    def cepstra(x):
        m = np.asarray(audio_to_mel(jnp.asarray(x), n_mels=40))  # [b, 40, t] dB
        logm = m / 10.0 * np.log(10.0)  # back to natural-log power
        return dct(logm, axis=1, norm="ortho")[:, 1:n_mfc + 1]

    c_r, c_e = cepstra(ref), cepstra(est)
    d = np.sqrt(2.0 * np.sum((c_r - c_e) ** 2, axis=1))  # [b, t]
    return float((10.0 / np.log(10.0)) * d.mean())


def evaluate(codec, params, held_out: np.ndarray) -> dict:
    recon = np.asarray(_reconstruct(codec, params, jnp.asarray(held_out)))
    stft = float(multi_resolution_stft_loss(
        jnp.asarray(recon), jnp.asarray(held_out)))
    return {
        "mrstft": round(stft, 4),
        "si_snr_db": round(si_snr(held_out, recon), 3),
        "mcd_db": round(mcd_db(held_out, recon), 3),
        "wav_l1": round(float(np.abs(recon - held_out).mean()), 5),
    }, recon


# ------------------------------------------------------------------- main


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50_000)
    ap.add_argument("--warmup", type=int, default=2_000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--ckpt-every", type=int, default=5_000)
    ap.add_argument("--log-every", type=int, default=500)
    ap.add_argument("--results", default="results_codec_speech")
    ap.add_argument("--eval-only", action="store_true")
    # round-4 plateau-breaking recipe (VERDICT r3 #5): perceptual mel-L1
    # reconstruction term + cosine LR decay on both optimizers
    ap.add_argument("--mel-weight", type=float, default=0.0)
    # round-5 SI-SNR ablation (VERDICT r4 #5): the recipe's time-domain
    # wav L1 rides at weight 1.0 where the phase-invariant terms (MR-STFT,
    # mel-L1, discriminators) dominate the gradient; boosting it tests the
    # "SI-SNR plateau is structural" claim in docs/codec_training.md
    ap.add_argument("--wav-weight", type=float, default=1.0)
    ap.add_argument("--lr-schedule", choices=["cosine"], default=None)
    args = ap.parse_args()

    codec = SoundStream(use_pallas_rvq=jax.default_backend() == "tpu")
    trainer = CodecTrainer(
        codec,
        batches=prefetched_batches(seed=0, batch=args.batch),
        adversarial_weight=1.0,
        feature_weight=2.0,
        adversarial_warmup=args.warmup,
        disc_channels=32,
        results_folder=args.results,
        mel_weight=args.mel_weight,
        wav_weight=args.wav_weight,
        lr_schedule=args.lr_schedule,
        decay_steps=args.steps if args.lr_schedule else None,
    )

    eval_rng = np.random.RandomState(10_000)
    held_out = np.stack([synth_utterance(eval_rng) for _ in range(16)])

    latest = trainer.latest_checkpoint()
    if latest:
        print(f"resuming from {latest}", flush=True)
        trainer.load(latest)
    elif not args.eval_only:
        print("fresh init...", flush=True)
        trainer.init_state(next(batches(seed=1, batch=args.batch)))
        m, _ = evaluate(codec, trainer.state.params, held_out)
        print(f"held-out BEFORE: {json.dumps(m)}", flush=True)

    if not args.eval_only:
        t0 = time.time()
        start = int(trainer.state.step)
        while int(trainer.state.step) < args.steps:
            target = min(
                (int(trainer.state.step) // args.ckpt_every + 1)
                * args.ckpt_every,
                args.steps,
            )
            trainer.train(target, log_every=args.log_every)
            path = trainer.save(int(trainer.state.step))
            m, _ = evaluate(codec, trainer.state.params, held_out)
            print(
                f"[{int(trainer.state.step)}] ckpt {path} held-out:"
                f" {json.dumps(m)}",
                flush=True,
            )
        dt = time.time() - t0
        steps_done = int(trainer.state.step) - start
        print(f"trained {steps_done} steps in {dt:.0f}s "
              f"({dt / max(steps_done, 1) * 1e3:.0f} ms/step)", flush=True)

    metrics, recon = evaluate(codec, trainer.state.params, held_out)
    print(f"held-out FINAL: {json.dumps(metrics)}", flush=True)

    # listening artifacts
    from naturalspeech2_tpu.trainer import write_wav

    audio_dir = Path(__file__).resolve().parents[1] / "docs" / "audio"
    audio_dir.mkdir(parents=True, exist_ok=True)
    for i in range(3):
        write_wav(str(audio_dir / f"codec_orig_{i}.wav"), held_out[i], SR)
        write_wav(
            str(audio_dir / f"codec_recon_{i}.wav"),
            np.clip(recon[i], -1, 1), SR,
        )
    print(f"artifacts → {audio_dir}", flush=True)


if __name__ == "__main__":
    main()
