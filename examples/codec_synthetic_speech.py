"""Multi-thousand-step adversarial codec training on synthetic speech.

The reference wraps a *pretrained* Encodec
(`/root/reference/naturalspeech2_pytorch/naturalspeech2_pytorch.py:23`); the
TPU build trains its own codec (`codec_trainer.py`, SoundStream/Encodec
recipe: multi-res STFT + L1 + commitment, then hinge-GAN + feature matching
against multi-scale STFT discriminators). No speech dataset ships in this
image, so the data here is a synthetic speech proxy — glottal-pulse source
with a wandering F0 contour, two random formant resonators, syllable-rate
amplitude envelopes and unvoiced noise segments — which exercises exactly
the structures (harmonics, formant peaks, transients) a speech codec has to
model.

Usage: python examples/codec_synthetic_speech.py [num_steps] [warmup]
Prints train-curve milestones and held-out STFT/spectrogram metrics
before/after; numbers recorded in docs/codec_training.md.
"""

from __future__ import annotations

import functools
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
T = 9600  # 0.4 s, 30 latent frames at hop 320
BATCH = 8


def _resonator(x: np.ndarray, freq: float, bw: float) -> np.ndarray:
    """2nd-order IIR resonance (formant), scipy lfilter (C-speed — the
    generator runs inline with training)."""
    from scipy.signal import lfilter

    r = np.exp(-np.pi * bw / SR)
    theta = 2 * np.pi * freq / SR
    gain = (1 - r) * np.sqrt(1 - 2 * r * np.cos(2 * theta) + r * r)
    return lfilter([gain], [1.0, -2 * r * np.cos(theta), r * r], x).astype(
        np.float32
    )


def synth_utterance(rng: np.random.RandomState) -> np.ndarray:
    t = np.arange(T) / SR
    # wandering F0 (90-280 Hz)
    ctrl = rng.uniform(90, 280, 6)
    f0 = np.interp(np.linspace(0, 5, T), np.arange(6), ctrl)
    phase = 2 * np.pi * np.cumsum(f0) / SR
    source = ((phase / (2 * np.pi)) % 1.0) * 2 - 1  # sawtooth glottal proxy
    # unvoiced segments: syllable-rate gate swaps source for noise
    rate = rng.uniform(2.0, 5.0)
    gate = np.sin(2 * np.pi * rate * t + rng.uniform(0, 2 * np.pi))
    noise = rng.randn(T) * 0.5
    voiced = gate > -0.3
    x = np.where(voiced, source, noise)
    # two random formants
    x = _resonator(x, rng.uniform(300, 800), 80.0)
    x = x + 0.6 * _resonator(x, rng.uniform(900, 2200), 120.0)
    # syllable envelope + fade
    env = np.abs(np.sin(2 * np.pi * rate * t)) ** 0.5
    x = x * env
    return (0.7 * x / (np.abs(x).max() + 1e-6)).astype(np.float32)


def batches(seed: int):
    rng = np.random.RandomState(seed)
    while True:
        yield np.stack([synth_utterance(rng) for _ in range(BATCH)])


@functools.partial(jax.jit, static_argnums=0)
def _held_out(codec, params, audio):
    latents, _, _ = codec.apply({"params": params}, audio, return_encoded=True)
    recon = codec.apply({"params": params}, latents, method=codec.decode)
    recon = recon[:, : audio.shape[1]]
    stft = multi_resolution_stft_loss(recon, audio)
    l1 = jnp.mean(jnp.abs(recon - audio))
    return stft, l1


def held_out_metrics(codec, params, audio: np.ndarray):
    stft, l1 = _held_out(codec, params, jnp.asarray(audio))
    return float(stft), float(l1)


def main():
    num_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    warmup = int(sys.argv[2]) if len(sys.argv) > 2 else 800

    codec = SoundStream(
        codebook_dim=64, channels=24, num_quantizers=4, codebook_size=256,
        use_pallas_rvq=jax.default_backend() == "tpu",
    )
    trainer = CodecTrainer(
        codec,
        batches=batches(seed=0),
        adversarial_weight=1.0,
        feature_weight=2.0,
        adversarial_warmup=warmup,
        disc_channels=24,
        results_folder="/tmp/codec_synth_results",
    )

    eval_rng = np.random.RandomState(10_000)
    held_out = np.stack([synth_utterance(eval_rng) for _ in range(16)])

    print("init...", flush=True)
    state = trainer.init_state(next(batches(seed=1)))
    print("measuring held-out baseline...", flush=True)
    before = held_out_metrics(codec, state.params, held_out)
    print(f"held-out before: stft {before[0]:.3f}, wav L1 {before[1]:.4f}")

    t0 = time.time()
    state = trainer.train(num_steps, log_every=max(200, num_steps // 20))
    print(f"trained {num_steps} steps in {time.time() - t0:.0f}s")

    after = held_out_metrics(codec, state.params, held_out)
    print(f"held-out after:  stft {after[0]:.3f}, wav L1 {after[1]:.4f}")
    print(trainer.save("synthetic-speech"))


if __name__ == "__main__":
    main()
