"""Jittable mel-spectrogram frontend (JAX FFT).

TPU-native replacement for the reference's torchaudio-based `AudioToMel`
(`/root/reference/naturalspeech2_pytorch/naturalspeech2_pytorch.py:181-224`,
which rebuilds `T.Spectrogram`/`T.MelScale`/`T.AmplitudeToDB` on every call):
centered hann STFT → power spectrogram → HTK mel filterbank → dB. Everything
is a pure function of static config, so XLA folds the window/filterbank into
constants once.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def hz_to_mel_htk(f: np.ndarray) -> np.ndarray:
    return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)


def mel_to_hz_htk(m: np.ndarray) -> np.ndarray:
    return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)


@functools.lru_cache(maxsize=8)
def mel_filterbank(
    n_freqs: int,
    n_mels: int,
    sample_rate: int,
    f_min: float = 0.0,
    f_max: Optional[float] = None,
) -> np.ndarray:
    """Triangular HTK mel filterbank ``[n_freqs, n_mels]`` (torchaudio
    `MelScale` semantics: htk scale, no norm)."""
    f_max = f_max if f_max is not None else sample_rate / 2
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)
    m_pts = np.linspace(hz_to_mel_htk(f_min), hz_to_mel_htk(f_max), n_mels + 2)
    f_pts = mel_to_hz_htk(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]  # [n_mels + 1]
    slopes = f_pts[None, :] - all_freqs[:, None]  # [n_freqs, n_mels + 2]
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


def stft(
    audio: jax.Array,
    n_fft: int = 1024,
    hop_length: int = 160,
    win_length: int = 640,
    center: bool = True,
) -> jax.Array:
    """Complex STFT ``[b, n_fft//2+1, frames]`` with a hann window,
    centered with reflect padding (torchaudio `Spectrogram` defaults).

    Always computes in f32: the signal frontend is a feature extractor, so
    bf16 training (amp) must not degrade it — and RFFT rejects bf16 anyway.
    """
    audio = audio.astype(jnp.float32)
    if center:
        pad = n_fft // 2
        audio = jnp.pad(audio, ((0, 0), (pad, pad)), mode="reflect")

    b, t = audio.shape
    n_frames = 1 + (t - n_fft) // hop_length
    # frame via strided gather: [b, frames, n_fft]
    idx = (
        jnp.arange(n_frames)[:, None] * hop_length + jnp.arange(n_fft)[None, :]
    )
    frames = audio[:, idx]

    window = jnp.asarray(np.hanning(win_length + 1)[:-1].astype(np.float32))
    pad_w = (n_fft - win_length) // 2
    window = jnp.pad(window, (pad_w, n_fft - win_length - pad_w))

    spec = jnp.fft.rfft(frames * window, n=n_fft, axis=-1)
    return spec.transpose(0, 2, 1)  # [b, freqs, frames]


def audio_to_mel(
    audio: jax.Array,
    *,
    n_mels: int = 100,
    sample_rate: int = 24000,
    f_max: float = 8000.0,
    n_fft: int = 1024,
    win_length: int = 640,
    hop_length: int = 160,
    log: bool = True,
) -> jax.Array:
    """audio ``[b, T]`` → log-mel ``[b, n_mels, frames]`` (reference
    `AudioToMel.forward` semantics, defaults :183-191)."""
    spec = stft(audio, n_fft=n_fft, hop_length=hop_length, win_length=win_length)
    power = jnp.abs(spec) ** 2  # [b, freqs, frames]

    fb = jnp.asarray(
        mel_filterbank(n_fft // 2 + 1, n_mels, sample_rate, f_max=f_max)
    )
    mel = jnp.einsum("bft,fm->bmt", power, fb)

    if log:
        # torchaudio AmplitudeToDB (power): 10·log10(clamp(x, 1e-10))
        mel = 10.0 * jnp.log10(jnp.clip(mel, min=1e-10))
    return mel


class AudioToMel:
    """Callable-config wrapper matching the reference `AudioToMel` module API
    (ctor kwargs :183-191, ``__call__(audio) → [b, n_mels, frames]``)."""

    def __init__(
        self,
        *,
        n_mels: int = 100,
        sampling_rate: int = 24000,
        f_max: float = 8000.0,
        n_fft: int = 1024,
        win_length: int = 640,
        hop_length: int = 160,
        log: bool = True,
    ):
        self.n_mels = n_mels
        self.sampling_rate = sampling_rate
        self.f_max = f_max
        self.n_fft = n_fft
        self.win_length = win_length
        self.hop_length = hop_length
        self.log = log

    def __call__(self, audio: jax.Array) -> jax.Array:
        return audio_to_mel(
            audio,
            n_mels=self.n_mels,
            sample_rate=self.sampling_rate,
            f_max=self.f_max,
            n_fft=self.n_fft,
            win_length=self.win_length,
            hop_length=self.hop_length,
            log=self.log,
        )
