"""On-device F0 (pitch) estimation + coarse quantization.

TPU-native replacement for the reference's pyworld DIO+StoneMask CPU
excursion (`/root/reference/naturalspeech2_pytorch/naturalspeech2_pytorch.py:
132-175`): a batched, jittable normalized-autocorrelation estimator so the
raw-audio→pitch path stays on TPU (the one mandatory device→CPU→device
round-trip of the reference training step, SURVEY.md §3.2).

Method (ACF/YIN-family, numerically *useful* rather than bit-equal to DIO):
frame at the mel hop → FFT autocorrelation → normalized by frame energy →
peak over the candidate lag range [sr/f0_ceil, sr/f0_floor] → parabolic
interpolation (StoneMask-style refinement) → voicing threshold; unvoiced
frames emit 0, like pyworld.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def compute_pitch(
    audio: jax.Array,
    *,
    sample_rate: int,
    hop_length: int,
    f0_floor: float = 50.0,
    f0_ceil: float = 640.0,
    frame_length: Optional[int] = None,
    voicing_threshold: float = 0.3,
    median_smooth: bool = True,
) -> jax.Array:
    """audio ``[b, T]`` → f0 ``[b, frames]`` in Hz (0 = unvoiced).

    frames = T // hop + 1 (centered), matching the mel frontend so pitch and
    mel line up per frame like the reference pipeline (:1547-1566).
    """
    audio = audio.astype(jnp.float32)  # frontends stay f32 under bf16 amp
    b, t = audio.shape
    max_lag = int(np.ceil(sample_rate / f0_floor))
    min_lag = max(2, int(np.floor(sample_rate / f0_ceil)))
    if frame_length is None:
        frame_length = 1 << int(np.ceil(np.log2(2 * max_lag)))

    pad = frame_length // 2
    x = jnp.pad(audio, ((0, 0), (pad, pad)), mode="reflect")

    n_frames = t // hop_length + 1
    idx = (
        jnp.arange(n_frames)[:, None] * hop_length
        + jnp.arange(frame_length)[None, :]
    )
    frames = x[:, idx]  # [b, frames, frame_length]
    frames = frames - frames.mean(axis=-1, keepdims=True)

    # FFT autocorrelation (zero-padded to 2× to make it linear, not circular)
    n_fft = 2 * frame_length
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    acf = jnp.fft.irfft(spec * jnp.conj(spec), n=n_fft, axis=-1)[
        ..., : max_lag + 2
    ]  # [b, frames, lags]

    energy = jnp.maximum(acf[..., :1], 1e-8)
    nac = acf / energy  # normalized autocorrelation, nac[..., 0] = 1

    lags = jnp.arange(max_lag + 2)
    valid = (lags >= min_lag) & (lags <= max_lag)
    scores = jnp.where(valid[None, None, :], nac, -jnp.inf)
    best = jnp.argmax(scores, axis=-1)  # [b, frames]
    peak = jnp.take_along_axis(nac, best[..., None], -1)[..., 0]

    # parabolic interpolation around the peak for sub-sample lag
    lm1 = jnp.take_along_axis(nac, jnp.maximum(best - 1, 0)[..., None], -1)[..., 0]
    lp1 = jnp.take_along_axis(
        nac, jnp.minimum(best + 1, max_lag + 1)[..., None], -1
    )[..., 0]
    denom = lm1 - 2 * peak + lp1
    delta = jnp.where(
        jnp.abs(denom) > 1e-8, 0.5 * (lm1 - lp1) / denom, 0.0
    )
    delta = jnp.clip(delta, -0.5, 0.5)
    refined_lag = best.astype(jnp.float32) + delta

    f0 = sample_rate / jnp.maximum(refined_lag, 1.0)
    voiced = (peak > voicing_threshold) & (f0 >= f0_floor) & (f0 <= f0_ceil)
    f0 = jnp.where(voiced, f0, 0.0)

    if median_smooth:
        # 3-tap median removes isolated octave/half-octave glitches
        # (StoneMask-style cleanup); voicing decisions stay per-frame.
        left = jnp.pad(f0, ((0, 0), (1, 0)), mode="edge")[:, :-1]
        right = jnp.pad(f0, ((0, 0), (0, 1)), mode="edge")[:, 1:]
        stacked = jnp.stack([left, f0, right], axis=0)
        med = jnp.median(stacked, axis=0)
        f0 = jnp.where(f0 > 0, med, 0.0)
    return f0


def compute_pitch_nccf(
    audio: jax.Array,
    *,
    sample_rate: int,
    hop_length: int,
    f0_floor: float = 50.0,
    f0_ceil: float = 640.0,
    voicing_threshold: float = 0.3,
    transition_weight: float = 0.4,
) -> jax.Array:
    """Kaldi-style pitch tracker: NCCF candidates + Viterbi lag tracking.

    Second, independent backend mirroring the reference's torchaudio
    Kaldi-pitch path (`compute_pitch_pytorch`,
    `/root/reference/naturalspeech2_pytorch/naturalspeech2_pytorch.py:124-130`;
    algorithm of Ghahremani et al. 2014). Differs from `compute_pitch`
    (plain ACF) in two substantive ways:

    - **NCCF normalization**: each lag is normalized by √(E₀·E_τ) — the
      energy of *both* windows — instead of the frame energy, which keeps
      candidate scores comparable across lags in non-stationary frames;
    - **Viterbi smoothing**: the per-frame lag is chosen jointly over the
      whole utterance with an |log(τ/τ′)| transition penalty (`lax.scan`
      forward + reverse backtrack), suppressing the octave jumps a greedy
      per-frame argmax is prone to.

    audio ``[b, T]`` → f0 ``[b, T//hop + 1]`` in Hz (0 = unvoiced).
    """
    audio = audio.astype(jnp.float32)  # frontends stay f32 under bf16 amp
    b, t = audio.shape
    max_lag = int(np.ceil(sample_rate / f0_floor))
    min_lag = max(2, int(np.floor(sample_rate / f0_ceil)))
    n_lags = max_lag - min_lag + 1
    window = max(2 * min_lag, max_lag)  # correlation window per frame
    frame_length = window + max_lag

    pad = frame_length // 2
    x = jnp.pad(audio, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = t // hop_length + 1
    idx = (
        jnp.arange(n_frames)[:, None] * hop_length
        + jnp.arange(frame_length)[None, :]
    )
    frames = x[:, idx]  # [b, F, frame_length]
    frames = frames - frames.mean(axis=-1, keepdims=True)

    # numerator[τ] = Σ_{t<window} x[t]·x[t+τ]: cross-correlate the leading
    # window against the whole frame via FFT
    n_fft = 1 << int(np.ceil(np.log2(2 * frame_length)))
    head = frames * (jnp.arange(frame_length) < window)[None, None, :]
    spec_h = jnp.fft.rfft(head, n=n_fft, axis=-1)
    spec_f = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    corr = jnp.fft.irfft(jnp.conj(spec_h) * spec_f, n=n_fft, axis=-1)
    num = corr[..., min_lag : max_lag + 1]  # [b, F, n_lags]

    # per-lag energies via sliding window over cumulative x²
    csum = jnp.cumsum(
        jnp.pad(frames**2, ((0, 0), (0, 0), (1, 0))), axis=-1
    )  # [b, F, frame_length+1]
    e0 = csum[..., window] - csum[..., 0]  # [b, F]
    lag_idx = jnp.arange(min_lag, max_lag + 1)
    e_tau = (
        jnp.take(csum, lag_idx + window, axis=-1)
        - jnp.take(csum, lag_idx, axis=-1)
    )  # [b, F, n_lags]
    nccf = num / jnp.sqrt(jnp.maximum(e0[..., None] * e_tau, 1e-12))

    # Viterbi over lags: score maximization with log-lag transition penalty
    lags_f = lag_idx.astype(jnp.float32)
    trans = -transition_weight * jnp.abs(
        jnp.log(lags_f[:, None] / lags_f[None, :])
    )  # [n_lags, n_lags], 0 on the diagonal

    def viterbi_step(score, obs):
        # score [b, n_lags]; obs [b, n_lags]
        cand = score[:, :, None] + trans[None]  # [b, from, to]
        best_prev = jnp.argmax(cand, axis=1)  # [b, to]
        new = jnp.max(cand, axis=1) + obs
        return new, best_prev

    obs_seq = jnp.moveaxis(nccf, 1, 0)  # [F, b, n_lags]
    final, back = jax.lax.scan(viterbi_step, obs_seq[0], obs_seq[1:])

    last = jnp.argmax(final, axis=-1)  # [b]

    def backtrack_step(state, bp):
        # emits the INCOMING state: with reverse=True, ys[j] is frame j+1's
        # lag and the final carry is frame 0's — concatenate carry first
        # (emitting post-update and appending `last` instead shifts the
        # whole track one frame early and drops frame 0)
        return jnp.take_along_axis(bp, state[:, None], axis=1)[:, 0], state

    first, path_rev = jax.lax.scan(backtrack_step, last, back, reverse=True)
    path = jnp.concatenate([first[None], path_rev], axis=0)  # [F, b]
    path = jnp.moveaxis(path, 0, 1)  # [b, F]

    best_nccf = jnp.take_along_axis(nccf, path[..., None], axis=-1)[..., 0]

    # parabolic refinement around the tracked lag
    left = jnp.take_along_axis(
        nccf, jnp.maximum(path - 1, 0)[..., None], -1
    )[..., 0]
    right = jnp.take_along_axis(
        nccf, jnp.minimum(path + 1, n_lags - 1)[..., None], -1
    )[..., 0]
    denom = left - 2 * best_nccf + right
    delta = jnp.where(jnp.abs(denom) > 1e-8, 0.5 * (left - right) / denom, 0.0)
    delta = jnp.clip(delta, -0.5, 0.5)
    refined = path.astype(jnp.float32) + min_lag + delta

    f0 = sample_rate / jnp.maximum(refined, 1.0)
    voiced = (
        (best_nccf > voicing_threshold) & (f0 >= f0_floor) & (f0 <= f0_ceil)
    )
    return jnp.where(voiced, f0, 0.0)


def compute_pitch_pyworld(
    wav,
    sample_rate: int,
    hop_length: int,
    pitch_fmax: float = 640.0,
    strict: bool = False,
):
    """Host-callback parity path: pyworld DIO+StoneMask when the package is
    installed (reference `compute_pitch_pyworld`, :132-160), else the
    on-device estimator. Returns ``[b, frames]`` numpy/jax array.

    Without pyworld the fallback is the on-device ACF estimator — i.e. this
    function is then NOT a pyworld oracle. To keep parity claims honest, the
    fallback emits a loud ``UserWarning``, and ``strict=True`` raises instead
    so callers that genuinely need pyworld numbers cannot silently compare the
    ACF estimator against itself.
    """
    try:
        import numpy as _np
        import pyworld as pw  # not installed in the TPU image; optional
    except ImportError:
        msg = (
            "pyworld is not installed: compute_pitch_pyworld is falling back "
            "to the on-device ACF estimator. This is NOT a pyworld parity "
            "reference; pass strict=False knowingly or install pyworld."
        )
        if strict:
            raise RuntimeError(msg) from None
        import warnings

        warnings.warn(msg, UserWarning, stacklevel=2)
        return compute_pitch(
            jnp.asarray(wav), sample_rate=sample_rate, hop_length=hop_length,
            f0_ceil=pitch_fmax,
        )

    wav_np = _np.asarray(wav, dtype=_np.double)
    outs = []
    for sample in wav_np:
        f0, t = pw.dio(
            sample,
            fs=sample_rate,
            f0_ceil=pitch_fmax,
            frame_period=1000 * hop_length / sample_rate,
        )
        outs.append(pw.stonemask(sample, f0, t, sample_rate))
    return _np.stack(outs)


def f0_to_coarse(
    f0: jax.Array,
    f0_bin: int = 256,
    f0_max: float = 1100.0,
    f0_min: float = 50.0,
) -> jax.Array:
    """Mel-scale quantization of F0 into ``[1, f0_bin-1]`` integer bins
    (reference `f0_to_coarse`, :164-175; 0 Hz → bin 1)."""
    f0_mel_max = 1127.0 * np.log(1 + f0_max / 700.0)
    f0_mel_min = 1127.0 * np.log(1 + f0_min / 700.0)

    f0_mel = 1127.0 * jnp.log(1 + f0 / 700.0)
    scaled = (f0_mel - f0_mel_min) * (f0_bin - 2) / (f0_mel_max - f0_mel_min) + 1
    f0_mel = jnp.where(f0_mel > 0, scaled, f0_mel)
    f0_mel = jnp.clip(f0_mel, 1.0, float(f0_bin - 1))
    return (f0_mel + 0.5).astype(jnp.int32)
