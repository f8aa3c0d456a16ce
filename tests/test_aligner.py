"""Aligner stack tests: MAS vs oracle DP, CTC forward-sum, mel frontend,
pitch estimator, full Aligner module shapes (reference aligner.py smoke
block semantics: b, t_x=35, t_y=200)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from naturalspeech2_tpu.models.aligner import Aligner, BinLoss, ForwardSumLoss
from naturalspeech2_tpu.ops.ctc import forward_sum_loss
from naturalspeech2_tpu.ops.mas import maximum_path, maximum_path_numpy
from naturalspeech2_tpu.ops.mel import audio_to_mel
from naturalspeech2_tpu.ops.pitch import compute_pitch, f0_to_coarse

KEY = jax.random.PRNGKey(0)


# ------------------------------ MAS ---------------------------------- #


def _rand_mas_case(b=3, t_x=7, t_y=15, seed=0):
    rng = np.random.RandomState(seed)
    value = rng.rand(b, t_x, t_y).astype(np.float32)
    tx = rng.randint(2, t_x + 1, size=b)
    ty = rng.randint(t_x, t_y + 1, size=b)  # need t_y >= t_x for a valid path
    mask = np.zeros((b, t_x, t_y), np.float32)
    for i in range(b):
        mask[i, : tx[i], : ty[i]] = 1
    return value, mask


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_mas_matches_reference_dp(seed):
    value, mask = _rand_mas_case(seed=seed)
    ours = np.asarray(maximum_path(jnp.asarray(value), jnp.asarray(mask)))
    oracle = maximum_path_numpy(value, mask)
    np.testing.assert_array_equal(ours, oracle)


def test_mas_path_properties():
    value, mask = _rand_mas_case(b=2, t_x=5, t_y=12, seed=7)
    path = np.asarray(maximum_path(jnp.asarray(value), jnp.asarray(mask)))
    for i in range(2):
        tx = int(mask[i, :, 0].sum())
        ty = int(mask[i, 0, :].sum())
        # each valid frame assigned exactly one phoneme
        np.testing.assert_array_equal(path[i, :, :ty].sum(axis=0), 1)
        # durations sum to mel length, every phoneme covered
        durs = path[i].sum(axis=-1)
        assert durs[:tx].sum() == ty
        assert (durs[:tx] >= 1).all()
        # monotonic: phoneme index is non-decreasing over frames
        idx = path[i, :, :ty].argmax(axis=0)
        assert (np.diff(idx) >= 0).all()


def test_mas_jits():
    value, mask = _rand_mas_case()
    f = jax.jit(maximum_path)
    np.testing.assert_array_equal(
        np.asarray(f(jnp.asarray(value), jnp.asarray(mask))),
        maximum_path_numpy(value, mask),
    )


# ------------------------------ CTC ---------------------------------- #


def test_forward_sum_loss_prefers_aligned():
    b, t_q, t_k = 2, 20, 5
    key_lens = jnp.array([5, 4])
    query_lens = jnp.array([20, 16])
    # aligned: strong diagonal-ish attention
    rng = np.random.RandomState(0)
    aligned = np.full((b, 1, t_q, t_k), -5.0, np.float32)
    for bi in range(b):
        for q in range(int(query_lens[bi])):
            k = min(int(key_lens[bi]) - 1, q * int(key_lens[bi]) // int(query_lens[bi]))
            aligned[bi, 0, q, k] = 5.0
    noise = rng.randn(b, 1, t_q, t_k).astype(np.float32)

    l_aligned = float(forward_sum_loss(jnp.asarray(aligned), key_lens, query_lens))
    l_noise = float(forward_sum_loss(jnp.asarray(noise), key_lens, query_lens))
    assert np.isfinite(l_aligned) and np.isfinite(l_noise)
    assert l_aligned < l_noise


def test_forward_sum_loss_grad():
    attn = jnp.asarray(np.random.RandomState(1).randn(2, 1, 12, 4), jnp.float32)
    key_lens = jnp.array([4, 3])
    query_lens = jnp.array([12, 10])
    g = jax.grad(lambda a: forward_sum_loss(a, key_lens, query_lens))(attn)
    assert np.isfinite(np.asarray(g)).all()
    # padding frames of sample 1 (>=10) get no gradient
    assert np.abs(np.asarray(g)[1, 0, 10:]).max() == 0


# ------------------------- mel + pitch -------------------------------- #


def test_audio_to_mel_shapes():
    audio = jax.random.uniform(KEY, (2, 3200), minval=-1, maxval=1)
    mel = audio_to_mel(audio, n_mels=80, sample_rate=24000, hop_length=160)
    assert mel.shape == (2, 80, 3200 // 160 + 1)
    assert np.isfinite(np.asarray(mel)).all()


def test_pitch_detects_sine():
    sr, hop = 24000, 160
    t = np.arange(sr) / sr  # 1 second
    for freq in [110.0, 220.0, 440.0]:
        audio = jnp.asarray(np.sin(2 * np.pi * freq * t)[None, :], jnp.float32)
        f0 = np.asarray(compute_pitch(audio, sample_rate=sr, hop_length=hop))
        assert f0.shape == (1, sr // hop + 1)
        voiced = f0[f0 > 0]
        assert len(voiced) > 0.8 * f0.shape[1]
        assert abs(np.median(voiced) - freq) / freq < 0.02, (freq, np.median(voiced))


def test_pitch_silence_unvoiced():
    audio = jnp.zeros((1, 24000), jnp.float32)
    f0 = np.asarray(compute_pitch(audio, sample_rate=24000, hop_length=160))
    assert (f0 == 0).all()


def test_f0_to_coarse_range():
    f0 = jnp.asarray([[0.0, 50.0, 100.0, 440.0, 1100.0, 2000.0]])
    coarse = np.asarray(f0_to_coarse(f0))
    assert coarse.min() >= 1 and coarse.max() <= 255
    assert coarse[0, 1] < coarse[0, 2] < coarse[0, 3] < coarse[0, 4]


# --------------------------- full module ------------------------------ #


@pytest.mark.slow
def test_aligner_module_end_to_end():
    b, t_x, t_y, d_mel, d_h = 2, 8, 30, 16, 32
    phon = jax.random.normal(KEY, (b, t_x, d_h))
    mel = jax.random.normal(jax.random.PRNGKey(1), (b, d_mel, t_y))
    x_mask = jnp.arange(t_x)[None, :] < jnp.array([8, 6])[:, None]
    y_mask = jnp.arange(t_y)[None, :] < jnp.array([30, 25])[:, None]

    aligner = Aligner(dim_in=d_mel, dim_hidden=d_h, attn_channels=16)
    params = aligner.init(KEY, phon, x_mask, mel, y_mask)
    hard, soft, logp, path = aligner.apply(params, phon, x_mask, mel, y_mask)

    assert hard.shape == (b, t_x)
    assert soft.shape == (b, t_x, t_y)
    assert logp.shape == (b, 1, t_y, t_x)
    assert path.shape == (b, t_x, t_y)
    assert int(hard[0].sum()) == 30
    assert int(hard[1].sum()) == 25
    assert int(hard[1, 6:].sum()) == 0  # masked phonemes get no frames

    # losses on top
    fsl = ForwardSumLoss()
    loss = fsl.apply({}, logp, jnp.array([8, 6]), jnp.array([30, 25]))
    assert np.isfinite(float(loss))
    bl = BinLoss()
    bloss = bl.apply({}, path, logp, jnp.array([8, 6]))
    assert np.isfinite(float(bloss))
    assert float(bloss) >= 0


@pytest.mark.slow
def test_pitch_noisy_sine():
    """ACF estimator with median smoothing holds up on a noisy tone."""
    sr, hop, freq = 24000, 160, 220.0
    rng = np.random.RandomState(0)
    t = np.arange(sr) / sr
    clean = np.sin(2 * np.pi * freq * t)
    noisy = clean + 0.3 * rng.randn(sr)
    f0 = np.asarray(compute_pitch(
        jnp.asarray(noisy[None, :], jnp.float32), sample_rate=sr, hop_length=hop
    ))
    voiced = f0[f0 > 0]
    assert len(voiced) > 0.6 * f0.shape[1]
    assert abs(np.median(voiced) - freq) / freq < 0.03


@pytest.mark.slow
def test_pitch_vibrato_tracks():
    """Slow vibrato (±5%) is tracked frame to frame."""
    sr, hop = 24000, 160
    t = np.arange(sr) / sr
    inst_freq = 220.0 * (1 + 0.05 * np.sin(2 * np.pi * 4.0 * t))
    phase = 2 * np.pi * np.cumsum(inst_freq) / sr
    audio = jnp.asarray(np.sin(phase)[None, :], jnp.float32)
    f0 = np.asarray(compute_pitch(audio, sample_rate=sr, hop_length=hop))
    voiced = f0[0][f0[0] > 0]
    assert voiced.min() > 200 and voiced.max() < 240
    assert voiced.max() - voiced.min() > 10  # actually follows the vibrato


# --------------------- second backend: NCCF + Viterbi ------------------ #


def test_nccf_detects_sine():
    from naturalspeech2_tpu.ops.pitch import compute_pitch_nccf

    sr, hop = 24000, 160
    t = np.arange(sr) / sr
    for freq in [110.0, 220.0, 440.0]:
        audio = jnp.asarray(np.sin(2 * np.pi * freq * t)[None, :], jnp.float32)
        f0 = np.asarray(compute_pitch_nccf(audio, sample_rate=sr, hop_length=hop))
        assert f0.shape == (1, sr // hop + 1)
        voiced = f0[f0 > 0]
        assert len(voiced) > 0.8 * f0.shape[1]
        assert abs(np.median(voiced) - freq) / freq < 0.02, (freq, np.median(voiced))


def test_nccf_step_frequency_alignment():
    """A frequency step must appear at the right frame — the Viterbi
    backtrack used to emit the pre-update carry, shifting the whole track
    one frame early and dropping frame 0."""
    from naturalspeech2_tpu.ops.pitch import compute_pitch_nccf

    sr, hop = 24000, 160
    t = np.arange(sr) / sr
    # non-octave step (150 -> 210 Hz): the old-lag correlation collapses so
    # the tracker must actually move (an octave step would stay ambiguous)
    freq = np.where(t < 0.5, 150.0, 210.0)
    phase = 2 * np.pi * np.cumsum(freq) / sr
    audio = jnp.asarray(np.sin(phase)[None, :], jnp.float32)
    f0 = np.asarray(compute_pitch_nccf(audio, sample_rate=sr, hop_length=hop))[0]
    mid = len(f0) // 2
    first = f0[5 : mid - 5]
    second = f0[mid + 5 : -5]
    first, second = first[first > 0], second[second > 0]
    assert abs(np.median(first) - 150.0) / 150.0 < 0.03, np.median(first)
    assert abs(np.median(second) - 210.0) / 210.0 < 0.03, np.median(second)
    # frame 0 is decoded (not dropped/duplicated from its neighbour's lag)
    assert f0[0] == 0 or abs(f0[0] - 150.0) / 150.0 < 0.1, f0[0]


def test_nccf_silence_unvoiced():
    from naturalspeech2_tpu.ops.pitch import compute_pitch_nccf

    f0 = np.asarray(compute_pitch_nccf(
        jnp.zeros((1, 24000), jnp.float32), sample_rate=24000, hop_length=160
    ))
    assert (f0 == 0).all()


@pytest.mark.slow
def test_nccf_noisy_sine():
    """Viterbi lag tracking holds up on a noisy tone."""
    from naturalspeech2_tpu.ops.pitch import compute_pitch_nccf

    sr, hop, freq = 24000, 160, 220.0
    rng = np.random.RandomState(0)
    t = np.arange(sr) / sr
    noisy = np.sin(2 * np.pi * freq * t) + 0.3 * rng.randn(sr)
    f0 = np.asarray(compute_pitch_nccf(
        jnp.asarray(noisy[None, :], jnp.float32), sample_rate=sr, hop_length=hop
    ))
    voiced = f0[f0 > 0]
    assert len(voiced) > 0.6 * f0.shape[1]
    assert abs(np.median(voiced) - freq) / freq < 0.03


@pytest.mark.slow
def test_nccf_vibrato_tracks():
    from naturalspeech2_tpu.ops.pitch import compute_pitch_nccf

    sr, hop = 24000, 160
    t = np.arange(sr) / sr
    inst_freq = 220.0 * (1 + 0.05 * np.sin(2 * np.pi * 4.0 * t))
    phase = 2 * np.pi * np.cumsum(inst_freq) / sr
    audio = jnp.asarray(np.sin(phase)[None, :], jnp.float32)
    f0 = np.asarray(compute_pitch_nccf(audio, sample_rate=sr, hop_length=hop))
    voiced = f0[0][f0[0] > 0]
    assert voiced.min() > 200 and voiced.max() < 240
    assert voiced.max() - voiced.min() > 10


@pytest.mark.slow
def test_nccf_viterbi_suppresses_octave_jumps():
    """A tone whose 2nd harmonic dominates briefly trips a greedy per-frame
    argmax into octave errors; the Viterbi transition penalty should keep
    the track continuous."""
    from naturalspeech2_tpu.ops.pitch import compute_pitch_nccf

    sr, hop, f = 24000, 160, 150.0
    t = np.arange(sr) / sr
    amp2 = 0.2 + 0.75 * (np.sin(2 * np.pi * 2.0 * t) > 0)  # harmonic bursts
    audio = np.sin(2 * np.pi * f * t) + amp2 * np.sin(2 * np.pi * 2 * f * t)
    f0 = np.asarray(compute_pitch_nccf(
        jnp.asarray(audio[None, :], jnp.float32), sample_rate=sr, hop_length=hop
    ))
    voiced = f0[0][f0[0] > 0]
    # no frame should sit at the octave (300 Hz)
    octave_frames = np.sum(np.abs(voiced - 2 * f) / (2 * f) < 0.05)
    assert octave_frames <= 0.05 * len(voiced), octave_frames
    assert abs(np.median(voiced) - f) / f < 0.03


def test_backends_are_independent():
    """The two backends are distinct estimators, not aliases: they agree on
    the pitch of a clean tone but produce different raw tracks."""
    from naturalspeech2_tpu.ops.pitch import compute_pitch_nccf

    sr, hop, freq = 24000, 160, 220.0
    rng = np.random.RandomState(1)
    t = np.arange(sr) / sr
    noisy = np.sin(2 * np.pi * freq * t) + 0.2 * rng.randn(sr)
    audio = jnp.asarray(noisy[None, :], jnp.float32)
    a = np.asarray(compute_pitch(audio, sample_rate=sr, hop_length=hop))
    b = np.asarray(compute_pitch_nccf(audio, sample_rate=sr, hop_length=hop))
    assert abs(np.median(a[a > 0]) - np.median(b[b > 0])) / freq < 0.03
    assert not np.allclose(a, b)  # genuinely different estimators
