"""Paired (token sequence, waveform) synthetic TTS data.

Extends the multi-speaker synthetic speech generator
(`codec_speech_production.py`) with a PLANNED syllable structure: the
utterance is first laid out as a sequence of (onset consonant class,
vowel) syllables, the plan is rendered to audio, and the plan itself is
emitted as a token string — real text↔audio supervision for the full
conditional NaturalSpeech2 pipeline (phoneme encoder → aligner →
duration/pitch → diffusion), with no external dataset.

Token vocabulary (size 26):
  0                 = pad/silence
  1 + c*6 + v       = syllable with onset class c ∈ {0:none, 1:stop,
                      2:fricative, 3:glide} and vowel v ∈ 0..5 (the
                      6-vowel GenAm inventory of the speech generator)
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

from codec_speech_production import (  # noqa: E402
    SR,
    T,
    _glottal_source,
    _resonator,
    synth_speaker,
)

N_CONS, N_VOWELS = 4, 6
VOCAB = 1 + N_CONS * N_VOWELS + 1  # pad + syllables (+1 spare)


def plan_utterance(rng: np.random.RandomState, spk: dict,
                   n_samples: int = T):
    """Lay out syllables for an `n_samples`-sample utterance: [(cons,
    vowel, start, length)], totalling exactly `n_samples` samples."""
    syl_len = int(SR / spk["rate"])
    plan = []
    pos = 0
    while pos < n_samples - 400:
        n = min(int(syl_len * rng.uniform(0.7, 1.3)), n_samples - pos)
        cons = rng.choice(N_CONS, p=[0.3, 0.3, 0.25, 0.15])
        vowel = rng.randint(N_VOWELS)
        plan.append((int(cons), int(vowel), pos, n))
        pos += n
    return plan


def render_plan(plan, spk: dict, rng: np.random.RandomState,
                n_samples: int = T) -> np.ndarray:
    """Render a syllable plan to audio (same acoustics as
    codec_speech_production.synth_utterance, but structure-driven)."""
    out = np.zeros(n_samples)
    t_all = np.arange(n_samples) / SR
    f0_track = spk["f0_base"] * (
        1.0
        + spk["f0_range"] * np.sin(
            2 * np.pi * rng.uniform(0.8, 2.5) * t_all + rng.uniform(0, 6.28)
        )
    ) * (1.0 - 0.15 * t_all / t_all[-1])
    source_all = _glottal_source(f0_track, rng)

    for cons, vowel, pos, n in plan:
        seg = np.zeros(n)
        i = 0
        if cons == 1:  # stop
            closure = min(int(0.020 * SR), n // 3)
            burst = min(int(0.012 * SR), n // 4)
            b = rng.randn(burst)
            b = _resonator(b, rng.uniform(1500, 4000) * spk["vtl"], 600.0)
            seg[closure:closure + burst] = 6.0 * b
            i = closure + burst
        elif cons == 2:  # fricative
            fr = min(int(rng.uniform(0.03, 0.07) * SR), n // 2)
            f = rng.randn(fr)
            f = _resonator(f, rng.uniform(3500, 6500) * spk["vtl"], 1500.0)
            seg[:fr] = 3.0 * f
            i = int(fr * 0.8)
        elif cons == 3:  # glide
            i = int(0.015 * SR)

        vow = spk["vowels"][vowel] * spk["vtl"]
        v_src = source_all[pos + i : pos + n].copy()
        v_src += spk["breath"] * rng.randn(len(v_src)) * 20.0
        v = (
            _resonator(v_src, vow[0], 90.0)
            + 0.63 * _resonator(v_src, vow[1], 110.0)
            + 0.25 * _resonator(v_src, vow[2], 170.0)
        )
        env = np.minimum(np.arange(len(v)) / (0.012 * SR), 1.0)
        env *= np.linspace(1.0, rng.uniform(0.25, 0.7), len(v)) ** 1.5
        seg[i:] += v * env
        out[pos : pos + n] += seg

    out *= 0.7 / (np.abs(out).max() + 1e-6)
    return out.astype(np.float32)


def plan_tokens(plan) -> list:
    return [1 + c * N_VOWELS + v for c, v, _, _ in plan]


def _max_tokens_for(n_samples: int) -> int:
    """Upper bound on syllables per utterance: fastest speaker (6 syl/s)
    with the shortest length jitter (×0.7). Truncating tokens while the
    audio keeps the extra syllables would silently corrupt the text↔audio
    pairing, so the pad width must cover the worst case."""
    return int(np.ceil(n_samples / SR * 6.0 / 0.7)) + 1


def tts_batches(seed: int, batch: int, max_tokens: int | None = None,
                seconds: float | None = None):
    """Yield dict batches for the conditional Trainer: raw audio, token
    text (padded with -1 like the reference pad convention), text lengths,
    and a same-speaker PROMPT utterance (timbre reference, always 0.4 s —
    it carries speaker identity + rate, not content). `seconds` sets the
    target-utterance length (default 0.4 s = 30 latent frames; longer
    utterances carry more syllables, which conditions the unsupervised
    aligner far better than 2-3-token snippets)."""
    n_samples = T if seconds is None else int(seconds * SR)
    if max_tokens is None:
        max_tokens = _max_tokens_for(n_samples)
    rng = np.random.RandomState(seed)
    while True:
        audio, prompts, texts, lens = [], [], [], []
        for _ in range(batch):
            spk = synth_speaker(rng)
            plan = plan_utterance(rng, spk, n_samples)
            audio.append(render_plan(plan, spk, rng, n_samples))
            prompts.append(
                render_plan(plan_utterance(rng, spk), spk, rng)
            )
            toks = plan_tokens(plan)[:max_tokens]
            lens.append(len(toks))
            texts.append(toks + [-1] * (max_tokens - len(toks)))
        yield {
            "audio": np.stack(audio),
            "prompt": np.stack(prompts),
            "text": np.asarray(texts, np.int32),
            "text_lens": np.asarray(lens, np.int32),
        }


def tts_eval_batch(seed: int, batch: int, max_tokens: int | None = None,
                   hop: int = 320, seconds: float | None = None) -> dict:
    """One batch WITH ground-truth per-token durations (in hop-length
    frames, zero-padded to ``max_tokens``) — the quantitative-evaluation
    side of the capstone: duration MAE needs the plan the training
    batches discard."""
    n_samples = T if seconds is None else int(seconds * SR)
    if max_tokens is None:
        max_tokens = _max_tokens_for(n_samples)
    rng = np.random.RandomState(seed)
    audio, prompts, texts, lens, durs = [], [], [], [], []
    for _ in range(batch):
        spk = synth_speaker(rng)
        plan = plan_utterance(rng, spk, n_samples)
        audio.append(render_plan(plan, spk, rng, n_samples))
        prompts.append(render_plan(plan_utterance(rng, spk), spk, rng))
        toks = plan_tokens(plan)[:max_tokens]
        lens.append(len(toks))
        texts.append(toks + [-1] * (max_tokens - len(toks)))
        d = [n / hop for (_, _, _, n) in plan][:max_tokens]
        durs.append(d + [0.0] * (max_tokens - len(d)))
    return {
        "audio": np.stack(audio),
        "prompt": np.stack(prompts),
        "text": np.asarray(texts, np.int32),
        "text_lens": np.asarray(lens, np.int32),
        "gt_durations": np.asarray(durs, np.float32),
    }


def prefetched(gen, depth: int = 32):
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    threading.Thread(
        target=lambda: [q.put(x) for x in gen], daemon=True
    ).start()
    while True:
        yield q.get()
