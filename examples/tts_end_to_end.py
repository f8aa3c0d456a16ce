"""END-TO-END text→speech on synthetic paired data (VERDICT r2 item 1).

The reference pipeline is text → conditional latent diffusion → pretrained
Encodec decode. This demo closes the same loop with zero external data:

1. load the adversarially-trained codec checkpoint
   (`codec_speech_production.py` — docs/codec_training.md);
2. train the FULL conditional NaturalSpeech2 (phoneme encoder, speech
   prompt encoder, aligner, duration/pitch predictors, diffusion denoiser)
   on paired (syllable tokens, waveform, same-speaker prompt) data from
   `synthetic_tts_data.py`, with the codec frozen (stop-gradient latents,
   reference semantics :1605-1611);
3. sample: token string + unseen prompt → CFG DDIM → codec decode → .wav
   artifacts in docs/audio/ whose syllable/vowel pattern follows the text.

Usage:
  python examples/tts_end_to_end.py --codec results_codec_speech/codec-N.ckpt
      [--steps 8000] [--batch 16]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import flax
import jax
import jax.numpy as jnp
import numpy as np

from naturalspeech2_tpu import Model, NaturalSpeech2, SoundStream, sample
from naturalspeech2_tpu.trainer import Trainer, write_wav
from synthetic_tts_data import VOCAB, prefetched, tts_batches  # noqa: E402


def build_ns2(tiny: bool = False) -> NaturalSpeech2:
    codec = SoundStream(use_pallas_rvq=jax.default_backend() == "tpu")
    on_tpu = jax.default_backend() == "tpu"
    model = Model(
        dim=128, depth=1 if tiny else 6, heads=8, dim_head=64,
        dim_prompt=128, num_latents_m=16, resampler_depth=1 if tiny else 2,
        condition_on_prompt=True, cond_drop_prob=0.25,
        use_flash_attn=on_tpu, use_fused_wavenet=on_tpu,
        wavenet_layers=2 if tiny else 8, wavenet_stacks=1 if tiny else 4,
        scan_layers=not tiny,
    )
    d = 1 if tiny else None
    # conditioning stack at dim 128 (reference uses 512; the synthetic
    # 26-token language needs far less capacity and trains ~10× faster)
    return NaturalSpeech2(
        model=model,
        codec=codec,
        timesteps=1000,
        # deliberate divergence from the reference's hop-160 mel default:
        # the reference's cond frames run at 2× the codec latent rate and
        # get silently curtailed to the first `length` frames
        # (naturalspeech2_pytorch.py:990 pad_or_curtail) — a timescale
        # mismatch. hop 320 makes aligner/duration/pitch frames land 1:1
        # on latent frames, so predicted durations are in latent frames
        # and the expanded conditioning covers the whole utterance.
        mel_hop_length=320,
        # mask padded tokens out of the phoneme encoder's self-attention
        # (the reference leaves them attending, :1539) and sharpen the soft
        # alignment toward the MAS hard path (RAD-TTS bin loss) so the
        # duration targets track real syllable boundaries
        mask_phoneme_encoder=True,
        aligner_bin_loss_weight=0.1,
        num_phoneme_tokens=VOCAB,
        duration_pitch_dim=128,
        aligner_dim_hidden=128,
        pitch_emb_pp_hidden_dim=128,
        phoneme_enc_kwargs=dict(dim=128, dim_hidden=128, depth=d or 2, heads=4),
        prompt_enc_kwargs=dict(dims=(256, 128), depth=d or 2, heads=4),
        duration_pitch_kwargs=dict(
            dim_encoded_prompts=128, dim_hidden=128, depth=d or 3, heads=4,
            # the reference's ReLU head goes permanently dead under the L1
            # loss (observed: 20k steps with duration_pred ≡ 0); softplus
            # keeps the non-negative contract and a live gradient
            head_activation="softplus",
        ),
    )


def load_codec_params(path: str):
    payload = flax.serialization.msgpack_restore(Path(path).read_bytes())
    return payload["params"]


def _cepstra(x: np.ndarray, n_mfc: int = 13) -> np.ndarray:
    """[t, n_mfc] mel-cepstra (excl. c0) of one waveform."""
    from scipy.fftpack import dct

    from naturalspeech2_tpu.ops.mel import audio_to_mel

    m = np.asarray(audio_to_mel(jnp.asarray(x)[None], n_mels=40))[0]  # [40, t] dB
    logm = m / 10.0 * np.log(10.0)
    return dct(logm.T, axis=1, norm="ortho")[:, 1:n_mfc + 1]


def _dtw_path(cost: np.ndarray):
    """Monotonic DTW path through a [t1, t2] frame-cost matrix."""
    t1, t2 = cost.shape
    acc = np.full((t1 + 1, t2 + 1), np.inf)
    acc[0, 0] = 0.0
    for i in range(1, t1 + 1):
        for j in range(1, t2 + 1):
            acc[i, j] = cost[i - 1, j - 1] + min(
                acc[i - 1, j], acc[i, j - 1], acc[i - 1, j - 1]
            )
    path = []
    i, j = t1, t2
    while i > 0 and j > 0:
        path.append((i - 1, j - 1))
        k = int(np.argmin([acc[i - 1, j - 1], acc[i - 1, j], acc[i, j - 1]]))
        if k == 0:
            i, j = i - 1, j - 1
        elif k == 1:
            i -= 1
        else:
            j -= 1
    return path[::-1]


def mcd_dtw_db(ref: np.ndarray, est: np.ndarray) -> float:
    """DTW-aligned mel-cepstral distortion (dB) — the standard TTS metric:
    generated and ground-truth durations differ (the model predicts its
    own timing), so frames are aligned by DTW over cepstra first."""
    c_r, c_e = _cepstra(ref), _cepstra(est)
    cost = np.sqrt(
        ((c_r[:, None, :] - c_e[None, :, :]) ** 2).sum(-1)
    )
    path = _dtw_path(cost)
    d = np.array([cost[i, j] for i, j in path])
    return float((10.0 / np.log(10.0)) * np.sqrt(2.0) * d.mean())


def mel_l1_dtw(ref: np.ndarray, est: np.ndarray) -> float:
    """Mean |Δ| of 40-band log-mel (dB) along the DTW path."""
    from naturalspeech2_tpu.ops.mel import audio_to_mel

    m_r = np.asarray(audio_to_mel(jnp.asarray(ref)[None], n_mels=40))[0].T
    m_e = np.asarray(audio_to_mel(jnp.asarray(est)[None], n_mels=40))[0].T
    c_r, c_e = _cepstra(ref), _cepstra(est)
    cost = np.sqrt(((c_r[:, None, :] - c_e[None, :, :]) ** 2).sum(-1))
    path = _dtw_path(cost)
    return float(
        np.mean([np.abs(m_r[i] - m_e[j]).mean() for i, j in path])
    )


def f0_mae_dtw_hz(ref: np.ndarray, est: np.ndarray) -> float:
    """Mean |ΔF0| (Hz) along the cepstral DTW path over frames voiced in
    BOTH signals — prosody accuracy of the pitch predictor + diffusion.
    F0 runs at hop 160 to match `_cepstra`'s frame rate (audio_to_mel
    default) so the DTW path indexes both tracks on the same timescale."""
    from naturalspeech2_tpu.ops.pitch import compute_pitch

    f_r = np.asarray(compute_pitch(jnp.asarray(ref)[None], sample_rate=24000,
                                   hop_length=160))[0]
    f_e = np.asarray(compute_pitch(jnp.asarray(est)[None], sample_rate=24000,
                                   hop_length=160))[0]
    c_r, c_e = _cepstra(ref), _cepstra(est)
    cost = np.sqrt(((c_r[:, None, :] - c_e[None, :, :]) ** 2).sum(-1))
    path = _dtw_path(cost)
    diffs = [
        abs(f_r[i] - f_e[j]) for i, j in path
        if i < len(f_r) and j < len(f_e) and f_r[i] > 0 and f_e[j] > 0
    ]
    return float(np.mean(diffs)) if diffs else float("nan")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--codec", required=True)
    ap.add_argument("--steps", type=int, default=8000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--results", default="results_tts_e2e")
    ap.add_argument("--sample-every", type=int, default=2000)
    ap.add_argument("--timesteps", type=int, default=100,
                    help="sampling steps for the final artifact")
    ap.add_argument("--tiny", action="store_true",
                    help="plumbing smoke-test scale (CPU-friendly)")
    ap.add_argument("--seconds", type=float, default=0.4,
                    help="utterance length; longer = more syllables per "
                         "sample, which the unsupervised aligner needs "
                         "(2-3-token snippets admit degenerate CTC optima)")
    ap.add_argument("--eval-only", default=None, metavar="CKPT",
                    help="skip training: load this trainer checkpoint and "
                         "run the evaluation block only")
    ap.add_argument("--spd", type=int, default=1,
                    help="steps_per_dispatch: optimizer steps per "
                         "host->device round trip (lax.scan chunk); through "
                         "the axon tunnel each dispatch costs 30-100 ms, so "
                         "8 roughly halves small-model wall time")
    args = ap.parse_args()

    n_frames = int(args.seconds * 24000) // 320  # latent frames at hop 320
    ns2 = build_ns2(tiny=args.tiny)
    trainer = Trainer(
        ns2,
        batches=prefetched(
            tts_batches(seed=0, batch=args.batch, seconds=args.seconds)
        ),
        train_batch_size=args.batch,
        grad_accum_every=1,
        train_num_steps=args.steps,
        steps_per_dispatch=args.spd,
        save_and_sample_every=args.sample_every,
        sample_length=n_frames,
        results_folder=args.results,
        amp=True,
    )

    print("init...", flush=True)
    batch = next(trainer.batches)
    trainer.init_state(batch)

    # graft the TRAINED codec over the fresh init (frozen during training:
    # the forward stop-gradients codec latents, so Adam sees zero grads)
    codec_params = load_codec_params(args.codec)
    params = dict(trainer.state.params)
    params["codec"] = jax.tree_util.tree_map(jnp.asarray, codec_params)
    ema = dict(trainer.state.ema_params)
    # distinct buffers: params and ema_params live in ONE donated train
    # state — aliasing them trips "donate the same buffer twice"
    ema["codec"] = jax.tree_util.tree_map(jnp.copy, params["codec"])
    trainer.state = trainer.state.replace(params=params, ema_params=ema)
    trainer.state = trainer._shard_state(trainer.state)
    print(f"codec grafted from {args.codec}", flush=True)

    if args.eval_only:
        trainer.load(args.eval_only)
        dt = 0.0
        print(f"eval-only: loaded {args.eval_only} "
              f"(step {int(trainer.state.step)})", flush=True)
    else:
        t0 = time.time()
        trainer.train(log_every=200)
        dt = time.time() - t0
        print(f"trained to step {int(trainer.state.step)} in {dt:.0f}s",
              flush=True)

    # ------------------------------------------------------------------ #
    # quantitative evaluation (VERDICT r3 #6): unseen speakers + texts,
    # metrics vs the synthesizer's ground-truth rendering of the SAME
    # (tokens, speaker): duration MAE, DTW-aligned mel-cepstral distortion
    # with a mismatched-pair control, mel-spectral L1
    # ------------------------------------------------------------------ #
    from synthetic_tts_data import tts_eval_batch  # noqa: E402

    n_eval = 4 if args.tiny else 16
    test = tts_eval_batch(seed=777, batch=n_eval, hop=320,
                          seconds=args.seconds)
    variables = {"params": trainer.state.ema_params}
    out = sample(
        ns2,
        variables,
        jax.random.PRNGKey(0),
        length=n_frames,
        prompt=jnp.asarray(test["prompt"]),
        text=jnp.asarray(test["text"]),
        text_lens=jnp.asarray(test["text_lens"]),
        cond_scale=2.0,
        timesteps=args.timesteps,
    )
    out_np = np.asarray(out)

    # predicted durations (latent frames at hop 320 — build_ns2 pins
    # mel_hop_length=320 so predictor units == latent frames)
    _, _, dur_pred = ns2.apply(
        variables, jnp.asarray(test["prompt"]), jnp.asarray(test["text"]),
        jnp.asarray(test["text_lens"]), n_frames,
        method=ns2.conditioning_for_sample,
    )
    dur_pred = np.asarray(dur_pred)
    tok_mask = test["text"] >= 0
    dur_mae_frames = float(
        np.abs(dur_pred - test["gt_durations"])[tok_mask].mean()
    )

    mcd_matched = [
        mcd_dtw_db(test["audio"][i], out_np[i]) for i in range(n_eval)
    ]
    # control: same generated audio scored against OTHER utterances'
    # ground truth — if the model ignores the text, matched ≈ mismatched
    mcd_mismatched = [
        mcd_dtw_db(test["audio"][(i + 1) % n_eval], out_np[i])
        for i in range(n_eval)
    ]
    mel_l1 = [
        mel_l1_dtw(test["audio"][i], out_np[i]) for i in range(n_eval)
    ]
    f0_mae = [
        f0_mae_dtw_hz(test["audio"][i], out_np[i]) for i in range(n_eval)
    ]
    f0_mae = [v for v in f0_mae if np.isfinite(v)]

    metrics = {
        "steps": int(trainer.state.step),
        "train_wall_s": round(dt, 1),
        "n_eval": n_eval,
        "duration_mae_frames": round(dur_mae_frames, 3),
        "duration_mae_ms": round(dur_mae_frames * 320 / 24000 * 1e3, 1),
        "mcd_dtw_db_matched": round(float(np.mean(mcd_matched)), 3),
        "mcd_dtw_db_mismatched_control": round(
            float(np.mean(mcd_mismatched)), 3
        ),
        "mel_l1_dtw_db": round(float(np.mean(mel_l1)), 3),
        "f0_mae_dtw_hz": round(float(np.mean(f0_mae)), 1) if f0_mae else None,
    }
    print("METRICS " + json.dumps(metrics), flush=True)
    Path(args.results, "tts_e2e_metrics.json").write_text(
        json.dumps(metrics, indent=1)
    )

    audio_dir = Path(__file__).resolve().parents[1] / "docs" / "audio"
    audio_dir.mkdir(parents=True, exist_ok=True)
    for i in range(min(4, n_eval)):
        write_wav(
            str(audio_dir / f"tts_e2e_{i}.wav"),
            np.clip(out_np[i], -1, 1), 24000,
        )
        write_wav(
            str(audio_dir / f"tts_ref_{i}.wav"), test["audio"][i], 24000,
        )
    print(f"tokens: {test['text'][:4].tolist()}")
    print(f"artifacts → {audio_dir}", flush=True)


if __name__ == "__main__":
    main()
