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
        num_phoneme_tokens=VOCAB,
        duration_pitch_dim=128,
        aligner_dim_hidden=128,
        pitch_emb_pp_hidden_dim=128,
        phoneme_enc_kwargs=dict(dim=128, dim_hidden=128, depth=d or 2, heads=4),
        prompt_enc_kwargs=dict(dims=(256, 128), depth=d or 2, heads=4),
        duration_pitch_kwargs=dict(
            dim_encoded_prompts=128, dim_hidden=128, depth=d or 3, heads=4,
        ),
    )


def load_codec_params(path: str):
    payload = flax.serialization.msgpack_restore(Path(path).read_bytes())
    return payload["params"]


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
    args = ap.parse_args()

    ns2 = build_ns2(tiny=args.tiny)
    trainer = Trainer(
        ns2,
        batches=prefetched(tts_batches(seed=0, batch=args.batch)),
        train_batch_size=args.batch,
        grad_accum_every=1,
        train_num_steps=args.steps,
        save_and_sample_every=args.sample_every,
        sample_length=30,  # 0.4 s at hop 320
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

    t0 = time.time()
    trainer.train(log_every=200)
    dt = time.time() - t0
    print(f"trained to step {int(trainer.state.step)} in {dt:.0f}s", flush=True)

    # final artifact: unseen speaker prompt + fixed token string
    test = next(tts_batches(seed=777, batch=4))
    out = sample(
        ns2,
        {"params": trainer.state.ema_params},
        jax.random.PRNGKey(0),
        length=30,
        prompt=jnp.asarray(test["prompt"]),
        text=jnp.asarray(test["text"]),
        text_lens=jnp.asarray(test["text_lens"]),
        cond_scale=2.0,
        timesteps=args.timesteps,
    )
    audio_dir = Path(__file__).resolve().parents[1] / "docs" / "audio"
    audio_dir.mkdir(parents=True, exist_ok=True)
    out_np = np.asarray(out)
    for i in range(out_np.shape[0]):
        write_wav(
            str(audio_dir / f"tts_e2e_{i}.wav"),
            np.clip(out_np[i], -1, 1), 24000,
        )
        write_wav(
            str(audio_dir / f"tts_ref_{i}.wav"), test["audio"][i], 24000,
        )
    print(f"tokens: {test['text'].tolist()}")
    print(f"artifacts → {audio_dir}", flush=True)


if __name__ == "__main__":
    main()
