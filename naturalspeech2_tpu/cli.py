"""Command-line interface: train / sample / codec-train / serve / import-torch.

The reference is library-only (every workflow in its README is a Python
snippet, `/root/reference/README.md:43-143`); a production framework needs a
launchable surface. One binary, five subcommands:

    ns2-tpu train        --folder wavs/ --steps 100000 --results results/
    ns2-tpu sample       --checkpoint results/model-7.ckpt --out out/
    ns2-tpu codec-train  --folder wavs/ --steps 50000 --adversarial-weight 1
    ns2-tpu serve        --demo --port 8080
    ns2-tpu import-torch --input ref_model.pt --output model-0.ckpt

Model architecture comes from a JSON config file (``--config``) with
sections mapping 1:1 onto the constructors — the same kwargs the Python API
takes (SURVEY §5.6 config-system parity):

    {"codec":   {"type": "soundstream"},            # or {"type": "encodec"}
     "model":   {"dim": 128, "depth": 6},
     "ns2":     {"timesteps": 1000},
     "trainer": {"train_batch_size": 16}}

Omitted sections fall back to the flagship defaults (the reference
README's canonical unconditional config, README.md:43-56).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path
from typing import Any, Dict, Iterator, Optional

import numpy as np


# --------------------------------------------------------------------- #
# config → model objects
# --------------------------------------------------------------------- #

FLAGSHIP = {
    "codec": {"type": "soundstream"},
    "model": {"dim": 128, "depth": 6, "scan_layers": True},
    "ns2": {"timesteps": 1000},
    "trainer": {},
}


def load_config(path: Optional[str]) -> Dict[str, Any]:
    cfg = {k: dict(v) for k, v in FLAGSHIP.items()}
    if path is not None:
        user = json.loads(Path(path).read_text())
        for section, values in user.items():
            assert section in cfg, (
                f"unknown config section {section!r} "
                f"(expected one of {sorted(cfg)})"
            )
            cfg[section].update(values)
    return cfg


def build_codec(codec_cfg: Dict[str, Any]):
    cfg = dict(codec_cfg)
    kind = cfg.pop("type", "soundstream")
    if kind == "soundstream":
        from naturalspeech2_tpu.models.codec import SoundStream

        return SoundStream(**cfg)
    if kind == "encodec":
        from naturalspeech2_tpu.models.encodec import Encodec

        return Encodec(**cfg)
    raise ValueError(f"codec type must be soundstream|encodec, got {kind!r}")


def build_ns2(cfg: Dict[str, Any]):
    from naturalspeech2_tpu.models.denoiser import Model
    from naturalspeech2_tpu.models.naturalspeech2 import NaturalSpeech2
    from naturalspeech2_tpu.utils.tokenizer import Tokenizer

    codec = build_codec(cfg["codec"])
    model = Model(**cfg["model"])
    ns2_kwargs = dict(cfg["ns2"])
    ns2_kwargs.setdefault("tokenizer", Tokenizer())
    return NaturalSpeech2(model=model, codec=codec, **ns2_kwargs)


# --------------------------------------------------------------------- #
# checkpoint loading for inference
# --------------------------------------------------------------------- #


def _dummy_batches(ns2, n_samples: int) -> Iterator:
    """Infinite template batches for shape-only state init."""
    audio = np.zeros((1, n_samples), np.float32)
    if ns2.conditional:
        batch = {
            "audio": audio,
            "text": np.ones((1, 8), np.int32),
            "text_lens": np.full((1,), 8, np.int32),
            "prompt": np.zeros((1, n_samples), np.float32),
        }
    else:
        batch = audio
    while True:
        yield batch


def load_for_inference(ns2, checkpoint: str, *, use_ema: bool = True):
    """Checkpoint file → `{"params": ...}` variables for `sample()`.

    Accepts both Trainer checkpoints (msgpack/orbax with params + EMA) and
    params-only files written by ``import-torch``. Prefers the EMA weights
    (the reference samples from its EMA copy, naturalspeech2_pytorch.py:1915).
    """
    import flax

    from naturalspeech2_tpu.trainer import Trainer

    import jax

    from naturalspeech2_tpu.parallel.mesh import make_mesh

    hop = ns2.codec.seq_len_multiple_of if ns2.codec is not None else 320
    trainer = Trainer(
        ns2,
        batches=_dummy_batches(ns2, 2 * hop),
        train_batch_size=1,
        grad_accum_every=1,
        save_and_sample_every=10**9,
        results_folder="/tmp/ns2_cli_inference",
        mesh=make_mesh(n_data=1, devices=jax.devices()[:1]),
    )
    state = trainer.init_state(next(trainer.batches))

    if str(checkpoint).endswith(".orbax"):
        trainer.load(checkpoint)
        params = trainer.state.ema_params if use_ema else trainer.state.params
        return {"params": params}

    payload = flax.serialization.msgpack_restore(Path(checkpoint).read_bytes())
    which = "ema_params" if use_ema and "ema_params" in payload else "params"
    params = flax.serialization.from_state_dict(state.params, payload[which])
    return {"params": params}


# --------------------------------------------------------------------- #
# subcommands
# --------------------------------------------------------------------- #


def cmd_train(args) -> int:
    cfg = load_config(args.config)
    ns2 = build_ns2(cfg)

    from naturalspeech2_tpu.trainer import Trainer

    tr_kwargs: Dict[str, Any] = dict(cfg["trainer"])
    if args.mesh_data is not None:
        import jax

        from naturalspeech2_tpu.parallel.mesh import make_mesh

        tr_kwargs["mesh"] = make_mesh(
            n_data=args.mesh_data, devices=jax.devices()[: args.mesh_data]
        )
    for name, value in [
        ("train_batch_size", args.batch_size),
        ("grad_accum_every", args.grad_accum),
        ("lr", args.lr),
        ("train_num_steps", args.steps),
        ("save_and_sample_every", args.save_every),
        ("results_folder", args.results),
        ("amp", args.amp or None),
        ("steps_per_dispatch", args.steps_per_dispatch),
        ("data_max_length_seconds", args.data_seconds),
        ("checkpoint_backend", args.checkpoint_backend),
        ("param_sharding", args.param_sharding),
        ("skip_nonfinite_updates", args.skip_nonfinite or None),
        ("lr_schedule", args.lr_schedule),
        ("warmup_steps", args.warmup_steps),
        ("val_fraction", args.val_fraction),
        ("validate_every", args.validate_every),
    ]:
        if value is not None:
            tr_kwargs[name] = value

    trainer = Trainer(ns2, folder=args.folder, **tr_kwargs)
    trainer.train(log_every=args.log_every)
    return 0


def cmd_codec_train(args) -> int:
    cfg = load_config(args.config)
    codec = build_codec(cfg["codec"])

    from naturalspeech2_tpu.codec_trainer import CodecTrainer
    from naturalspeech2_tpu.data import SoundDataset, data_loader

    target_hz = getattr(codec, "target_sample_hz", 24000)
    max_length = int(args.data_seconds * target_hz)
    dataset = SoundDataset(
        args.folder,
        max_length=max_length,
        target_sample_hz=target_hz,
        seq_len_multiple_of=codec.seq_len_multiple_of,
    )
    mesh = None
    if args.mesh_data is not None:
        import jax

        from naturalspeech2_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(
            n_data=args.mesh_data, devices=jax.devices()[: args.mesh_data]
        )
    trainer = CodecTrainer(
        codec,
        batches=data_loader(dataset, args.batch_size, seed=args.seed),
        lr=args.lr if args.lr is not None else 3e-4,
        adversarial_weight=args.adversarial_weight,
        adversarial_warmup=args.warmup,
        amp=bool(args.amp),
        results_folder=args.results,
        seed=args.seed,
        mesh=mesh,
    )
    if args.resume is not None:
        trainer.load(args.resume)
    # CodecTrainer.train resumes from the current state step, so driving it
    # in save_every-sized segments gives periodic resumable checkpoints
    start = 0 if trainer.state is None else int(trainer.state.step)
    while start < args.steps:
        until = min(start + args.save_every, args.steps)
        trainer.train(
            until,
            log_every=args.log_every,
            steps_per_jit=args.steps_per_dispatch or 8,
        )
        start = int(trainer.state.step)
        print(trainer.save(start))
    return 0


def cmd_sample(args) -> int:
    import jax
    import jax.numpy as jnp

    from naturalspeech2_tpu.models.naturalspeech2 import sample
    from naturalspeech2_tpu.trainer import write_wav

    cfg = load_config(args.config)
    if args.sampler is not None:
        cfg["ns2"]["sampler"] = args.sampler
    ns2 = build_ns2(cfg)
    variables = load_for_inference(ns2, args.checkpoint, use_ema=not args.no_ema)

    kwargs: Dict[str, Any] = {}
    if ns2.conditional:
        assert args.text and args.prompt, (
            "conditional model: pass --text and --prompt <wav>"
        )
        from naturalspeech2_tpu.data import load_audio, resample

        prompt_audio, sr = load_audio(args.prompt)
        prompt_audio = resample(prompt_audio, sr, ns2.sample_hz)
        texts = list(args.text)
        # one prompt voice, N texts: tile to the text batch
        kwargs["prompt"] = jnp.tile(
            jnp.asarray(prompt_audio)[None, :], (len(texts), 1)
        )
        kwargs["text"] = texts
        kwargs["cond_scale"] = args.cond_scale
        kwargs["cfg_rescale"] = args.cfg_rescale
        if args.cfg_interval is not None:
            kwargs["cfg_interval"] = tuple(args.cfg_interval)
    else:
        kwargs["batch_size"] = args.batch

    length = args.length
    if args.seconds is not None:
        hop = ns2.codec.seq_len_multiple_of if ns2.codec is not None else 320
        length = int(round(args.seconds * ns2.sample_hz / hop))

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    audio = sample(
        ns2,
        variables,
        jax.random.PRNGKey(args.seed),
        length=length,
        timesteps=args.timesteps,
        dtype=jnp.bfloat16 if args.bf16 else None,
        **kwargs,
    )
    audio = np.asarray(audio)
    for i in range(audio.shape[0]):
        path = out_dir / f"sample-{i}.wav"
        write_wav(path, audio[i], ns2.sample_hz)
        print(path)
    return 0


def build_engine(
    config: Optional[str],
    checkpoint: str,
    *,
    timesteps: Optional[int] = None,
    cond_scale: float = 3.0,
    tp: int = 1,
    **engine_kwargs,
):
    """checkpoint + config → a ready `TTSEngine` (the `serve` glue,
    separated so it is testable without a blocking HTTP server)."""
    from naturalspeech2_tpu import serve as serve_mod

    cfg = load_config(config)
    ns2 = build_ns2(cfg)
    assert ns2.conditional, (
        "serving is text→speech: the config must enable prompt "
        "conditioning (model.condition_on_prompt)"
    )
    variables = load_for_inference(ns2, checkpoint)
    mesh = None
    if tp > 1:
        import jax

        from naturalspeech2_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(n_data=1, n_model=tp, devices=jax.devices()[:tp])
    return serve_mod.TTSEngine(
        ns2,
        variables,
        timesteps=timesteps or 100,
        cond_scale=cond_scale,
        mesh=mesh,
        **engine_kwargs,
    )


def cmd_serve(args) -> int:
    from naturalspeech2_tpu import serve as serve_mod

    if args.demo:
        engine = serve_mod._demo_engine()
    else:
        assert args.checkpoint is not None, "pass --checkpoint (or --demo)"
        engine = build_engine(
            args.config,
            args.checkpoint,
            timesteps=args.timesteps,
            cond_scale=args.cond_scale,
            tp=args.tp,
            dtype="bfloat16" if args.bf16 else None,
            cfg_interval=tuple(args.cfg_interval)
            if args.cfg_interval is not None else None,
        )
    if not args.no_warmup:
        print("compiling serving buckets...", flush=True)
        print("compiled:", engine.warmup(), flush=True)
    server = serve_mod.TTSServer(engine, (args.host, args.port))
    engine.start_batcher()
    print(f"serving on http://{args.host}:{server.port}", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        engine.stop_batcher()
        server.server_close()
    return 0


def cmd_info(args) -> int:
    """Model summary: per-module parameter counts, codec framing, and the
    serving-relevant numbers (hop, sample rate, frames/sec)."""
    import jax
    import jax.numpy as jnp

    cfg = load_config(args.config)
    ns2 = build_ns2(cfg)

    key = jax.random.PRNGKey(0)
    hop = ns2.codec.seq_len_multiple_of if ns2.codec is not None else 320
    batch = next(_dummy_batches(ns2, 2 * hop))
    if isinstance(batch, dict):
        audio0 = jnp.asarray(batch["audio"])
        extra = {k: jnp.asarray(v) for k, v in batch.items() if k != "audio"}
    else:
        audio0, extra = jnp.asarray(batch), {}
    rngs = {
        n: key
        for n in ("params", "times", "noise", "cfg", "dropout", "self_cond")
    }
    variables = ns2.init(rngs, audio0, **extra)
    params = dict(variables["params"])
    if ns2.codec is not None:
        params["codec"] = ns2.codec.init(key, audio0)["params"]

    def count(tree) -> int:
        return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(tree))

    total = count(params)
    print(f"model: {type(ns2.model).__name__} dim={ns2.dim} "
          f"conditional={ns2.conditional} sampler="
          f"{ns2.sampler or ('ddim' if ns2.use_ddim else 'ddpm')} "
          f"timesteps={ns2.timesteps}")
    print(f"codec: hop={hop} sample_hz={ns2.sample_hz} "
          f"({ns2.sample_hz / hop:.1f} latent frames/sec)")
    for name in sorted(params):
        n = count(params[name])
        print(f"  {name:<16} {n:>12,}  ({100 * n / total:.1f}%)")
    print(f"  {'TOTAL':<16} {total:>12,}")
    return 0


def cmd_import_torch(args) -> int:
    import flax

    from naturalspeech2_tpu.utils import torch_import as ti
    from naturalspeech2_tpu.version import __version__

    sd = ti.load_torch_checkpoint(args.input)
    if args.encodec:
        params = ti.encodec_params_from_hf(sd)
    else:
        params = ti.naturalspeech2_params_from_torch(sd)
    payload = {
        "step": np.zeros((), np.int32),
        "params": flax.serialization.to_state_dict(params),
        "version": __version__,
    }
    Path(args.output).write_bytes(flax.serialization.msgpack_serialize(payload))
    n = len(flax.traverse_util.flatten_dict(
        flax.serialization.to_state_dict(params)
    ))
    print(f"wrote {args.output} ({n} arrays)")
    return 0


# --------------------------------------------------------------------- #
# argument parsing
# --------------------------------------------------------------------- #


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="ns2-tpu", description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    sub = p.add_subparsers(dest="command", required=True)

    def common(sp):
        sp.add_argument("--config", help="JSON model/trainer config file")
        sp.add_argument("--seed", type=int, default=0)

    t = sub.add_parser("train", help="train a NaturalSpeech2 model")
    common(t)
    t.add_argument("--folder", required=True, help="folder of audio files")
    t.add_argument("--steps", type=int, default=None)
    t.add_argument("--batch-size", type=int, default=None)
    t.add_argument("--grad-accum", type=int, default=None)
    t.add_argument("--lr", type=float, default=None)
    t.add_argument("--save-every", type=int, default=None)
    t.add_argument("--results", default=None)
    t.add_argument("--amp", action="store_true", help="bfloat16 training")
    t.add_argument("--steps-per-dispatch", type=int, default=None,
                   help="K optimizer steps per device dispatch (lax.scan)")
    t.add_argument("--data-seconds", type=float, default=None)
    t.add_argument("--checkpoint-backend", choices=("msgpack", "orbax"),
                   default=None)
    t.add_argument("--param-sharding", choices=("tp", "fsdp", "replicated"),
                   default=None)
    t.add_argument("--mesh-data", type=int, default=None,
                   help="data-parallel mesh size (default: all devices)")
    t.add_argument("--skip-nonfinite", action="store_true",
                   help="skip (don't apply) updates with non-finite grads")
    t.add_argument("--lr-schedule", choices=("cosine", "linear"),
                   default=None, help="default: constant lr")
    t.add_argument("--warmup-steps", type=int, default=None)
    t.add_argument("--val-fraction", type=float, default=None,
                   help="hold out this fraction of files for val_loss")
    t.add_argument("--validate-every", type=int, default=None)
    t.add_argument("--log-every", type=int, default=50)
    t.set_defaults(fn=cmd_train)

    c = sub.add_parser("codec-train", help="train the neural codec")
    common(c)
    c.add_argument("--folder", required=True)
    c.add_argument("--steps", type=int, default=50_000)
    c.add_argument("--batch-size", type=int, default=16)
    c.add_argument("--lr", type=float, default=None)
    c.add_argument("--data-seconds", type=float, default=0.4)
    c.add_argument("--adversarial-weight", type=float, default=0.0)
    c.add_argument("--warmup", type=int, default=0,
                   help="recon-only steps before the GAN loss turns on")
    c.add_argument("--amp", action="store_true")
    c.add_argument("--results", default="./results_codec")
    c.add_argument("--resume", default=None, help="checkpoint to resume from")
    c.add_argument("--save-every", type=int, default=5000)
    c.add_argument("--steps-per-dispatch", type=int, default=None)
    c.add_argument("--mesh-data", type=int, default=None,
                   help="data-parallel mesh size (default: all devices)")
    c.add_argument("--log-every", type=int, default=50)
    c.set_defaults(fn=cmd_codec_train)

    s = sub.add_parser("sample", help="generate audio from a checkpoint")
    common(s)
    s.add_argument("--checkpoint", required=True)
    s.add_argument("--out", default="./samples")
    s.add_argument("--length", type=int, default=1024,
                   help="latent frames (320 samples each at 24 kHz)")
    s.add_argument("--seconds", type=float, default=None,
                   help="output duration (overrides --length)")
    s.add_argument("--timesteps", type=int, default=None)
    s.add_argument("--sampler", choices=("ddim", "ddpm", "dpmpp"),
                   default=None,
                   help="dpmpp = DPM-Solver++(2M), accurate at 6-25 steps")
    s.add_argument("--batch", type=int, default=1)
    s.add_argument("--no-ema", action="store_true",
                   help="sample raw params instead of the EMA copy")
    s.add_argument("--text", action="append", default=None,
                   help="(conditional) text to speak; repeatable")
    s.add_argument("--prompt", default=None,
                   help="(conditional) prompt wav for voice conditioning")
    s.add_argument("--cond-scale", type=float, default=3.0)
    s.add_argument("--cfg-rescale", type=float, default=0.0,
                   help="std-matching CFG rescale phi in [0,1]")
    s.add_argument("--cfg-interval", type=float, nargs=2, default=None,
                   metavar=("T_LO", "T_HI"),
                   help="apply guidance only at diffusion times in "
                        "[T_LO, T_HI] (limited-interval CFG: steps outside "
                        "run one forward instead of the guided pair)")
    s.add_argument("--bf16", action="store_true",
                   help="run the denoiser scan in bfloat16 (memory-bound "
                        "sampling fast path; schedule math stays f32)")
    s.set_defaults(fn=cmd_sample)

    v = sub.add_parser("serve", help="HTTP TTS endpoint")
    common(v)
    v.add_argument("--demo", action="store_true",
                   help="tiny random model (plumbing demo)")
    v.add_argument("--checkpoint", default=None)
    v.add_argument("--host", default="127.0.0.1")
    v.add_argument("--port", type=int, default=8080)
    v.add_argument("--timesteps", type=int, default=None)
    v.add_argument("--cond-scale", type=float, default=3.0)
    v.add_argument("--no-warmup", action="store_true",
                   help="compile buckets lazily on first request")
    v.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel serving over N chips (latency mode)")
    v.add_argument("--bf16", action="store_true",
                   help="run the denoiser scan in bfloat16 (memory-bound "
                        "sampling fast path; schedule math stays f32)")
    v.add_argument("--cfg-interval", type=float, nargs=2, default=None,
                   metavar=("T_LO", "T_HI"),
                   help="limited-interval CFG: guidance only at diffusion "
                        "times in [T_LO, T_HI]")
    v.set_defaults(fn=cmd_serve)

    n = sub.add_parser("info", help="model summary for a config")
    common(n)
    n.set_defaults(fn=cmd_info)

    i = sub.add_parser(
        "import-torch",
        help="convert a reference torch .pt checkpoint (torch-free)",
    )
    i.add_argument("--input", required=True)
    i.add_argument("--output", required=True)
    i.add_argument("--encodec", action="store_true",
                   help="input is an HF EncodecModel state_dict")
    i.set_defaults(fn=cmd_import_torch)

    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
