"""Training harness — mesh-sharded jitted train step, EMA, checkpointing.

TPU-native replacement for the reference `Trainer`
(`/root/reference/naturalspeech2_pytorch/naturalspeech2_pytorch.py:1693-1932`),
re-designed for XLA instead of translated from Accelerate:

- one jitted train step containing grad-accumulation (`lax.scan` over
  micro-batches), global-norm clip (1.0), Adam(lr 1e-4, β=(0.9, 0.99)) and
  the EMA update (decay 0.995 every 10 steps) — the reference's Python-side
  accumulate/clip/step/EMA loop (:1878-1901) collapses into one XLA program;
- data parallelism via a `jax.sharding.Mesh`: the batch is sharded over the
  ``data`` axis and XLA inserts the gradient all-reduce — no DDP wrapper,
  no explicit barriers;
- mixed precision: ``amp=True`` runs the loss in bfloat16 (TPU-native;
  reference uses fp16 GradScaler which bf16 does not need);
- checkpoints: single-file msgpack of {step, params, opt_state, ema_params,
  version}, same logical contents as the reference's torch.save (:1837-1846).
"""

from __future__ import annotations

import wave as wave_mod
from pathlib import Path
from typing import Any, Iterator, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import NamedSharding, PartitionSpec as P

from naturalspeech2_tpu.models.naturalspeech2 import NaturalSpeech2, sample
from naturalspeech2_tpu.parallel.mesh import DATA_AXIS, is_main_process, make_mesh
from naturalspeech2_tpu.version import __version__


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    ema_params: Any


def write_wav(path: str, audio: np.ndarray, sample_rate: int):
    """Write mono float32 [-1, 1] audio as 16-bit WAV (host-side)."""
    audio = np.clip(np.asarray(audio, dtype=np.float32), -1.0, 1.0)
    pcm = (audio * 32767.0).astype(np.int16)
    with wave_mod.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())


class Trainer:
    def __init__(
        self,
        diffusion_model: NaturalSpeech2,
        *,
        folder: Optional[str] = None,
        dataset=None,
        batches: Optional[Iterator[np.ndarray]] = None,
        train_batch_size: int = 16,
        grad_accum_every: int = 1,
        lr: float = 1e-4,
        betas: Tuple[float, float] = (0.9, 0.99),
        max_grad_norm: float = 1.0,
        ema_decay: float = 0.995,
        ema_update_every: int = 10,
        train_num_steps: int = 100_000,
        save_and_sample_every: int = 1000,
        results_folder: str = "./results",
        amp: bool = False,
        remat: bool = False,
        data_max_length: Optional[int] = None,
        data_max_length_seconds: Optional[float] = 2.0,
        sample_length: int = 1024,
        mesh=None,
        seed: int = 0,
        checkpoint_backend: str = "msgpack",
        param_sharding: str = "tp",
        steps_per_dispatch: int = 1,
        skip_nonfinite_updates: bool = False,
        lr_schedule: Optional[str] = None,
        warmup_steps: int = 0,
        val_batches: Optional[Iterator[np.ndarray]] = None,
        validate_every: int = 500,
        val_fraction: Optional[float] = None,
    ):
        """``param_sharding``: layout for params/EMA/optimizer state on the
        mesh — 'tp' (Megatron rules over the ``model`` axis, replicated when
        that axis is 1 — the default, matching the reference's DDP
        semantics), 'fsdp' (ZeRO-3-style sharding over the ``data`` axis,
        per-device state O(model/n_data)), or 'replicated'."""
        self.ns2 = diffusion_model
        self.train_batch_size = train_batch_size
        self.grad_accum_every = grad_accum_every
        self.max_grad_norm = max_grad_norm
        self.ema_decay = ema_decay
        self.ema_update_every = ema_update_every
        self.train_num_steps = train_num_steps
        self.save_and_sample_every = save_and_sample_every
        self.results_folder = Path(results_folder)
        self.results_folder.mkdir(parents=True, exist_ok=True)
        self.amp = amp
        self.remat = remat
        self.sample_length = sample_length
        self.seed = seed
        assert checkpoint_backend in ("msgpack", "orbax"), checkpoint_backend
        self.checkpoint_backend = checkpoint_backend
        assert param_sharding in ("tp", "fsdp", "replicated"), param_sharding
        self.param_sharding = param_sharding
        # K optimizer steps per device dispatch (ONE host→device upload +
        # ONE sync per K steps, under lax.scan). Per-step dispatch overhead
        # — not FLOPs — bounds small-model training through a device
        # tunnel (measured: device_put of 600 KB ≈ 60 ms vs a 66 ms step).
        # Same recipe as CodecTrainer's chunked dispatch.
        assert steps_per_dispatch >= 1
        assert train_num_steps % steps_per_dispatch == 0, (
            "train_num_steps must divide into whole dispatch chunks "
            "(a final partial chunk would force a second full compile)"
        )
        self.steps_per_dispatch = steps_per_dispatch
        # production guard: a batch that produces non-finite grads (bf16
        # overflow, corrupt sample) skips the optimizer/EMA update in-graph
        # instead of poisoning the params; surfaced as metrics['skipped'].
        # Off by default — the reference applies every update (:1888).
        self.skip_nonfinite_updates = skip_nonfinite_updates
        # held-out evaluation: every ``validate_every`` steps run the loss
        # (no grads, FIXED diffusion times/noise draws so the series is
        # comparable across evals) on one batch from ``val_batches`` and
        # log it as val_* in metrics.jsonl. The reference has no eval loop.
        self.val_batches = val_batches
        self.validate_every = validate_every
        self._jit_eval = None

        # Training a conditional model with the reference's ReLU prediction
        # head is a known trap (PARITY defect #12): once the pre-activation
        # goes negative at every position, the masked L1's gradient is
        # exactly 0 and the duration/pitch predictor never recovers
        # (observed: 20k steps with duration_pred ≡ 0). The head stays
        # "relu" by default for imported-checkpoint parity, so warn loudly
        # when it is about to be TRAINED.
        if self.ns2.conditional:
            head = (self.ns2.duration_pitch_kwargs or {}).get(
                "head_activation", "relu"
            )
            if head == "relu":
                import warnings

                warnings.warn(
                    "duration/pitch predictor head_activation='relu' (the "
                    "reference default) can go permanently dead under the "
                    "L1 loss — pass duration_pitch_kwargs="
                    "dict(head_activation='softplus') for a trainable head "
                    "(PARITY.md defect #12).",
                    UserWarning,
                    stacklevel=2,
                )

        target_hz = self.ns2.sample_hz
        if data_max_length is None and data_max_length_seconds is not None:
            data_max_length = int(data_max_length_seconds * target_hz)
        self.data_max_length = data_max_length

        # data source: explicit iterator > dataset > folder (ref :1744-1764)
        if batches is not None:
            self.batches = batches
        else:
            from naturalspeech2_tpu.data import SoundDataset, data_loader

            if dataset is None:
                assert folder is not None, "provide folder, dataset or batches"
                ds_kwargs = dict(
                    max_length=data_max_length,
                    target_sample_hz=target_hz,
                    seq_len_multiple_of=self.ns2.codec.seq_len_multiple_of
                    if self.ns2.codec is not None
                    else None,
                )
                dataset = SoundDataset(
                    folder,
                    split="train" if val_fraction else None,
                    val_fraction=val_fraction or 0.05,
                    **ds_kwargs,
                )
                if val_fraction and self.val_batches is None:
                    val_ds = SoundDataset(
                        folder, split="val", val_fraction=val_fraction,
                        **ds_kwargs,
                    )
                    self.val_batches = data_loader(
                        val_ds, train_batch_size, seed=seed + 1
                    )
            self.batches = data_loader(
                dataset, train_batch_size * grad_accum_every, seed=seed
            )

        self.mesh = mesh if mesh is not None else make_mesh()
        n_data = self.mesh.shape[DATA_AXIS]
        assert train_batch_size % n_data == 0, (
            f"train_batch_size ({train_batch_size}) must be divisible by the "
            f"mesh's data axis ({n_data} devices) — pass a smaller mesh "
            f"(make_mesh(n_data=...)) or a larger batch"
        )
        # lr_schedule: None → the reference's constant lr (:1779); "cosine"
        # → linear warmup over ``warmup_steps`` then cosine decay to 10% of
        # peak at train_num_steps; "linear" → warmup then linear decay to 0.
        assert lr_schedule in (None, "cosine", "linear"), lr_schedule
        if lr_schedule == "cosine":
            lr = optax.warmup_cosine_decay_schedule(
                init_value=0.0, peak_value=lr, warmup_steps=warmup_steps,
                decay_steps=train_num_steps, end_value=0.1 * lr,
            )
        elif lr_schedule == "linear":
            lr = optax.join_schedules(
                [
                    optax.linear_schedule(0.0, lr, max(warmup_steps, 1)),
                    optax.linear_schedule(
                        lr, 0.0, max(train_num_steps - warmup_steps, 1)
                    ),
                ],
                [warmup_steps],
            )
        elif warmup_steps > 0:
            lr = optax.linear_schedule(0.0, lr, warmup_steps)
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(max_grad_norm),
            optax.adam(lr, b1=betas[0], b2=betas[1]),
        )

        self._jit_train_step = None
        self.state: Optional[TrainState] = None
        # held-back (prompt, text) pair for conditional milestone sampling
        self._holdback: Optional[dict] = None

    # ------------------------------------------------------------------ #

    def init_state(self, example_batch: np.ndarray) -> TrainState:
        key = jax.random.PRNGKey(self.seed)
        rngs = {
            name: key
            for name in ("params", "times", "noise", "cfg", "dropout", "self_cond")
        }
        micro = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x[: self.train_batch_size]), example_batch
        )
        # init under jit: ONE compiled program instead of thousands of
        # eagerly-dispatched ops (measured 762 s eager vs ~1 min compiled
        # for the full conditional model through the device tunnel)
        if isinstance(micro, dict):
            audio0 = micro["audio"]
            extra0 = {k: v for k, v in micro.items() if k != "audio"}
            variables = jax.jit(
                lambda a, kw: self.ns2.init(rngs, a, **kw)
            )(audio0, extra0)
        else:
            audio0 = micro
            variables = jax.jit(lambda a: self.ns2.init(rngs, a))(micro)
        params = variables["params"]
        # decoder params are only traced by sampling; make sure the codec has
        # its full parameter set so checkpoints are complete
        if self.ns2.codec is not None:
            codec_full = jax.jit(self.ns2.codec.init)(key, audio0)
            merged = dict(params)
            merged["codec"] = codec_full["params"]
            params = flax.core.freeze(merged) if isinstance(
                variables["params"], flax.core.FrozenDict
            ) else merged
        opt_state = self.optimizer.init(params)
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=opt_state,
            ema_params=jax.tree_util.tree_map(jnp.copy, params),
        )
        self.state = self._shard_state(state)
        return self.state

    def _shard_state(self, state):
        if self.param_sharding == "fsdp":
            from naturalspeech2_tpu.parallel.fsdp import shard_state
        elif self.param_sharding == "tp":
            from naturalspeech2_tpu.parallel.tp import shard_state
        else:
            from naturalspeech2_tpu.parallel.mesh import replicated

            rep = replicated(self.mesh)
            return jax.device_put(
                state, jax.tree_util.tree_map(lambda _: rep, state)
            )
        return shard_state(self.mesh, state)

    def _loss_fn(self, params, batch, rngs):
        """batch: audio array, or a dict with 'audio' plus conditional
        kwargs ('text', 'text_lens', 'prompt', 'pitch', ...) — the
        conditional-training path the reference Trainer lacks (its
        SoundDataset only yields audio)."""
        if isinstance(batch, dict):
            audio = batch["audio"]
            extra = {k: v for k, v in batch.items() if k != "audio"}
        else:
            audio, extra = batch, {}

        if self.amp:
            params = jax.tree_util.tree_map(
                lambda p: p.astype(jnp.bfloat16)
                if p.dtype == jnp.float32
                else p,
                params,
            )
            cast = lambda x: (
                x.astype(jnp.bfloat16) if jnp.issubdtype(x.dtype, jnp.floating) else x
            )
            audio = cast(audio)
            extra = {k: cast(v) for k, v in extra.items()}

        def apply(params, audio, extra):
            return self.ns2.apply({"params": params}, audio, rngs=rngs, **extra)

        if self.remat:
            # trade FLOPs for HBM: recompute the forward in the backward pass
            apply = jax.checkpoint(apply)

        losses = apply(params, audio, extra)
        return losses["loss"].astype(jnp.float32), {
            k: v.astype(jnp.float32) for k, v in losses.items()
        }

    def _train_step(self, state: TrainState, batch: jax.Array, key: jax.Array):
        """One optimizer step over ``[accum, micro_batch, ...]``."""
        accum = self.grad_accum_every

        def micro_grads(carry, inputs):
            g_acc, loss_acc = carry
            micro, k = inputs
            rngs = {
                "times": jax.random.fold_in(k, 0),
                "noise": jax.random.fold_in(k, 1),
                "cfg": jax.random.fold_in(k, 2),
                "dropout": jax.random.fold_in(k, 3),
                "self_cond": jax.random.fold_in(k, 4),
            }
            (loss, metrics), grads = jax.value_and_grad(
                self._loss_fn, has_aux=True
            )(state.params, micro, rngs)
            g_acc = jax.tree_util.tree_map(jnp.add, g_acc, grads)
            return (g_acc, loss_acc + loss), metrics

        zeros = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, jnp.float32), state.params
        )
        keys = jax.random.split(key, accum)
        (grads, loss_sum), metrics = jax.lax.scan(
            micro_grads, (zeros, 0.0), (batch, keys)
        )
        grads = jax.tree_util.tree_map(lambda g: g / accum, grads)

        updates, opt_state = self.optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)

        skipped = jnp.zeros((), jnp.float32)
        if self.skip_nonfinite_updates:
            finite = jnp.asarray(True)
            for g in jax.tree_util.tree_leaves(grads):
                finite = jnp.logical_and(finite, jnp.all(jnp.isfinite(g)))
            keep = lambda new, old: jax.tree_util.tree_map(
                lambda a, b: jnp.where(finite, a, b), new, old
            )
            params = keep(params, state.params)
            opt_state = keep(opt_state, state.opt_state)
            skipped = 1.0 - finite.astype(jnp.float32)

        step = state.step + 1
        d = self.ema_decay

        def ema_update(ema):
            return jax.tree_util.tree_map(
                lambda e, p: e * d + p.astype(e.dtype) * (1 - d), ema, params
            )

        ema_params = jax.lax.cond(
            step % self.ema_update_every == 0,
            ema_update,
            lambda ema: ema,
            state.ema_params,
        )

        new_state = TrainState(
            step=step, params=params, opt_state=opt_state, ema_params=ema_params
        )
        mean_metrics = jax.tree_util.tree_map(lambda m: m.mean(), metrics)
        mean_metrics["loss"] = loss_sum / accum
        if self.skip_nonfinite_updates:
            mean_metrics["skipped"] = skipped
        return new_state, mean_metrics

    def _train_chunk(self, state: TrainState, batches: jax.Array, key: jax.Array):
        """``steps_per_dispatch`` optimizer steps under one lax.scan:
        batches ``[K, accum, micro_batch, ...]`` → (state, mean metrics)."""
        keys = jax.random.split(key, self.steps_per_dispatch)

        def body(st, inputs):
            b, k = inputs
            return self._train_step(st, b, k)

        state, metrics = jax.lax.scan(body, state, (batches, keys))
        return state, jax.tree_util.tree_map(lambda m: m.mean(), metrics)

    def evaluate(self) -> dict:
        """One held-out eval: loss components on a ``val_batches`` batch,
        deterministic (fixed PRNG for times/noise/cfg, EMA weights NOT used
        — matches what training optimizes)."""
        assert self.val_batches is not None, "pass val_batches= to Trainer"
        if self._jit_eval is None:

            def eval_loss(params, batch, key):
                rngs = {
                    name: jax.random.fold_in(key, j)
                    for j, name in enumerate(
                        ("times", "noise", "cfg", "dropout", "self_cond")
                    )
                }
                _, metrics = self._loss_fn(params, batch, rngs)
                return metrics

            self._jit_eval = jax.jit(eval_loss)
        batch = jax.tree_util.tree_map(
            lambda x: jnp.asarray(np.asarray(x)[: self.train_batch_size]),
            next(self.val_batches),
        )
        metrics = self._jit_eval(
            self.state.params, batch, jax.random.PRNGKey(self.seed + 1234)
        )
        return {f"val_{k}": float(v) for k, v in metrics.items()}

    def build_train_step(self):
        """Jit the train step (or the K-step dispatch chunk). Shardings ride
        on the arguments: the state is device_put with its layout
        (replicated, or TP-sharded over the ``model`` axis via
        `parallel.tp.shard_state`) and the batch with ``P(None, 'data')``;
        GSPMD propagates the rest and inserts the gradient all-reduce."""
        fn = (
            self._train_step
            if self.steps_per_dispatch == 1
            else self._train_chunk
        )
        self._jit_train_step = jax.jit(fn, donate_argnums=(0,))
        return self._jit_train_step

    # ------------------------------------------------------------------ #

    def save(self, milestone) -> str:
        if not is_main_process():
            return ""
        payload = {
            "step": np.asarray(self.state.step),
            "params": flax.serialization.to_state_dict(self.state.params),
            "opt_state": flax.serialization.to_state_dict(self.state.opt_state),
            "ema_params": flax.serialization.to_state_dict(self.state.ema_params),
            "version": __version__,
        }
        if self.checkpoint_backend == "orbax":
            # Orbax PyTree checkpoint: sharded/parallel-IO directory format
            # (SURVEY §5.4's "Orbax-style" alternative to the single file)
            import orbax.checkpoint as ocp

            path = (self.results_folder / f"model-{milestone}.orbax").absolute()
            ckptr = ocp.PyTreeCheckpointer()
            ckptr.save(path, payload, force=True)
            return str(path)
        path = self.results_folder / f"model-{milestone}.ckpt"
        path.write_bytes(flax.serialization.msgpack_serialize(payload))
        return str(path)

    def latest_checkpoint(self) -> Optional[str]:
        ckpts = sorted(
            [
                *self.results_folder.glob("model-*.ckpt"),
                *self.results_folder.glob("model-*.orbax"),
            ],
            key=lambda p: p.stat().st_mtime,
        )
        return str(ckpts[-1]) if ckpts else None

    def load(self, path: str):
        assert self.state is not None, "call init_state first"

        if str(path).endswith(".orbax"):
            import orbax.checkpoint as ocp

            payload = ocp.PyTreeCheckpointer().restore(
                str(Path(path).absolute())
            )
        else:
            payload = flax.serialization.msgpack_restore(Path(path).read_bytes())
        self.state = TrainState(
            step=jnp.asarray(payload["step"]),
            params=flax.serialization.from_state_dict(
                self.state.params, payload["params"]
            ),
            opt_state=flax.serialization.from_state_dict(
                self.state.opt_state, payload["opt_state"]
            ),
            ema_params=flax.serialization.from_state_dict(
                self.state.ema_params, payload["ema_params"]
            ),
        )
        # from_state_dict yields host numpy leaves — re-apply the mesh
        # placement chosen at init (replicated, TP over 'model', or FSDP
        # over 'data'), otherwise auto-resume silently drops the layout
        self.state = self._shard_state(self.state)
        if payload.get("version") != __version__:
            print(
                f"checkpoint saved with version {payload.get('version')}, "
                f"loading into {__version__}"
            )
        return self.state

    # ------------------------------------------------------------------ #

    def train(self, log_every: int = 50, profile_steps: Optional[Tuple[int, int]] = None):
        """Training loop. ``profile_steps=(start, stop)`` captures a
        `jax.profiler` trace of those steps into results_folder/profile
        (the reference has no tracing at all, SURVEY.md §5.1)."""
        import json
        import time as _time

        batch = next(self.batches)
        if (
            self.ns2.conditional
            and self._holdback is None
            and isinstance(batch, dict)
            and "text" in batch
            and "prompt" in batch
        ):
            self._holdback = {
                k: np.asarray(batch[k][:1])
                for k in ("text", "text_lens", "prompt")
                if k in batch
            }
        if self.state is None:
            self.init_state(batch)
            # elastic restart: resume from the newest checkpoint if present.
            # Only the main process writes checkpoints, so on multi-host the
            # decision must be main's — agree via an all-process broadcast
            # (otherwise non-main hosts restart from step 0 and diverge).
            latest = self.latest_checkpoint()
            if jax.process_count() > 1:
                from jax.experimental import multihost_utils

                found = multihost_utils.broadcast_one_to_all(
                    np.asarray(latest is not None)
                )
                if bool(found) and latest is None:
                    raise FileNotFoundError(
                        "main process has a checkpoint but this host's "
                        f"results_folder ({self.results_folder}) does not — "
                        "results_folder must be shared storage for multi-host "
                        "elastic restart"
                    )
                if not bool(found):
                    latest = None
            if latest is not None:
                print(f"resuming from {latest}")
                self.load(latest)
        if self._jit_train_step is None:
            self.build_train_step()

        key = jax.random.PRNGKey(self.seed + 1)
        K = self.steps_per_dispatch
        # micro-batch axis rides the data mesh axis; for chunked dispatch the
        # leading K axis is scan-time, never sharded
        bsh = NamedSharding(
            self.mesh,
            P(None, None, DATA_AXIS) if K > 1 else P(None, DATA_AXIS),
        )
        metrics_path = self.results_folder / "metrics.jsonl"
        prof_active = False

        def _reshape(x):
            x = np.asarray(x)
            return np.reshape(
                x, (self.grad_accum_every, self.train_batch_size) + x.shape[1:]
            )

        while int(self.state.step) < self.train_num_steps:
            prev_step = int(self.state.step)
            if profile_steps and not prof_active and prev_step >= profile_steps[0]:
                jax.profiler.start_trace(str(self.results_folder / "profile"))
                prof_active = True

            raws = [batch] + [next(self.batches) for _ in range(K - 1)]
            reshaped = [jax.tree_util.tree_map(_reshape, r) for r in raws]
            chunk = (
                reshaped[0]
                if K == 1
                else jax.tree_util.tree_map(lambda *xs: np.stack(xs), *reshaped)
            )
            chunk = jax.device_put(chunk, bsh)
            key, step_key = jax.random.split(key)
            t0 = _time.perf_counter()
            self.state, metrics = self._jit_train_step(
                self.state, chunk, step_key
            )
            step = int(self.state.step)  # syncs the step
            step_time = (_time.perf_counter() - t0) / K

            if profile_steps and prof_active and step >= profile_steps[1]:
                jax.profiler.stop_trace()
                prof_active = False
                profile_steps = None

            # a dispatch advances the step by K: fire each periodic action
            # when its boundary was crossed anywhere inside the chunk
            # (for K>1 the logged metrics are chunk means, step_time is
            # wall-per-step amortized over the dispatch)
            if step // log_every > prev_step // log_every and is_main_process():
                loss = float(metrics["loss"])
                print(f"step {step}: loss {loss:.4f} ({step_time*1e3:.0f} ms)")
                with open(metrics_path, "a") as f:
                    f.write(json.dumps({
                        "step": step,
                        "step_time_s": round(step_time, 4),
                        **{k: float(v) for k, v in metrics.items()},
                    }) + "\n")

            if (
                self.val_batches is not None
                and step // self.validate_every > prev_step // self.validate_every
                and is_main_process()
            ):
                val = self.evaluate()
                print(f"step {step}: val_loss {val['val_loss']:.4f}")
                with open(metrics_path, "a") as f:
                    f.write(json.dumps({"step": step, **val}) + "\n")

            if step // self.save_and_sample_every > prev_step // self.save_and_sample_every:
                self.sample_and_save(step // self.save_and_sample_every)

            batch = next(self.batches)

        if is_main_process():
            print("training complete")

    def sample_and_save(self, milestone):
        if not is_main_process():
            return
        if not self.ns2.conditional:
            audio = sample(
                self.ns2,
                {"params": self.state.ema_params},
                jax.random.PRNGKey(int(milestone)),
                length=self.sample_length,
                batch_size=1,
            )
        elif self._holdback is not None:
            # conditional periodic sampling: generate the held-back
            # (prompt, text) pair — the capability the reference *intends*
            # (naturalspeech2_pytorch.py:1915-1918) but crashes on because it
            # calls sample() without text/prompt
            hb = self._holdback
            audio = sample(
                self.ns2,
                {"params": self.state.ema_params},
                jax.random.PRNGKey(int(milestone)),
                length=self.sample_length,
                prompt=jnp.asarray(hb["prompt"]),
                text=jnp.asarray(hb["text"]),
                text_lens=jnp.asarray(hb["text_lens"])
                if "text_lens" in hb
                else None,
            )
        else:
            self.save(milestone)
            return
        write_wav(
            self.results_folder / f"sample-{milestone}.wav",
            np.asarray(audio[0]),
            self.ns2.sample_hz,
        )
        self.save(milestone)
