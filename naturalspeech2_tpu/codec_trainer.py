"""Codec pre-training harness.

The reference uses a frozen pretrained Encodec (external compiled package);
this trainer makes the JAX `SoundStream` codec trainable end-to-end on TPU:
waveform L1 + multi-resolution STFT loss + commitment loss, straight-through
RVQ, EMA codebook updates (SoundStream-style: codebook entries track the
EMA of their assigned residuals — VQ codebooks learn by assignment
statistics, not backprop), data-sharded jitted step over the mesh.

Adversarial refinement (``adversarial_weight > 0``) adds the
SoundStream/Encodec recipe: multi-scale STFT discriminators with hinge
losses and feature matching (`models.discriminator`). Generator and
discriminator update in the same jitted step (D sees the stop-gradiented
reconstruction); ``adversarial_warmup`` delays the adversarial terms so
the reconstruction losses shape the codec first.
"""

from __future__ import annotations

from pathlib import Path
from typing import Iterator, Optional

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import NamedSharding, PartitionSpec as P

from naturalspeech2_tpu.models.codec import SoundStream
from naturalspeech2_tpu.ops.rvq import rvq_xla
from naturalspeech2_tpu.ops.stft_loss import multi_resolution_stft_loss
from naturalspeech2_tpu.parallel.mesh import DATA_AXIS, is_main_process, make_mesh


class CodecTrainState(struct.PyTreeNode):
    step: jax.Array
    params: flax.core.FrozenDict | dict
    opt_state: tuple
    codebook_ema: jax.Array  # [Q, K, d] EMA of assigned residual sums
    codebook_count: jax.Array  # [Q, K] EMA of assignment counts
    disc_params: Optional[dict] = None
    disc_opt_state: Optional[tuple] = None


class CodecTrainer:
    def __init__(
        self,
        codec: SoundStream,
        *,
        batches: Iterator[np.ndarray],
        lr: float = 3e-4,
        commitment_weight: float = 0.25,
        stft_weight: float = 1.0,
        wav_weight: float = 1.0,
        mel_weight: float = 0.0,
        lr_schedule: Optional[str] = None,
        decay_steps: Optional[int] = None,
        adversarial_weight: float = 0.0,
        feature_weight: float = 3.0,
        adversarial_warmup: int = 0,
        disc_lr: Optional[float] = None,
        disc_channels: int = 32,
        disc_scales=None,
        codebook_ema_decay: float = 0.99,
        dead_code_threshold: float = 0.5,
        max_grad_norm: float = 1.0,
        amp: bool = False,
        mesh=None,
        results_folder: str = "./results_codec",
        seed: int = 0,
    ):
        self.codec = codec
        self.batches = batches
        self.commitment_weight = commitment_weight
        self.stft_weight = stft_weight
        self.wav_weight = wav_weight
        # perceptually-weighted reconstruction: L1 on log-mel magnitudes
        # (HiFi-GAN's mel loss; the MR-STFT terms are linear-frequency, so
        # this re-weights fidelity toward the mel bands MCD measures).
        # 0 disables (round-3 recipe); the production run uses ~15.
        self.mel_weight = mel_weight
        self.adversarial_weight = adversarial_weight
        self.feature_weight = feature_weight
        self.adversarial_warmup = adversarial_warmup
        self.decay = codebook_ema_decay
        # bf16 mixed precision: codec/discriminator forwards run with bf16
        # params+activations (TPU-native; 2× MXU conv rate), master params,
        # losses, STFT losses and codebook statistics stay f32
        self.amp = amp
        # SoundStream recipe: codes whose EMA assignment count falls below
        # this are re-seeded from random encoder outputs of the current
        # batch (0 disables). With decay 0.99 an EMA count is roughly
        # "assignments per batch", so 0.5 ≈ "used less than every other
        # batch". Prevents silent codebook collapse.
        self.dead_code_threshold = dead_code_threshold
        self.mesh = mesh if mesh is not None else make_mesh()
        # cosine decay to 10% of peak over ``decay_steps`` on BOTH
        # optimizers (round-3's plateau ran constant-lr to 50k; VERDICT #5)
        assert lr_schedule in (None, "cosine"), lr_schedule
        disc_lr_val = disc_lr if disc_lr is not None else lr
        if lr_schedule == "cosine":
            assert decay_steps, "lr_schedule='cosine' needs decay_steps"
            lr = optax.cosine_decay_schedule(lr, decay_steps, alpha=0.1)
            disc_lr_val = optax.cosine_decay_schedule(
                disc_lr_val, decay_steps, alpha=0.1
            )
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(max_grad_norm), optax.adam(lr)
        )
        self.discriminator = None
        self.disc_optimizer = None
        if adversarial_weight > 0.0:
            from naturalspeech2_tpu.models.discriminator import (
                DEFAULT_SCALES,
                MultiScaleSTFTDiscriminator,
            )

            self.discriminator = MultiScaleSTFTDiscriminator(
                scales=disc_scales or DEFAULT_SCALES, channels=disc_channels
            )
            self.disc_optimizer = optax.chain(
                optax.clip_by_global_norm(max_grad_norm),
                optax.adam(disc_lr_val),
            )
        self.results_folder = Path(results_folder)
        self.results_folder.mkdir(parents=True, exist_ok=True)
        self.seed = seed
        self.state: Optional[CodecTrainState] = None
        self._step_fn = None

    def init_state(self, example_batch: np.ndarray) -> CodecTrainState:
        key = jax.random.PRNGKey(self.seed)
        audio = jnp.asarray(example_batch)
        # jit the inits: un-jitted flax init executes every primitive
        # eagerly, which through a high-latency device tunnel costs minutes
        params = jax.jit(self.codec.init)(key, audio)["params"]
        codebooks = params["codebooks"]
        disc_params = disc_opt_state = None
        if self.discriminator is not None:
            disc_params = jax.jit(self.discriminator.init)(
                jax.random.fold_in(key, 1), audio
            )["params"]
            disc_opt_state = self.disc_optimizer.init(disc_params)
        self.state = CodecTrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=self.optimizer.init(params),
            codebook_ema=jnp.copy(codebooks),  # distinct buffer — donation-safe
            codebook_count=jnp.ones(codebooks.shape[:2], jnp.float32),
            disc_params=disc_params,
            disc_opt_state=disc_opt_state,
        )
        return self.state

    # ------------------------------------------------------------------ #

    def _losses(self, params, disc_params, audio, adv_on):
        codec = self.codec
        if self.amp:
            # bf16 conv compute; master params, codebooks and losses stay f32
            cast = lambda t: jax.tree_util.tree_map(
                lambda p: p.astype(jnp.bfloat16)
                if p.dtype == jnp.float32 else p, t,
            )
            run_params = dict(cast(params))
            run_params["codebooks"] = params["codebooks"]  # RVQ in f32
            run_audio = audio.astype(jnp.bfloat16)
        else:
            run_params, run_audio = params, audio
        latents = codec.apply(
            {"params": run_params}, run_audio, method=codec.encode_latents
        )
        b, n, d = latents.shape
        flat = latents.reshape(b * n, d).astype(jnp.float32)
        quantized, codes = rvq_xla(flat, params["codebooks"])
        quantized_st = flat + jax.lax.stop_gradient(quantized - flat)
        recon = codec.apply(
            {"params": run_params},
            quantized_st.reshape(b, n, d).astype(latents.dtype),
            method=codec.decode,
        ).astype(jnp.float32)
        wav_l1 = jnp.abs(recon - audio).mean()
        stft_l = multi_resolution_stft_loss(recon, audio)
        commit = ((flat - jax.lax.stop_gradient(quantized)) ** 2).mean()
        loss = (
            self.wav_weight * wav_l1
            + self.stft_weight * stft_l
            + self.commitment_weight * commit
        )
        metrics = {
            "loss": loss, "wav_l1": wav_l1, "stft": stft_l, "commit": commit,
        }
        if self.mel_weight > 0.0:
            from naturalspeech2_tpu.ops.mel import audio_to_mel

            sr = getattr(self.codec, "target_sample_hz", 24000)
            mel_kw = dict(sample_rate=sr, n_mels=80, n_fft=1024,
                          win_length=1024, hop_length=256,
                          f_max=sr / 2, log=False)
            logmel = lambda a: jnp.log(
                jnp.clip(audio_to_mel(a, **mel_kw), min=1e-5)
            )
            mel_l1 = jnp.abs(logmel(recon) - logmel(audio)).mean()
            loss = loss + self.mel_weight * mel_l1
            metrics.update({"mel_l1": mel_l1, "loss": loss})
        if self.discriminator is not None:
            from naturalspeech2_tpu.models.discriminator import (
                feature_matching_loss,
                generator_hinge_loss,
            )

            def with_adv(_):
                # D is frozen inside the generator loss
                dp = jax.lax.stop_gradient(disc_params)
                d_in_fake, d_in_real = recon, audio
                if self.amp:
                    dp = jax.tree_util.tree_map(
                        lambda p: p.astype(jnp.bfloat16)
                        if p.dtype == jnp.float32 else p, dp,
                    )
                    d_in_fake = recon.astype(jnp.bfloat16)
                    d_in_real = audio.astype(jnp.bfloat16)
                fake_logits, fake_feats = self.discriminator.apply(
                    {"params": dp}, d_in_fake
                )
                _, real_feats = self.discriminator.apply(
                    {"params": dp}, d_in_real
                )
                f32 = lambda t: jax.tree_util.tree_map(
                    lambda x: x.astype(jnp.float32), t
                )
                adv = generator_hinge_loss(f32(fake_logits))
                feat = feature_matching_loss(
                    jax.lax.stop_gradient(f32(real_feats)), f32(fake_feats)
                )
                return adv, feat

            def without_adv(_):
                return jnp.zeros(()), jnp.zeros(())

            # warmup steps (adv_on == 0) skip the two D forwards entirely
            # instead of computing them into a zero-scaled term
            adv, feat = jax.lax.cond(adv_on > 0, with_adv, without_adv, None)
            loss = loss + adv_on * (
                self.adversarial_weight * adv + self.feature_weight * feat
            )
            metrics.update({"adv_g": adv, "feat": feat, "loss": loss})
        return loss, (metrics, flat, codes, recon)

    def _train_step(self, state: CodecTrainState, audio: jax.Array):
        adv_on = jnp.asarray(
            state.step >= self.adversarial_warmup, jnp.float32
        )
        (_, (metrics, flat, codes, recon)), grads = jax.value_and_grad(
            self._losses, has_aux=True
        )(state.params, state.disc_params, audio, adv_on)

        updates, opt_state = self.optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)

        # discriminator step on the stop-gradiented reconstruction
        disc_params, disc_opt_state = state.disc_params, state.disc_opt_state
        if self.discriminator is not None:
            from naturalspeech2_tpu.models.discriminator import (
                discriminator_hinge_loss,
            )

            fake = jax.lax.stop_gradient(recon)
            d_audio = audio.astype(jnp.bfloat16) if self.amp else audio
            d_fake = fake.astype(jnp.bfloat16) if self.amp else fake

            def d_loss(dp):
                run_dp = dp
                if self.amp:
                    run_dp = jax.tree_util.tree_map(
                        lambda p: p.astype(jnp.bfloat16)
                        if p.dtype == jnp.float32 else p, dp,
                    )
                f32 = lambda t: [x.astype(jnp.float32) for x in t]
                real_logits, _ = self.discriminator.apply(
                    {"params": run_dp}, d_audio
                )
                fake_logits, _ = self.discriminator.apply(
                    {"params": run_dp}, d_fake
                )
                return discriminator_hinge_loss(
                    f32(real_logits), f32(fake_logits)
                )

            # the whole D step sits under the warmup cond: zero-scaled grads
            # would still pay two D forwards + a backward per warmup step
            # and advance Adam's counts while D is frozen
            def d_update(operand):
                dp, dos = operand
                d_val, d_grads = jax.value_and_grad(d_loss)(dp)
                d_updates, dos = self.disc_optimizer.update(d_grads, dos, dp)
                return optax.apply_updates(dp, d_updates), dos, d_val

            def d_skip(operand):
                dp, dos = operand
                return dp, dos, jnp.zeros(())

            disc_params, disc_opt_state, d_val = jax.lax.cond(
                adv_on > 0, d_update, d_skip, (disc_params, disc_opt_state)
            )
            metrics["adv_d"] = d_val

        # EMA codebook update from assignment statistics (per stage, the
        # residual BEFORE that stage is what the codebook quantizes)
        codebooks = state.params["codebooks"]
        num_q, K, d = codebooks.shape
        residual = flat
        ema = state.codebook_ema
        count = state.codebook_count
        decay = self.decay
        # per-step key for dead-code restarts; PRNGKey(const) traces once
        restart_key = jax.random.fold_in(
            jax.random.PRNGKey(self.seed ^ 0x5EED), state.step
        )
        new_ema, new_count, new_cb = [], [], []
        perps, usages, restarts_n = [], [], []
        for qi in range(num_q):
            onehot = jax.nn.one_hot(codes[:, qi], K, dtype=flat.dtype)  # [m, K]
            sums = onehot.T @ residual  # [K, d]
            cnts = onehot.sum(axis=0)  # [K]
            e = ema[qi] * decay + sums * (1 - decay)
            c = count[qi] * decay + cnts * (1 - decay)
            # dead codes keep their old entry; live codes move to EMA mean
            cb_q = jnp.where(
                (c > 1e-3)[:, None], e / jnp.maximum(c, 1e-3)[:, None],
                codebooks[qi],
            )
            if self.dead_code_threshold > 0:
                # SoundStream random-restart: re-seed codes whose EMA count
                # has decayed below threshold from random residuals of THIS
                # batch, and reset their statistics so the restart sticks
                # for ~1/(1-decay) steps before it can trigger again
                dead = c < self.dead_code_threshold
                idx = jax.random.randint(
                    jax.random.fold_in(restart_key, qi), (K,), 0,
                    residual.shape[0],
                )
                seeds = jax.lax.stop_gradient(residual[idx])
                cb_q = jnp.where(dead[:, None], seeds, cb_q)
                e = jnp.where(dead[:, None], seeds * 1.0, e)
                c = jnp.where(dead, jnp.ones_like(c), c)
                restarts_n.append(dead.sum())
            new_ema.append(e)
            new_count.append(c)
            new_cb.append(cb_q)
            # codebook-health metrics from this batch's assignment histogram
            p = cnts / jnp.maximum(cnts.sum(), 1.0)
            perps.append(jnp.exp(-jnp.sum(p * jnp.log(jnp.maximum(p, 1e-10)))))
            usages.append((cnts > 0).mean())
            residual = residual - codebooks[qi][codes[:, qi]]

        metrics["perplexity"] = jnp.stack(perps).mean()
        metrics["usage"] = jnp.stack(usages).mean()
        if restarts_n:
            metrics["restarts"] = jnp.stack(restarts_n).sum()

        params = dict(params)
        params["codebooks"] = jnp.stack(new_cb)

        new_state = CodecTrainState(
            step=state.step + 1,
            params=params,
            opt_state=opt_state,
            codebook_ema=jnp.stack(new_ema),
            codebook_count=jnp.stack(new_count),
            disc_params=disc_params,
            disc_opt_state=disc_opt_state,
        )
        return new_state, metrics

    # ------------------------------------------------------------------ #

    def _train_chunk(self, state: CodecTrainState, audio_k: jax.Array):
        """K steps under one `lax.scan`: ONE host→device upload and ONE
        dispatch per K steps. Through a high-latency device tunnel the
        per-call upload+sync dominates the (54 ms) step itself — measured
        3.7 s/step dispatched singly vs ~0.1 s/step chunked."""

        def body(st, a):
            return self._train_step(st, a)

        state, ms = jax.lax.scan(body, state, audio_k)
        return state, jax.tree_util.tree_map(lambda x: x[-1], ms)

    def train(self, num_steps: int, log_every: int = 50,
              steps_per_jit: int = 8):
        batch = next(self.batches)
        if self.state is None:
            self.init_state(batch)
        k = max(1, steps_per_jit)
        if self._step_fn is None:
            self._step_fn = jax.jit(self._train_chunk, donate_argnums=(0,))
        bsh = NamedSharding(self.mesh, P(None, DATA_AXIS))

        step = int(self.state.step)  # one sync; tracked host-side after
        while step < num_steps:
            m = min(k, num_steps - step)
            stack = [np.asarray(batch)]
            for _ in range(m - 1):
                stack.append(np.asarray(next(self.batches)))
            # pad the tail chunk to the fixed scan length with repeats —
            # a shorter last chunk would recompile; overshooting num_steps
            # by < k repeated-data steps is harmless for this trainer
            while len(stack) < k:
                stack.append(stack[-1])
            audio = jax.device_put(np.stack(stack), bsh)
            self.state, metrics = self._step_fn(self.state, audio)
            step += k
            if (step // k) % max(1, log_every // k) == 0 and is_main_process():
                print(
                    f"codec step {step}: loss {float(metrics['loss']):.4f} "
                    f"(wav {float(metrics['wav_l1']):.4f}, "
                    f"stft {float(metrics['stft']):.4f}, "
                    f"perp {float(metrics['perplexity']):.1f}, "
                    f"usage {float(metrics['usage']):.2f}, "
                    f"restarts {int(metrics.get('restarts', 0))})"
                )
            batch = next(self.batches)
        step = int(self.state.step)  # final sync
        return self.state

    def save(self, milestone) -> str:
        """Full-train-state checkpoint: generator + discriminator params,
        BOTH optimizer states and the codebook EMA statistics, so ``load``
        resumes bit-for-bit (the reference never trains its codec — Encodec
        arrives pretrained — so this has no reference analogue)."""
        payload = {
            "step": np.asarray(self.state.step),
            "params": flax.serialization.to_state_dict(self.state.params),
            "opt_state": flax.serialization.to_state_dict(self.state.opt_state),
            "codebook_ema": np.asarray(self.state.codebook_ema),
            "codebook_count": np.asarray(self.state.codebook_count),
        }
        if self.state.disc_params is not None:
            payload["disc_params"] = flax.serialization.to_state_dict(
                self.state.disc_params
            )
            payload["disc_opt_state"] = flax.serialization.to_state_dict(
                self.state.disc_opt_state
            )
        path = self.results_folder / f"codec-{milestone}.ckpt"
        path.write_bytes(flax.serialization.msgpack_serialize(payload))
        return str(path)

    def latest_checkpoint(self) -> Optional[str]:
        ckpts = sorted(
            self.results_folder.glob("codec-*.ckpt"),
            key=lambda p: p.stat().st_mtime,
        )
        return str(ckpts[-1]) if ckpts else None

    def load(self, path, example_batch: Optional[np.ndarray] = None):
        """Restore a ``save()`` checkpoint. If the trainer has no state yet
        an ``example_batch`` (or the batch iterator) provides the template
        shapes. Old checkpoints without optimizer/EMA entries restore what
        they have and keep fresh values for the rest."""
        if self.state is None:
            if example_batch is None:
                example_batch = next(self.batches)
            self.init_state(example_batch)
        payload = flax.serialization.msgpack_restore(Path(path).read_bytes())
        s = self.state
        restore = flax.serialization.from_state_dict
        self.state = CodecTrainState(
            step=jnp.asarray(payload["step"]),
            params=restore(s.params, payload["params"]),
            opt_state=(
                restore(s.opt_state, payload["opt_state"])
                if "opt_state" in payload else s.opt_state
            ),
            codebook_ema=(
                jnp.asarray(payload["codebook_ema"])
                if "codebook_ema" in payload else s.codebook_ema
            ),
            codebook_count=(
                jnp.asarray(payload["codebook_count"])
                if "codebook_count" in payload else s.codebook_count
            ),
            disc_params=(
                restore(s.disc_params, payload["disc_params"])
                if "disc_params" in payload and s.disc_params is not None
                else s.disc_params
            ),
            disc_opt_state=(
                restore(s.disc_opt_state, payload["disc_opt_state"])
                if "disc_opt_state" in payload and s.disc_opt_state is not None
                else s.disc_opt_state
            ),
        )
        return self.state
