"""Codec pre-training harness.

The reference uses a frozen pretrained Encodec (external compiled package);
this trainer makes the JAX `SoundStream` codec trainable end-to-end on TPU:
waveform L1 + multi-resolution STFT loss + commitment loss, straight-through
RVQ, EMA codebook updates (SoundStream-style: codebook entries track the
EMA of their assigned residuals — VQ codebooks learn by assignment
statistics, not backprop), data-sharded jitted step over the mesh.

Adversarial (discriminator) training is a quality refinement left for a
later round; the losses here train a functional codec from scratch.
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
        codebook_ema_decay: float = 0.99,
        max_grad_norm: float = 1.0,
        mesh=None,
        results_folder: str = "./results_codec",
        seed: int = 0,
    ):
        self.codec = codec
        self.batches = batches
        self.commitment_weight = commitment_weight
        self.stft_weight = stft_weight
        self.wav_weight = wav_weight
        self.decay = codebook_ema_decay
        self.mesh = mesh if mesh is not None else make_mesh()
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(max_grad_norm), optax.adam(lr)
        )
        self.results_folder = Path(results_folder)
        self.results_folder.mkdir(parents=True, exist_ok=True)
        self.seed = seed
        self.state: Optional[CodecTrainState] = None
        self._step_fn = None

    def init_state(self, example_batch: np.ndarray) -> CodecTrainState:
        key = jax.random.PRNGKey(self.seed)
        params = self.codec.init(key, jnp.asarray(example_batch))["params"]
        codebooks = params["codebooks"]
        self.state = CodecTrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=self.optimizer.init(params),
            codebook_ema=jnp.copy(codebooks),  # distinct buffer — donation-safe
            codebook_count=jnp.ones(codebooks.shape[:2], jnp.float32),
        )
        return self.state

    # ------------------------------------------------------------------ #

    def _losses(self, params, audio):
        codec = self.codec
        latents = codec.apply(
            {"params": params}, audio, method=codec.encode_latents
        )
        b, n, d = latents.shape
        flat = latents.reshape(b * n, d)
        quantized, codes = rvq_xla(flat, params["codebooks"])
        quantized_st = flat + jax.lax.stop_gradient(quantized - flat)
        recon = codec.apply(
            {"params": params},
            quantized_st.reshape(b, n, d),
            method=codec.decode,
        )
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
        return loss, (metrics, flat, codes)

    def _train_step(self, state: CodecTrainState, audio: jax.Array):
        (_, (metrics, flat, codes)), grads = jax.value_and_grad(
            self._losses, has_aux=True
        )(state.params, audio)

        updates, opt_state = self.optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)

        # EMA codebook update from assignment statistics (per stage, the
        # residual BEFORE that stage is what the codebook quantizes)
        codebooks = state.params["codebooks"]
        num_q, K, d = codebooks.shape
        residual = flat
        ema = state.codebook_ema
        count = state.codebook_count
        decay = self.decay
        new_ema, new_count, new_cb = [], [], []
        for qi in range(num_q):
            onehot = jax.nn.one_hot(codes[:, qi], K, dtype=flat.dtype)  # [m, K]
            sums = onehot.T @ residual  # [K, d]
            cnts = onehot.sum(axis=0)  # [K]
            e = ema[qi] * decay + sums * (1 - decay)
            c = count[qi] * decay + cnts * (1 - decay)
            new_ema.append(e)
            new_count.append(c)
            # dead codes keep their old entry; live codes move to EMA mean
            cb_q = jnp.where(
                (c > 1e-3)[:, None], e / jnp.maximum(c, 1e-3)[:, None],
                codebooks[qi],
            )
            new_cb.append(cb_q)
            residual = residual - codebooks[qi][codes[:, qi]]

        params = dict(params)
        params["codebooks"] = jnp.stack(new_cb)

        new_state = CodecTrainState(
            step=state.step + 1,
            params=params,
            opt_state=opt_state,
            codebook_ema=jnp.stack(new_ema),
            codebook_count=jnp.stack(new_count),
        )
        return new_state, metrics

    # ------------------------------------------------------------------ #

    def train(self, num_steps: int, log_every: int = 50):
        batch = next(self.batches)
        if self.state is None:
            self.init_state(batch)
        if self._step_fn is None:
            self._step_fn = jax.jit(self._train_step, donate_argnums=(0,))
        bsh = NamedSharding(self.mesh, P(DATA_AXIS))

        while int(self.state.step) < num_steps:
            audio = jax.device_put(np.asarray(batch), bsh)
            self.state, metrics = self._step_fn(self.state, audio)
            step = int(self.state.step)
            if step % log_every == 0 and is_main_process():
                print(
                    f"codec step {step}: loss {float(metrics['loss']):.4f} "
                    f"(wav {float(metrics['wav_l1']):.4f}, "
                    f"stft {float(metrics['stft']):.4f})"
                )
            batch = next(self.batches)
        return self.state

    def save(self, milestone) -> str:
        payload = {
            "step": np.asarray(self.state.step),
            "params": flax.serialization.to_state_dict(self.state.params),
        }
        path = self.results_folder / f"codec-{milestone}.ckpt"
        path.write_bytes(flax.serialization.msgpack_serialize(payload))
        return str(path)
