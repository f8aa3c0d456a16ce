"""NaturalSpeech 2 — continuous-latent gaussian diffusion wrapper.

TPU-native counterpart of the reference `NaturalSpeech2`
(`/root/reference/naturalspeech2_pytorch/naturalspeech2_pytorch.py:1160-1684`):
v/eps/x0 objectives over codec latents, sigmoid/cosine/linear γ schedules,
min-SNR loss weighting, optional RVQ cross-entropy, classifier-free
guidance, DDIM (default) and DDPM ancestral samplers.

TPU-first re-design:
- the 1000-step sampling loop is a ``lax.scan`` over timestep pairs — one
  compiled program, no per-step Python dispatch (ref loops in Python with
  tqdm, :1392);
- guided sampling fuses cond/uncond into one batch-doubled forward
  (see `denoiser.forward_with_cond_scale`);
- randomness is explicit PRNG keys (flax rng collections 'times', 'noise',
  'cfg', plus a key argument for sampling).

Known reference defects intentionally fixed here (SURVEY.md §7):
- `ddpm_sample` uses a working `jnp.expm1` and a 3-D noise mask (ref's bare
  ``expm1``/4-D mask at :1361,:1370 crash);
- the conditional aux loss (duration/pitch/align) IS added to the returned
  training loss (the reference computes then drops it, :1600-1684).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from naturalspeech2_tpu.models.codec import SoundStream
from naturalspeech2_tpu.models.denoiser import Model, forward_with_cond_scale
from naturalspeech2_tpu.ops.schedules import (
    gamma_to_alpha_sigma,
    gamma_to_log_snr,
    get_schedule,
)
from naturalspeech2_tpu.utils.helpers import (
    generate_mask_from_repeats,
    safe_div,
    safe_log,
)


class NaturalSpeech2(nn.Module):
    model: Model
    codec: Optional[SoundStream] = None
    tokenizer: Optional[Any] = None  # host-side Tokenizer for List[str] text
    target_sample_hz: Optional[int] = None
    calc_pitch_with_pyworld: bool = True  # API-parity knob (ref :1189):
    # True → ACF estimator (pyworld-style), False → Kaldi-style NCCF+Viterbi
    # (the reference's torchaudio compute_kaldi_pitch path, :124-130)
    timesteps: int = 1000
    use_ddim: bool = True
    # explicit sampler choice: "ddim" | "ddpm" | "dpmpp" (DPM-Solver++(2M),
    # the few-step fast path — no reference analogue). None → use_ddim.
    sampler: Optional[str] = None
    noise_schedule: str = "sigmoid"
    objective: str = "v"
    # probability of feeding the model its own x₀ estimate during training
    # (only active when model.self_cond=True). The reference declares this
    # knob (:1179,1279) but never implements the mechanism (README TODO).
    train_prob_self_cond: float = 0.9
    schedule_kwargs: Optional[dict] = None
    time_difference: float = 0.0
    min_snr_loss_weight: bool = True
    min_snr_gamma: float = 5.0
    rvq_cross_entropy_loss_weight: float = 0.0
    dim_codebook: int = 128
    duration_pitch_dim: int = 512
    aligner_dim_in: int = 80
    aligner_dim_hidden: int = 512
    aligner_attn_channels: int = 80
    num_phoneme_tokens: int = 150
    pitch_emb_dim: int = 256
    pitch_emb_pp_hidden_dim: int = 512
    mel_hop_length: int = 160
    audio_to_mel_kwargs: Optional[dict] = None  # extra STFT/mel params (ref :1190)
    scale: float = 1.0
    duration_loss_weight: float = 1.0
    pitch_loss_weight: float = 1.0
    # Space the pitch trunk regresses in. The reference's L1 is on RAW Hz
    # (:1590): with F0 targets of 50-400 Hz that loss is ~100× the diffusion
    # loss, so when the aux losses are actually added to the total (the
    # reference silently drops them, :1671/:1684 — PARITY defect #12) the
    # pitch gradient drowns every other objective (measured: pitch 23-38 vs
    # diffusion 0.2-0.3 at step 20k, round-4 capstone). "log" (default): the
    # trunk predicts log1p(F0 Hz) — unvoiced 0 Hz maps to 0, and 50-400 Hz
    # spans ~3.9-6.0, commensurate with the other losses; sampling converts
    # back with expm1 before the f0_to_coarse conditioning embed. "hz"
    # reproduces the reference byte-for-byte (golden parity tests).
    pitch_space: str = "log"
    aligner_loss_weight: float = 1.0
    aligner_bin_loss_weight: float = 0.0
    # The reference encodes text WITHOUT a padding mask in the training
    # forward (text_mask is built at :1535 but only the aligner sees it;
    # :1539 calls `self.phoneme_enc(text)`), so padded positions attend
    # into the real ones. Default False reproduces that exactly — required
    # for imported reference checkpoints (utils/torch_import.py) to give
    # reference outputs. True opts into masked self-attention.
    mask_phoneme_encoder: bool = False
    # The reference's duration/pitch L1 losses average over EVERY phoneme
    # slot including padding (`F.l1_loss(aln_hard, duration_pred)` :1587,
    # :1590 — no text_mask applied). Because padded targets are 0, that
    # gradient pushes the shared conv trunk toward 0 everywhere and — with
    # the reference's ReLU head (:466) — can permanently kill the predictor
    # (observed: 20k steps with duration_pred ≡ 0 and the loss frozen at
    # mean(aln_hard)). The reference never notices because it also drops
    # aux_loss from the returned total (:1671/:1684). Default True masks
    # both losses to real phoneme positions; False reproduces the
    # reference's unmasked mean exactly (used by the golden parity tests).
    mask_duration_pitch_loss: bool = True
    # size overrides for the conditional submodules (test-scale / ablations);
    # defaults reproduce the reference's hardcoded 512-dim stacks
    phoneme_enc_kwargs: Optional[dict] = None
    prompt_enc_kwargs: Optional[dict] = None
    duration_pitch_kwargs: Optional[dict] = None

    @property
    def conditional(self) -> bool:
        return self.model.condition_on_prompt

    @property
    def dim(self) -> int:
        return self.codec.codebook_dim if self.codec is not None else self.model.dim

    @property
    def sample_hz(self) -> int:
        return (
            self.codec.target_sample_hz
            if self.codec is not None
            else self.target_sample_hz
        )

    def gamma_schedule(self, times: jax.Array) -> jax.Array:
        fn = get_schedule(self.noise_schedule)
        return fn(times, **(self.schedule_kwargs or {}))

    def setup(self):
        assert self.objective in {"x0", "eps", "v"}
        assert self.scale <= 1.0
        assert self.sampler in {None, "ddim", "ddpm", "dpmpp"}, self.sampler
        if self.codec is not None:
            assert self.model.dim == self.codec.codebook_dim, (
                f"model dim {self.model.dim} must equal codec codebook dim "
                f"{self.codec.codebook_dim}"
            )
        if self.conditional:
            from naturalspeech2_tpu.models.aligner import (
                Aligner,
                BinLoss,
                ForwardSumLoss,
            )
            from naturalspeech2_tpu.models.encoders import (
                DurationPitchPredictor,
                PhonemeEncoder,
                SpeechPromptEncoder,
            )

            dim_codebook = (
                self.codec.codebook_dim if self.codec is not None
                else self.dim_codebook
            )
            self.phoneme_enc = PhonemeEncoder(
                num_tokens=self.num_phoneme_tokens,
                **(self.phoneme_enc_kwargs or {}),
            )
            self.prompt_enc = SpeechPromptEncoder(
                dim_codebook=dim_codebook, **(self.prompt_enc_kwargs or {})
            )
            self.duration_pitch = DurationPitchPredictor(
                dim=self.duration_pitch_dim, **(self.duration_pitch_kwargs or {})
            )
            self.aligner = Aligner(
                dim_in=self.aligner_dim_in,
                dim_hidden=self.aligner_dim_hidden,
                attn_channels=self.aligner_attn_channels,
            )
            self.pitch_emb = nn.Embed(self.pitch_emb_dim, self.pitch_emb_pp_hidden_dim)
            self.aligner_loss = ForwardSumLoss()
            self.bin_loss = BinLoss()

    # ------------------------------------------------------------------ #
    # conditioning helpers
    # ------------------------------------------------------------------ #

    def process_prompt(self, prompt: jax.Array) -> jax.Array:
        """Raw 2-D prompt audio → codec latents, no grad (ref :1433-1447)."""
        if prompt.ndim == 2:
            assert self.codec is not None
            latents, _, _ = self.codec(
                prompt, return_encoded=True, curtail_from_left=True
            )
            prompt = jax.lax.stop_gradient(latents)
        return prompt

    def expand_encodings(
        self, phoneme_enc: jax.Array, attn: jax.Array, pitch: jax.Array
    ) -> jax.Array:
        """Expand phoneme encodings + pitch embedding to frame rate through
        the alignment mask (ref :1449-1455).

        phoneme_enc ``[b, t_x, d]``, attn ``[b, t_x, n]`` (float),
        pitch ``[b, 1, n]``. Returns ``[b, n, d]``.
        """
        from naturalspeech2_tpu.ops.pitch import f0_to_coarse

        expanded_dur = jnp.einsum("btn,btd->bnd", attn, phoneme_enc)
        pitch_coarse = f0_to_coarse(pitch[:, 0], f0_bin=self.pitch_emb_dim)
        pitch_emb = self.pitch_emb(pitch_coarse)  # [b, n_frames, d]
        # frame-level pitch embedding averaged onto phonemes then re-expanded
        # — the reference expands a phoneme-rate pitch embedding through the
        # same attn mask; here pitch arrives at phoneme rate already when
        # averaged (training) or predicted (sampling), so expand directly.
        expanded_pitch = jnp.einsum("btn,btd->bnd", attn, pitch_emb)
        return expanded_dur + expanded_pitch

    # ------------------------------------------------------------------ #
    # training forward
    # ------------------------------------------------------------------ #

    def __call__(
        self,
        audio: jax.Array,
        text: Optional[jax.Array] = None,
        text_lens: Optional[jax.Array] = None,
        mel: Optional[jax.Array] = None,
        mel_lens: Optional[jax.Array] = None,
        codes: Optional[jax.Array] = None,
        prompt: Optional[jax.Array] = None,
        pitch: Optional[jax.Array] = None,
        deterministic: bool = False,
        times: Optional[jax.Array] = None,
        noise: Optional[jax.Array] = None,
    ) -> Dict[str, jax.Array]:
        """Training losses. Returns dict with 'loss' (total), 'diffusion',
        and (conditional) 'duration', 'pitch', 'align' components
        (ref forward :1503-1684).

        ``times``/``noise`` inject the diffusion draws explicitly instead of
        drawing from the 'times'/'noise' rng collections — deterministic
        replay for parity tests and debugging (the reference draws
        internally, :1621-1626)."""
        prompt_enc = None
        cond = None
        aux_loss = 0.0
        aux = {}

        if self.conditional:
            (
                prompt_enc,
                cond,
                aux_loss,
                aux,
            ) = self._conditional_inputs_and_losses(
                audio, text, text_lens, mel, mel_lens, prompt, pitch,
                deterministic=deterministic,
            )

        # raw audio → codec latents (frozen codec, ref :1605-1611)
        if audio.ndim == 2:
            assert self.codec is not None
            latents, codes, _ = self.codec(audio, return_encoded=True)
            audio = jax.lax.stop_gradient(latents)
            codes = jax.lax.stop_gradient(codes)

        b, n, d = audio.shape
        assert d == self.dim

        if times is None:
            times = jax.random.uniform(self.make_rng("times"), (b,))
        if noise is None:
            noise = jax.random.normal(
                self.make_rng("noise"), audio.shape, audio.dtype
            )

        gamma = self.gamma_schedule(times)[:, None, None]
        alpha, sigma = gamma_to_alpha_sigma(gamma, self.scale)
        noised = alpha * audio + sigma * noise

        x_self_cond = None
        if self.model.self_cond:
            # with prob p, bootstrap an x₀ estimate (stop-grad, no
            # self-cond input) and condition the real pass on it. Both
            # forwards must share ONE pair of CFG drop masks — independent
            # draws would train the conditioned prediction on a bootstrap
            # computed under different prompt/cond dropping (inference
            # always derives x_self_cond from the same CFG configuration).
            drop_masks = None
            if (
                self.model.condition_on_prompt
                and self.model.cond_drop_prob > 0.0
                and not deterministic
            ):
                from naturalspeech2_tpu.utils.helpers import prob_mask_like

                p = self.model.cond_drop_prob
                drop_masks = (
                    prob_mask_like(self.make_rng("cfg"), (b,), p),
                    prob_mask_like(self.make_rng("cfg"), (b,), p),
                )
            if deterministic:
                # eval-loss path: no 'self_cond' rng required — condition
                # every sample on the bootstrap (the inference analogue,
                # where x_self_cond always carries the previous estimate)
                use_sc = jnp.ones((b,), dtype=bool)
            else:
                use_sc = jax.random.bernoulli(
                    self.make_rng("self_cond"), self.train_prob_self_cond, (b,)
                )
            est = self.model(
                noised, times, prompt=prompt_enc, cond=cond,
                cond_drop_mask=drop_masks,
                deterministic=deterministic,
            )
            if self.objective == "x0":
                x0_est = est
            elif self.objective == "eps":
                x0_est = safe_div(noised - sigma * est, alpha)
            else:
                x0_est = alpha * noised - sigma * est
            x_self_cond = jnp.where(
                use_sc[:, None, None], jax.lax.stop_gradient(x0_est), 0.0
            )

        pred = self.model(
            noised, times, prompt=prompt_enc, cond=cond,
            x_self_cond=x_self_cond,
            cond_drop_mask=drop_masks if self.model.self_cond else None,
            deterministic=deterministic,
        )

        if self.objective == "eps":
            target = noise
        elif self.objective == "x0":
            target = audio
        else:  # v
            target = alpha * noise - sigma * audio

        loss = ((pred - target) ** 2).mean(axis=(1, 2))  # per-sample

        # min-SNR weighting (ref :1651-1666). Documented divergence: the
        # reference multiplies its [b]-shaped reduced loss by a
        # [b,1,1]-shaped weight, broadcasting an outer product whose mean
        # is mean(mse)·mean(weight) — sample i's weight decouples from
        # sample i's loss whenever batch > 1. We weight per-sample (the
        # min-SNR paper's formula); tests/test_golden_full_forward.py
        # characterises the reference's actual value.
        snr = (alpha * alpha) / (sigma * sigma)
        snr = snr[:, 0, 0]
        clipped_snr = (
            jnp.minimum(snr, self.min_snr_gamma) if self.min_snr_loss_weight else snr
        )
        if self.objective == "eps":
            loss_weight = clipped_snr / snr
        elif self.objective == "x0":
            loss_weight = clipped_snr
        else:  # v
            loss_weight = clipped_snr / (snr + 1)

        diffusion_loss = (loss * loss_weight).mean()
        total = diffusion_loss + aux_loss

        losses = {"loss": total, "diffusion": diffusion_loss, **aux}

        if self.rvq_cross_entropy_loss_weight > 0 and codes is not None:
            if self.objective == "x0":
                x_start = pred
            elif self.objective == "eps":
                x_start = safe_div(audio - sigma * pred, alpha)
            else:
                x_start = alpha * audio - sigma * pred
            _, ce_loss = self.codec.rq(x_start, codes)
            losses["rvq_ce"] = ce_loss
            losses["loss"] = total + self.rvq_cross_entropy_loss_weight * ce_loss

        return losses

    def _conditional_inputs_and_losses(
        self, audio, text, text_lens, mel, mel_lens, prompt, pitch,
        deterministic: bool,
    ):
        from naturalspeech2_tpu.ops.mel import audio_to_mel
        from naturalspeech2_tpu.ops.pitch import compute_pitch
        from naturalspeech2_tpu.utils.helpers import (
            average_over_durations,
            create_mask,
        )

        assert prompt is not None and text is not None
        batch = prompt.shape[0]
        text_max_length = text.shape[-1]
        if text_lens is None:
            text_lens = jnp.full((batch,), text_max_length, dtype=jnp.int32)
        text_lens = jnp.minimum(text_lens, text_max_length)
        text_mask = create_mask(text_lens, text_max_length)

        prompt_latents = self.process_prompt(prompt)
        prompt_enc = self.prompt_enc(prompt_latents, deterministic=deterministic)
        phoneme_enc = self.phoneme_enc(
            text,
            mask=text_mask if self.mask_phoneme_encoder else None,
            deterministic=deterministic,
        )

        if pitch is None:
            assert audio.ndim == 2
            # backend selection mirrors the reference knob (:1189,1547):
            # pyworld-style ACF estimator vs Kaldi-style NCCF+Viterbi
            # (`compute_pitch_pytorch`'s torchaudio Kaldi path, :124-130)
            if self.calc_pitch_with_pyworld:
                pitch = compute_pitch(
                    audio,
                    sample_rate=self.sample_hz,
                    hop_length=self.mel_hop_length,
                )
            else:
                from naturalspeech2_tpu.ops.pitch import compute_pitch_nccf

                pitch = compute_pitch_nccf(
                    audio,
                    sample_rate=self.sample_hz,
                    hop_length=self.mel_hop_length,
                )
            pitch = pitch[:, None, :]  # [b, 1, frames]

        if mel is None:
            assert audio.ndim == 2
            mel = audio_to_mel(
                audio,
                **{
                    "sample_rate": self.sample_hz,
                    "n_mels": self.aligner_dim_in,
                    "hop_length": self.mel_hop_length,
                    **(self.audio_to_mel_kwargs or {}),
                },
            )  # [b, n_mels, frames]
            mel = mel[..., : pitch.shape[-1]]
        pitch = pitch[..., : mel.shape[-1]]

        mel_max_length = mel.shape[-1]
        if mel_lens is None:
            mel_lens = jnp.full((batch,), mel_max_length, dtype=jnp.int32)
        mel_lens = jnp.minimum(mel_lens, mel_max_length)
        mel_mask = create_mask(mel_lens, mel_max_length)

        aln_hard, aln_soft, aln_log, aln_mask = self.aligner(
            phoneme_enc, text_mask, mel, mel_mask
        )
        duration_pred, pitch_pred = self.duration_pitch(
            phoneme_enc, prompt_enc, deterministic=deterministic
        )

        pitch_phon = average_over_durations(pitch, aln_hard)  # [b, 1, t_x]
        cond = self.expand_encodings(
            phoneme_enc, aln_mask.astype(phoneme_enc.dtype), pitch_phon
        )

        # pitch regression target in the configured space; conditioning
        # (expand_encodings → f0_to_coarse) always sees raw Hz
        if self.pitch_space == "log":
            pitch_target = jnp.log1p(pitch_phon[:, 0])
        else:
            pitch_target = pitch_phon[:, 0]
        if self.mask_duration_pitch_loss:
            tmask = text_mask.astype(duration_pred.dtype)
            denom = jnp.maximum(tmask.sum(), 1.0)
            duration_loss = (jnp.abs(aln_hard - duration_pred) * tmask).sum() / denom
            pitch_loss = (
                jnp.abs(pitch_target - pitch_pred) * tmask
            ).sum() / denom
        else:  # reference :1587/:1590 — unmasked mean over padding too
            duration_loss = jnp.abs(aln_hard - duration_pred).mean()
            pitch_loss = jnp.abs(pitch_target - pitch_pred).mean()
        align_loss = self.aligner_loss(aln_log, text_lens, mel_lens)
        if self.aligner_bin_loss_weight > 0.0:
            align_loss = align_loss + (
                self.bin_loss(aln_mask, aln_log, text_lens)
                * self.aligner_bin_loss_weight
            )

        aux_loss = (
            duration_loss * self.duration_loss_weight
            + pitch_loss * self.pitch_loss_weight
            + align_loss * self.aligner_loss_weight
        )
        aux = {
            "duration": duration_loss,
            "pitch": pitch_loss,
            "align": align_loss,
        }
        return prompt_enc, cond, aux_loss, aux

    # ------------------------------------------------------------------ #
    # sampling-time conditioning (text+prompt → cond tensors)
    # ------------------------------------------------------------------ #

    def conditioning_for_sample(
        self,
        prompt: jax.Array,
        text: jax.Array,
        text_lens: Optional[jax.Array] = None,
        max_frames: Optional[int] = None,
        pitch: Optional[jax.Array] = None,
        duration: Optional[jax.Array] = None,
    ):
        """Encode prompt + text, predict duration/pitch, build the aligned
        frame condition (ref sample :1467-1483). ``max_frames`` is the static
        frame budget for the duration expansion (defaults to 2× text budget).

        ``pitch``/``duration`` (``[b, t_x]`` per-phoneme F0 Hz / frame
        counts) override the predictors — the F0/singing-conditioning path
        (BASELINE config 5): drive the melody explicitly, keep the timbre
        from the prompt. Returns (prompt_enc, cond, duration)."""
        prompt_latents = self.process_prompt(prompt)
        prompt_enc = self.prompt_enc(prompt_latents, deterministic=True)
        # mirror the TRAINING-side encoder masking exactly: a model trained
        # with mask_phoneme_encoder=True must also sample with the padded
        # positions masked out of self-attention
        text_mask = None
        if self.mask_phoneme_encoder and text_lens is not None:
            from naturalspeech2_tpu.utils.helpers import create_mask

            text_mask = create_mask(
                jnp.minimum(text_lens, text.shape[-1]), text.shape[-1]
            )
        phoneme_enc = self.phoneme_enc(
            text, mask=text_mask, deterministic=True
        )

        duration_pred, pitch_pred = self.duration_pitch(
            phoneme_enc, prompt_enc, deterministic=True
        )
        duration = duration_pred if duration is None else duration
        if pitch is None:
            # predictor output → Hz (the explicit `pitch` override is
            # always given in Hz, whatever the training space)
            pitch = (
                jnp.expm1(pitch_pred)
                if self.pitch_space == "log" else pitch_pred
            )
        pitch = pitch[:, None, :]

        if max_frames is None:
            max_frames = text.shape[-1] * 2
        # truncate, not round: the reference's generate_mask_from_repeats
        # casts float duration predictions with `repeats.int()` (:88), and
        # imported reference checkpoints must reproduce its frame layout
        aln_mask = generate_mask_from_repeats(
            duration.astype(jnp.int32), max_frames
        ).astype(phoneme_enc.dtype)

        cond = self.expand_encodings(phoneme_enc, aln_mask, pitch)
        return prompt_enc, cond, duration


# ---------------------------------------------------------------------- #
# samplers — pure functions, lax.scan over timestep pairs
# ---------------------------------------------------------------------- #


def get_sampling_time_pairs(timesteps: int) -> jax.Array:
    """(t, t_next) pairs on linspace 1→0 (ref :1303-1308). ``[T, 2]``."""
    times = jnp.linspace(1.0, 0.0, timesteps + 1)
    return jnp.stack([times[:-1], times[1:]], axis=-1)


def _reconstruct_x0(objective, audio, model_output, alpha, sigma):
    if objective == "x0":
        return model_output
    if objective == "eps":
        return safe_div(audio - sigma * model_output, alpha)
    return alpha * audio - sigma * model_output  # v


def dpmpp_sample(
    denoise_fn: Callable[[jax.Array, jax.Array], jax.Array],
    key: jax.Array,
    shape: Tuple[int, ...],
    *,
    timesteps: int,
    gamma_schedule: Callable[[jax.Array], jax.Array],
    objective: str = "v",
    scale: float = 1.0,
    time_difference: float = 0.0,
    self_cond: bool = False,
) -> jax.Array:
    """DPM-Solver++(2M): 2nd-order multistep ODE solver in the
    data-prediction (x₀) parameterization — one model call per step, like
    DDIM, but materially more accurate at low step counts (8–25), so
    serving can cut denoise steps ~4× at matched sample quality. No
    reference analogue (the reference ships ddpm/ddim only,
    naturalspeech2_pytorch.py:1310/:1379); same call signature as
    `ddim_sample` so it drops into `sample()`.

    Math (Lu et al. 2022, "DPM-Solver++", eq. 4.2/4.3): with λ = ½·logSNR,
    the variation-of-constants solution of the probability-flow ODE is
    x_s = (σ_s/σ_t)·x_t − α_s·(e^{−h}−1)·x̂₀ with h = λ_s − λ_t; the 2M
    scheme replaces x̂₀ with the linear multistep extrapolation
    D = (1 + 1/2r)·x̂₀(t) − (1/2r)·x̂₀(t_prev), r = h_prev/h. The first
    step (no history) is the 1st-order update, which in this
    parameterization is exactly DDIM."""
    audio0 = jax.random.normal(key, shape)
    pairs = get_sampling_time_pairs(timesteps)
    idxs = jnp.arange(timesteps)

    def lam_of(t):
        gamma = gamma_schedule(t)
        return 0.5 * gamma_to_log_snr(gamma, scale)

    def body(carry, inp):
        audio, x0_prev, lam_prev = carry
        pair, i = inp
        t, t_next = pair[0], pair[1]
        gamma = gamma_schedule(t)
        gamma_next = gamma_schedule(jnp.clip(t_next - time_difference, min=0.0))
        alpha, sigma = gamma_to_alpha_sigma(gamma, scale)
        alpha_next, sigma_next = gamma_to_alpha_sigma(gamma_next, scale)
        lam = 0.5 * gamma_to_log_snr(gamma, scale)
        lam_next = 0.5 * gamma_to_log_snr(gamma_next, scale)

        times = jnp.broadcast_to(t, (shape[0],))
        if self_cond:
            model_output = denoise_fn(audio, times, x0_prev)
        else:
            model_output = denoise_fn(audio, times)
        x0 = _reconstruct_x0(objective, audio, model_output, alpha, sigma)

        h = lam_next - lam
        h_prev = lam - lam_prev
        # 2nd-order multistep coefficient 1/(2r) = h/(2·h_prev). Degrade to
        # 1st order (pure x̂₀ — exactly DDIM) when the extrapolation is
        # ill-posed: the first step (no history), h_prev ≈ 0 (λ flat, e.g.
        # the clipped-log-SNR region at t≈1), or h = ∞ (γ(0) = 1 exactly,
        # the final step of schedules that reach zero noise).
        use_2nd = (i > 0) & jnp.isfinite(h) & (h_prev > 1e-8)
        ratio = jnp.where(use_2nd, h / jnp.maximum(h_prev, 1e-8), 0.0)
        data = x0 + ratio * (x0 - x0_prev) / 2.0
        audio = safe_div(sigma_next, sigma) * audio - alpha_next * jnp.expm1(
            -h
        ) * data
        return (audio, x0, lam), ()

    (audio, _, _), _ = jax.lax.scan(
        body, (audio0, jnp.zeros_like(audio0), lam_of(jnp.asarray(1.0))), (pairs, idxs)
    )
    return audio


def ddim_sample(
    denoise_fn: Callable[[jax.Array, jax.Array], jax.Array],
    key: jax.Array,
    shape: Tuple[int, ...],
    *,
    timesteps: int,
    gamma_schedule: Callable[[jax.Array], jax.Array],
    objective: str = "v",
    scale: float = 1.0,
    time_difference: float = 0.0,
    self_cond: bool = False,
) -> jax.Array:
    """DDIM sampler (ref :1379-1431) as one `lax.scan`.

    ``denoise_fn(audio, times)`` is the (already CFG-fused) model forward;
    with ``self_cond=True`` it is called as
    ``denoise_fn(audio, times, x_self_cond)`` with the previous step's x₀
    estimate (the mechanism the reference's vestigial ``last_latents``
    :1321,1390 gestures at but never implements)."""
    audio0 = jax.random.normal(key, shape)
    pairs = get_sampling_time_pairs(timesteps)

    def body(carry, pair):
        audio, x_start_prev = carry
        t, t_next = pair[0], pair[1]
        gamma = gamma_schedule(t)
        gamma_next = gamma_schedule(jnp.clip(t_next - time_difference, min=0.0))
        alpha, sigma = gamma_to_alpha_sigma(gamma, scale)
        alpha_next, sigma_next = gamma_to_alpha_sigma(gamma_next, scale)

        times = jnp.broadcast_to(t, (shape[0],))
        if self_cond:
            model_output = denoise_fn(audio, times, x_start_prev)
        else:
            model_output = denoise_fn(audio, times)
        x_start = _reconstruct_x0(objective, audio, model_output, alpha, sigma)
        pred_noise = safe_div(audio - alpha * x_start, sigma)
        audio = x_start * alpha_next + pred_noise * sigma_next
        return (audio, x_start), ()

    (audio, _), _ = jax.lax.scan(
        body, (audio0, jnp.zeros_like(audio0)), pairs
    )
    return audio


def ddpm_sample(
    denoise_fn: Callable[[jax.Array, jax.Array], jax.Array],
    key: jax.Array,
    shape: Tuple[int, ...],
    *,
    timesteps: int,
    gamma_schedule: Callable[[jax.Array], jax.Array],
    objective: str = "v",
    scale: float = 1.0,
    time_difference: float = 0.0,
    self_cond: bool = False,
) -> jax.Array:
    """DDPM ancestral sampler (ref :1310-1377, with the `expm1`/mask-rank
    defects fixed) as one `lax.scan`."""
    key, init_key = jax.random.split(key)
    audio0 = jax.random.normal(init_key, shape)
    pairs = get_sampling_time_pairs(timesteps)
    step_keys = jax.random.split(key, timesteps)

    def body(carry, inputs):
        audio, x_start_prev = carry
        pair, step_key = inputs
        t = pair[0]
        t_next = jnp.clip(pair[1] - time_difference, min=0.0)

        gamma = gamma_schedule(t)
        gamma_next = gamma_schedule(t_next)
        alpha, sigma = gamma_to_alpha_sigma(gamma, scale)
        alpha_next, sigma_next = gamma_to_alpha_sigma(gamma_next, scale)

        times = jnp.broadcast_to(t, (shape[0],))
        if self_cond:
            model_output = denoise_fn(audio, times, x_start_prev)
        else:
            model_output = denoise_fn(audio, times)
        x_start = _reconstruct_x0(objective, audio, model_output, alpha, sigma)

        log_snr = gamma_to_log_snr(gamma, scale)
        log_snr_next = gamma_to_log_snr(gamma_next, scale)
        c = -jnp.expm1(log_snr - log_snr_next)

        mean = alpha_next * (audio * (1 - c) / jnp.maximum(alpha, 1e-10) + c * x_start)
        variance = (sigma_next**2) * c
        log_variance = safe_log(variance)

        noise = jnp.where(
            t_next > 0, jax.random.normal(step_key, audio.shape), 0.0
        )
        audio = mean + jnp.exp(0.5 * log_variance) * noise
        return (audio, x_start), ()

    (audio, _), _ = jax.lax.scan(
        body, (audio0, jnp.zeros_like(audio0)), (pairs, step_keys)
    )
    return audio


def sample(
    ns2: NaturalSpeech2,
    variables,
    key: jax.Array,
    *,
    length: int,
    prompt: Optional[jax.Array] = None,
    text: Optional[jax.Array] = None,
    text_lens: Optional[jax.Array] = None,
    batch_size: int = 1,
    cond_scale: float = 1.0,
    cfg_rescale: float = 0.0,
    cfg_interval: Optional[Tuple[float, float]] = None,
    timesteps: Optional[int] = None,
    pitch: Optional[jax.Array] = None,
    duration: Optional[jax.Array] = None,
    dtype: Optional[jnp.dtype] = None,
) -> jax.Array:
    """End-to-end sampling: [conditioning →] diffusion → codec decode
    (ref sample :1457-1501). Jittable with static ``length``/``batch_size``.

    ``timesteps`` overrides the configured step count — DDIM is consistent
    under step-count reduction, so this is the few-step fast-sampling path
    (e.g. 100-step CFG sampling per the BASELINE north star, or fewer for
    progressive-distillation-style schedules).

    ``cfg_interval=(t_lo, t_hi)`` applies classifier-free guidance only at
    diffusion times inside the interval (Kynkäänniemi et al. 2024,
    "Applying Guidance in a Limited Interval Improves Sample and
    Distribution Quality"): outside it each step runs ONE conditional
    forward instead of the batch-doubled guided pair — a `lax.cond` in the
    scan body, so the skipped steps genuinely cost half. Guidance at very
    high noise mostly distorts the distribution and at very low noise does
    nothing, so e.g. ``(0.1, 0.8)`` with 100 DDIM steps cuts denoiser
    FLOPs ~30% at equal-or-better sample quality. ``None`` (default) is
    the reference behavior: guidance at every step.

    ``dtype=jnp.bfloat16`` runs the denoiser scan — the dominant cost, one
    full network forward per step — in bfloat16 (params and cond tensors
    cast once at program start; the latent is cast per step inside the
    scan, fused by XLA), while the schedule arithmetic, x̂₀ reconstruction,
    conditioning stack and codec decode stay float32.
    Sampling is memory-bandwidth-bound on TPU, so halving the bytes the MXU
    streams per step buys throughput at negligible quality cost (the
    per-step f32 update re-anchors the bf16 network output each step)."""
    model_vars = {"params": variables["params"]["model"]}
    if dtype is not None:
        model_vars = jax.tree_util.tree_map(
            lambda p: p.astype(dtype) if p.dtype == jnp.float32 else p,
            model_vars,
        )
    prompt_enc = cond = None

    if isinstance(text, (list, tuple)) and text and isinstance(text[0], str):
        # raw strings accepted like the reference's beartype-dispatched path
        # (naturalspeech2_pytorch.py:277-279); tokenized host-side, outside jit
        assert ns2.tokenizer is not None, "pass tokenizer= to NaturalSpeech2"
        text = jnp.asarray(ns2.tokenizer.texts_to_tensor_ids(list(text)))

    if ns2.conditional:
        assert prompt is not None and text is not None
        prompt_enc, cond, _ = ns2.apply(
            variables, prompt, text, text_lens, length,
            pitch, duration,
            method=ns2.conditioning_for_sample,
        )
        batch_size = prompt.shape[0]

    if dtype is not None:
        prompt_enc = None if prompt_enc is None else prompt_enc.astype(dtype)
        cond = None if cond is None else cond.astype(dtype)

    def guided(audio, times, x_self_cond):
        return forward_with_cond_scale(
            ns2.model, model_vars, audio, times,
            prompt=prompt_enc, cond=cond, cond_scale=cond_scale,
            cfg_rescale=cfg_rescale, x_self_cond=x_self_cond,
        )

    def unguided(audio, times, x_self_cond):
        # one conditional forward, no null half (cond_scale→1 fast path)
        return forward_with_cond_scale(
            ns2.model, model_vars, audio, times,
            prompt=prompt_enc, cond=cond, cond_scale=1.0,
            x_self_cond=x_self_cond,
        )

    def denoise_fn(audio, times, x_self_cond=None):
        if dtype is not None:
            audio = audio.astype(dtype)
            if x_self_cond is not None:
                x_self_cond = x_self_cond.astype(dtype)
        if (
            cfg_interval is not None
            and ns2.conditional
            and cond_scale != 1.0
        ):
            lo, hi = cfg_interval
            inside = jnp.logical_and(times[0] >= lo, times[0] <= hi)
            out = jax.lax.cond(
                inside, guided, unguided, audio, times, x_self_cond
            )
        else:
            out = guided(audio, times, x_self_cond)
        return out.astype(jnp.float32) if dtype is not None else out

    name = ns2.sampler or ("ddim" if ns2.use_ddim else "ddpm")
    sampler = {"ddim": ddim_sample, "ddpm": ddpm_sample,
               "dpmpp": dpmpp_sample}[name]
    latents = sampler(
        denoise_fn,
        key,
        (batch_size, length, ns2.dim),
        timesteps=timesteps if timesteps is not None else ns2.timesteps,
        gamma_schedule=ns2.gamma_schedule,
        objective=ns2.objective,
        scale=ns2.scale,
        time_difference=ns2.time_difference,
        self_cond=ns2.model.self_cond,
    )

    if ns2.codec is not None:
        codec_vars = {"params": variables["params"]["codec"]}
        return ns2.codec.apply(codec_vars, latents, method=ns2.codec.decode)
    return latents
