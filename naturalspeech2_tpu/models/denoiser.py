"""The diffusion denoiser network (WaveNet + adaptive Transformer).

TPU-native counterpart of the reference `Model`
(`/root/reference/naturalspeech2_pytorch/naturalspeech2_pytorch.py:811-1000`):
learned-Fourier time conditioning, optional speech-prompt conditioning
(mean-pooled prompt → concat to time cond; PerceiverResampler → cross-attn
tokens) with classifier-free-guidance null parameters, aligned frame
condition added to the input, then Wavenet → ConditionableTransformer.

TPU-first differences:
- everything stays ``[b, n, d]`` (no channel-first rearranges);
- CFG dropout can be driven by an explicit ``cond_drop_mask`` so that
  guided sampling runs conditional+unconditional as ONE batch-doubled
  forward (`forward_with_cond_scale`) instead of the reference's two
  sequential forwards (:914-927) — this is the batched-CFG fusion from
  BASELINE.json's north star.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from naturalspeech2_tpu.models.blocks import LearnedSinusoidalPosEmb
from naturalspeech2_tpu.models.encoders import PerceiverResampler
from naturalspeech2_tpu.models.transformer import ConditionableTransformer
from naturalspeech2_tpu.models.wavenet import FusedWavenet, Wavenet
from naturalspeech2_tpu.utils.helpers import pad_or_curtail_to_length, prob_mask_like


class Model(nn.Module):
    dim: int
    depth: int
    dim_head: int = 64
    heads: int = 8
    ff_mult: int = 4
    wavenet_layers: int = 8
    wavenet_stacks: int = 4
    dim_cond_mult: int = 4
    use_flash_attn: bool = True
    dim_prompt: Optional[int] = None
    num_latents_m: int = 32
    resampler_depth: int = 2
    cond_drop_prob: float = 0.0
    condition_on_prompt: bool = False
    # fused WaveNet body (single Pallas kernel; stacked params). Set False
    # for the reference-structured per-block parameter layout.
    use_fused_wavenet: bool = True
    # scan transformer layers (stacked params, program traced once) — needed
    # for the dim512/depth12 scaled config's full sampling scan; remat adds
    # per-layer rematerialization for training memory
    scan_layers: bool = False
    remat: bool = False
    # self-conditioning: feed the previous x₀ estimate back as an input.
    # The reference DECLARES this (`train_prob_self_cond`, ref :1179,1279)
    # but never implements it (README TODO :157); here it's real — the
    # estimate enters through a zero-init projection (exact no-op at init).
    self_cond: bool = False
    # False = exact erf gelu everywhere (bit-level reference parity);
    # True (default) = tanh approximation, ~9% faster flagship step
    gelu_approximate: bool = True

    @property
    def condition_dim_mult(self) -> int:
        """Wavenet/transformer cond width multiplier — doubled when the
        prompt cond is concatenated to the time cond (ref :885)."""
        return self.dim_cond_mult * (2 if self.condition_on_prompt else 1)

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        times: jax.Array,
        prompt: Optional[jax.Array] = None,
        prompt_mask: Optional[jax.Array] = None,
        cond: Optional[jax.Array] = None,
        cond_drop_prob: Optional[float] = None,
        cond_drop_mask: Optional[jax.Array] = None,
        x_self_cond: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        b = x.shape[0]

        if self.self_cond:
            if x_self_cond is None:
                x_self_cond = jnp.zeros_like(x)
            x = x + nn.Dense(
                self.dim, kernel_init=nn.initializers.zeros,
                name="to_self_cond",
            )(x_self_cond)
        dim_time = self.dim * self.dim_cond_mult

        if times.ndim == 0:
            times = jnp.broadcast_to(times, (b,))

        # time conditioning (ref :838-843)
        t = LearnedSinusoidalPosEmb(self.dim, name="time_pos_emb")(times)
        t = nn.Dense(dim_time, name="to_time_hidden")(t)
        t = nn.silu(t)

        c = None
        if self.condition_on_prompt:
            assert prompt is not None

            if cond_drop_mask is None:
                p = self.cond_drop_prob if cond_drop_prob is None else cond_drop_prob
                if p > 0.0 and not deterministic:
                    prompt_drop = prob_mask_like(self.make_rng("cfg"), (b,), p)
                    cond_drop = prob_mask_like(self.make_rng("cfg"), (b,), p)
                elif p >= 1.0:
                    prompt_drop = cond_drop = jnp.ones((b,), dtype=bool)
                else:
                    prompt_drop = cond_drop = jnp.zeros((b,), dtype=bool)
            elif isinstance(cond_drop_mask, tuple):
                prompt_drop, cond_drop = cond_drop_mask
            else:
                prompt_drop = cond_drop = cond_drop_mask

            null_prompt_cond = self.param(
                "null_prompt_cond", nn.initializers.normal(0.02), (dim_time,)
            )
            null_prompt_tokens = self.param(
                "null_prompt_tokens",
                nn.initializers.normal(0.02),
                (self.num_latents_m, self.dim),
            )

            # mean-pooled prompt → time-cond concat (ref :858-862, :947-960)
            prompt_cond = prompt.mean(axis=-2)
            prompt_cond = nn.Dense(dim_time, name="to_prompt_cond")(prompt_cond)
            prompt_cond = nn.silu(prompt_cond)
            prompt_cond = jnp.where(
                prompt_drop[:, None], null_prompt_cond[None, :], prompt_cond
            )
            t = jnp.concatenate([t, prompt_cond], axis=-1)

            resampled = PerceiverResampler(
                dim=self.dim,
                dim_context=self.dim_prompt,
                num_latents=self.num_latents_m,
                depth=self.resampler_depth,
                dim_head=self.dim_head,
                heads=self.heads,
                use_flash_attn=self.use_flash_attn,
                gelu_approximate=self.gelu_approximate,
                name="perceiver_resampler",
            )(prompt, mask=prompt_mask, deterministic=deterministic)
            c = jnp.where(
                prompt_drop[:, None, None], null_prompt_tokens[None], resampled
            )

            # aligned frame condition added to the input (ref :976-992)
            assert cond is not None
            cond = nn.Dense(self.dim, name="cond_to_model_dim")(cond)
            null_cond = self.param(
                "null_cond", nn.initializers.zeros, (self.dim,)
            )
            cond = jnp.where(cond_drop[:, None, None], null_cond[None, None], cond)
            cond = pad_or_curtail_to_length(cond, x.shape[1], axis=1)
            x = x + cond

        # keep the conditioning in the compute dtype: `times` arrives f32
        # (schedule math), so the time MLP promotes to f32 even under bf16
        # params — without this cast its FiLM modulation re-promotes every
        # block's activations and the bf16 path only streams bf16 weights
        # while the MXU still multiplies f32 (ADVICE r3)
        t = t.astype(x.dtype)
        if c is not None:
            c = c.astype(x.dtype)

        wavenet_cls = FusedWavenet if self.use_fused_wavenet else Wavenet
        x = wavenet_cls(
            dim=self.dim,
            stacks=self.wavenet_stacks,
            layers=self.wavenet_layers,
            dim_cond_mult=self.condition_dim_mult,
            name="wavenet",
        )(x, t)

        return ConditionableTransformer(
            dim=self.dim,
            depth=self.depth,
            dim_head=self.dim_head,
            heads=self.heads,
            ff_mult=self.ff_mult,
            ff_causal_conv=True,
            dim_cond_mult=self.condition_dim_mult,
            use_flash=self.use_flash_attn,
            cross_attn=self.condition_on_prompt,
            scan_layers=self.scan_layers,
            remat=self.remat,
            gelu_approximate=self.gelu_approximate,
            name="transformer",
        )(x, times=t, context=c, deterministic=deterministic)


def forward_with_cond_scale(
    model: Model,
    variables,
    x: jax.Array,
    times: jax.Array,
    *,
    prompt: Optional[jax.Array] = None,
    prompt_mask: Optional[jax.Array] = None,
    cond: Optional[jax.Array] = None,
    cond_scale: float = 1.0,
    cfg_rescale: float = 0.0,
    x_self_cond: Optional[jax.Array] = None,
) -> jax.Array:
    """Classifier-free-guided forward (ref :914-927), fused:

    ``null + (cond − null)·scale`` computed from ONE batch-doubled forward
    (conditioned half ‖ null half) instead of two sequential net evals.

    ``cfg_rescale`` φ ∈ [0, 1] applies the std-matching rescale of
    Lin et al. 2023 ("Common Diffusion Noise Schedules and Sample Steps
    are Flawed", eq. 15): high guidance scales inflate the per-sample std
    of the guided prediction, which over-saturates output; the fix scales
    the guided output back to the conditioned branch's std and blends by
    φ. φ=0 (default) is the reference's plain CFG."""
    b = x.shape[0]
    if times.ndim == 0:
        times = jnp.broadcast_to(times, (b,))

    if not model.condition_on_prompt or cond_scale == 1.0:
        drop = jnp.zeros((b,), dtype=bool) if model.condition_on_prompt else None
        return model.apply(
            variables, x, times,
            prompt=prompt, prompt_mask=prompt_mask, cond=cond,
            cond_drop_mask=drop, x_self_cond=x_self_cond,
        )

    def dbl(v):
        return None if v is None else jnp.concatenate([v, v], axis=0)

    drop = jnp.concatenate(
        [jnp.zeros((b,), dtype=bool), jnp.ones((b,), dtype=bool)]
    )
    out = model.apply(
        variables, dbl(x), dbl(times),
        prompt=dbl(prompt), prompt_mask=dbl(prompt_mask), cond=dbl(cond),
        cond_drop_mask=drop, x_self_cond=dbl(x_self_cond),
    )
    logits, null_logits = out[:b], out[b:]
    guided = null_logits + (logits - null_logits) * cond_scale
    if cfg_rescale > 0.0:
        dims = tuple(range(1, guided.ndim))
        std_cond = jnp.std(logits, axis=dims, keepdims=True)
        std_guided = jnp.std(guided, axis=dims, keepdims=True)
        rescaled = guided * (std_cond / jnp.maximum(std_guided, 1e-8))
        guided = cfg_rescale * rescaled + (1.0 - cfg_rescale) * guided
    return guided
