"""Conditioning encoders (flax.linen).

TPU-native counterparts of the reference encoders in
`/root/reference/naturalspeech2_pytorch/naturalspeech2_pytorch.py`:
`PerceiverResampler` :532-579, `PhonemeEncoder` :228-287,
`SpeechPromptEncoder` :289-341, `DurationPitchPredictor(Trunk)` :412-527.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from naturalspeech2_tpu.models.blocks import (
    CausalConv1d,
    ConvBlock,
    FeedForward,
    ResnetBlock,
    RMSNorm,
)
from naturalspeech2_tpu.models.transformer import Attention, Transformer


class PerceiverResampler(nn.Module):
    """Flamingo-style resampler: ``num_latents`` learned queries cross-attend
    (queries included in context) to the prompt tokens (ref :532-579)."""

    dim: int
    depth: int
    dim_context: Optional[int] = None
    num_latents: int = 64
    dim_head: int = 64
    heads: int = 8
    ff_mult: int = 4
    use_flash_attn: bool = False
    gelu_approximate: bool = True  # False = exact erf (reference parity)

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        mask: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        dim_context = self.dim_context or self.dim
        if dim_context != self.dim:
            x = nn.Dense(self.dim, name="proj_context")(x)

        latents = self.param(
            "latents", nn.initializers.normal(0.02), (self.num_latents, self.dim)
        )
        latents = jnp.broadcast_to(
            latents[None], (x.shape[0], self.num_latents, self.dim)
        )

        for i in range(self.depth):
            latents = Attention(
                dim=self.dim,
                dim_head=self.dim_head,
                heads=self.heads,
                use_flash=self.use_flash_attn,
                cross_attn_include_queries=True,
                name=f"attn_{i}",
            )(latents, context=x, mask=mask, deterministic=deterministic) + latents
            latents = FeedForward(
                self.dim, mult=self.ff_mult,
                gelu_approximate=self.gelu_approximate, name=f"ff_{i}",
            )(latents) + latents

        return RMSNorm(self.dim, name="norm")(latents)


class PhonemeEncoder(nn.Module):
    """Token embedding → causal conv + SiLU + dropout → Transformer (ref :228-287).

    Negative ids (padding) are remapped to a dedicated pad embedding id
    ``num_tokens`` like the reference (:281-282).
    """

    num_tokens: int
    dim: int = 512
    dim_hidden: int = 512
    kernel_size: int = 9
    depth: int = 6
    dim_head: int = 64
    heads: int = 8
    conv_dropout: float = 0.2
    attn_dropout: float = 0.0
    use_flash: bool = False
    gelu_approximate: bool = True  # False = exact erf (reference parity)

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        mask: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        pad_id = self.num_tokens
        x = jnp.where(x < 0, pad_id, x)
        x = nn.Embed(self.num_tokens + 1, self.dim, name="token_emb")(x)
        x = CausalConv1d(self.dim_hidden, self.kernel_size, name="conv")(x)
        x = nn.silu(x)
        x = nn.Dropout(self.conv_dropout)(x, deterministic=deterministic)
        return Transformer(
            dim=self.dim_hidden,
            depth=self.depth,
            dim_head=self.dim_head,
            heads=self.heads,
            dropout=self.attn_dropout,
            use_flash=self.use_flash,
            gelu_approximate=self.gelu_approximate,
            name="transformer",
        )(x, mask=mask, deterministic=deterministic)


class SpeechPromptEncoder(nn.Module):
    """Conv stack over codec latents → Transformer (ref :289-341).

    The reference's conv chain walks dims (128→256→2048×4→512×3) with k=9 /
    pad=4 ('same'); we keep the same channel walk.
    """

    dim_codebook: int
    dims: Tuple[int, ...] = (256, 2048, 2048, 2048, 2048, 512, 512, 512)
    depth: int = 6
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.2
    kernel_size: int = 9
    use_flash_attn: bool = True
    gelu_approximate: bool = True  # False = exact erf (reference parity)

    @property
    def dim_out(self) -> int:
        return self.dims[-1]

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        assert x.shape[-1] == self.dim_codebook
        for i, dim_out in enumerate(self.dims):
            x = nn.Conv(dim_out, (self.kernel_size,), padding="SAME", name=f"conv_{i}")(x)
            x = nn.silu(x)
        return Transformer(
            dim=self.dims[-1],
            depth=self.depth,
            heads=self.heads,
            dim_head=self.dim_head,
            dropout=self.dropout,
            use_flash=self.use_flash_attn,
            gelu_approximate=self.gelu_approximate,
            name="transformer",
        )(x, deterministic=deterministic)


class DurationPitchPredictorTrunk(nn.Module):
    """depth × [convs → RMSNorm → cross-attn(prompt, queries included)] with
    residuals; head Dense(1)→squeeze→ReLU (ref :412-466)."""

    dim: int = 512
    depth: int = 10
    kernel_size: int = 3
    dim_context: Optional[int] = None
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.2
    use_resnet_block: bool = True
    num_convs_per_resnet_block: int = 2
    num_convolutions_per_block: int = 3
    use_flash_attn: bool = False
    # "relu" reproduces the reference head exactly (:466) but has a dead
    # zone: once the pre-activation goes negative everywhere the gradient
    # is exactly 0 and the predictor can never recover (the reference never
    # trains this head — its aux loss is dropped, :1671 — so it never
    # hits the trap). "softplus" is the trainable non-negative alternative;
    # no parameters change, only the activation.
    head_activation: str = "relu"

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        encoded_prompts: jax.Array,
        prompt_mask: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        for i in range(self.depth):
            for c in range(self.num_convolutions_per_block):
                if self.use_resnet_block:
                    x = ResnetBlock(
                        dim_out=self.dim,
                        kernel=self.kernel_size,
                        num_convs=self.num_convs_per_resnet_block,
                        name=f"conv_{i}_{c}",
                    )(x, deterministic=deterministic)
                else:
                    x = ConvBlock(
                        dim_out=self.dim, kernel=self.kernel_size,
                        name=f"conv_{i}_{c}",
                    )(x, deterministic=deterministic)
            h = RMSNorm(self.dim, name=f"norm_{i}")(x)
            x = Attention(
                dim=self.dim,
                dim_context=self.dim_context,
                heads=self.heads,
                dim_head=self.dim_head,
                dropout=self.dropout,
                use_flash=self.use_flash_attn,
                cross_attn_include_queries=True,
                name=f"attn_{i}",
            )(h, context=encoded_prompts, mask=prompt_mask,
              deterministic=deterministic) + x

        x = nn.Dense(1, name="to_pred")(x)[..., 0]
        if self.head_activation == "softplus":
            return jax.nn.softplus(x)
        return nn.relu(x)


class DurationPitchPredictor(nn.Module):
    """Phoneme embedding then two independent trunks for duration and pitch
    (the reference deep-copies one trunk, :509 — i.e. identical architecture,
    independent weights)."""

    dim: int
    num_phoneme_tokens: Optional[int] = None
    dim_encoded_prompts: Optional[int] = None
    num_convolutions_per_block: int = 3
    use_resnet_block: bool = True
    num_convs_per_resnet_block: int = 2
    depth: int = 10
    kernel_size: int = 3
    heads: int = 8
    dim_head: int = 64
    dim_hidden: int = 512
    dropout: float = 0.2
    use_flash_attn: bool = False
    head_activation: str = "relu"  # see DurationPitchPredictorTrunk

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        encoded_prompts: jax.Array,
        prompt_mask: Optional[jax.Array] = None,
        deterministic: bool = True,
    ):
        if self.num_phoneme_tokens is not None:
            x = nn.Embed(self.num_phoneme_tokens, self.dim, name="phoneme_token_emb")(x)

        kwargs = dict(
            dim=self.dim_hidden,
            depth=self.depth,
            kernel_size=self.kernel_size,
            dim_context=self.dim_encoded_prompts or self.dim,
            heads=self.heads,
            dim_head=self.dim_head,
            dropout=self.dropout,
            use_resnet_block=self.use_resnet_block,
            num_convs_per_resnet_block=self.num_convs_per_resnet_block,
            num_convolutions_per_block=self.num_convolutions_per_block,
            use_flash_attn=self.use_flash_attn,
            head_activation=self.head_activation,
        )
        duration = DurationPitchPredictorTrunk(**kwargs, name="to_duration_pred")(
            x, encoded_prompts, prompt_mask, deterministic=deterministic
        )
        pitch = DurationPitchPredictorTrunk(**kwargs, name="to_pitch_pred")(
            x, encoded_prompts, prompt_mask, deterministic=deterministic
        )
        return duration, pitch
