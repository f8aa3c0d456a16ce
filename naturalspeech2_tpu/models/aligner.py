"""Phoneme-to-frame alignment ("One TTS Alignment To Rule Them All",
arXiv 2108.10447).

TPU-native counterpart of `/root/reference/naturalspeech2_pytorch/aligner.py`:
conv key/query projections, pairwise-distance soft attention, monotonic
alignment search (via `ops.mas` lax.scans instead of Python loops), CTC
forward-sum loss (via `ops.ctc`) and binarization loss.

Documented divergences (reference defects not replicated, SURVEY.md §7):
- soft-attention logits are **−distance** (paper-correct); the reference
  softmaxes raw positive `torch.cdist` output (aligner.py:73), attending to
  the most distant key.
- `BinLoss` returns **−Σ(hard·logprob)/b** (a positive loss to minimize);
  the reference returns the negative product sum (aligner.py:177), which
  rewards misalignment when added to the total loss.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from naturalspeech2_tpu.ops.ctc import forward_sum_loss
from naturalspeech2_tpu.ops.mas import maximum_path

NEG = -1e9


class AlignerNet(nn.Module):
    """Key path: Conv(d_h→2·d_h, k3)→ReLU→Conv(→attn_ch, k1); query path:
    Conv(d_in→2·d_in, k3)→ReLU→Conv(→d_in, k1)→ReLU→Conv(→attn_ch, k1)
    (ref aligner.py:29-52). Inputs channels-last."""

    dim_in: int = 80
    dim_hidden: int = 512
    attn_channels: int = 80
    temperature: float = 0.0005

    @nn.compact
    def __call__(
        self,
        queries: jax.Array,  # [b, t_y, dim_in]   (mel frames)
        keys: jax.Array,  # [b, t_x, dim_hidden] (phoneme encodings)
        mask: Optional[jax.Array] = None,  # [b, t_x]
    ) -> Tuple[jax.Array, jax.Array]:
        k = nn.Conv(self.dim_hidden * 2, (3,), padding=1, name="key_conv1")(keys)
        k = nn.relu(k)
        k = nn.Conv(self.attn_channels, (1,), name="key_conv2")(k)

        q = nn.Conv(self.dim_in * 2, (3,), padding=1, name="query_conv1")(queries)
        q = nn.relu(q)
        q = nn.Conv(self.dim_in, (1,), name="query_conv2")(q)
        q = nn.relu(q)
        q = nn.Conv(self.attn_channels, (1,), name="query_conv3")(q)

        # pairwise euclidean distance [b, t_y, t_x]; logits = −dist
        d2 = (
            jnp.sum(q**2, -1, keepdims=True)
            - 2.0 * jnp.einsum("byc,bxc->byx", q, k)
            + jnp.sum(k**2, -1)[:, None, :]
        )
        dist = jnp.sqrt(jnp.maximum(d2, 1e-12))
        attn_logp = -dist[:, None]  # [b, 1, t_y, t_x]

        if mask is not None:
            attn_logp = jnp.where(mask[:, None, None, :], attn_logp, NEG)

        attn = jax.nn.softmax(attn_logp, axis=-1)
        return attn, attn_logp


class Aligner(nn.Module):
    """Wrapper producing hard durations + soft/log/binary alignments
    (ref aligner.py:179-217)."""

    dim_in: int
    dim_hidden: int
    attn_channels: int = 80
    temperature: float = 0.0005

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # phoneme encodings [b, t_x, dim_hidden]
        x_mask: jax.Array,  # [b, t_x]
        y: jax.Array,  # mel [b, dim_in, t_y] (channel-first like the frontend)
        y_mask: jax.Array,  # [b, t_y]
    ):
        queries = y.transpose(0, 2, 1)  # [b, t_y, dim_in]
        attn_soft, attn_logp = AlignerNet(
            dim_in=self.dim_in,
            dim_hidden=self.dim_hidden,
            attn_channels=self.attn_channels,
            temperature=self.temperature,
            name="aligner",
        )(queries, x, x_mask)

        attn_mask = (
            x_mask[:, :, None] & y_mask[:, None, :]
        ).astype(attn_soft.dtype)  # [b, t_x, t_y]

        soft = attn_soft[:, 0].transpose(0, 2, 1)  # [b, t_x, t_y]
        alignment_mask = maximum_path(soft, attn_mask)
        alignment_hard = alignment_mask.sum(axis=-1).astype(jnp.int32)  # [b, t_x]
        return alignment_hard, soft, attn_logp, alignment_mask


class ForwardSumLoss(nn.Module):
    blank_logprob: float = -1.0

    def __call__(self, attn_logprob, key_lens, query_lens):
        return forward_sum_loss(
            attn_logprob, key_lens, query_lens, blank_logprob=self.blank_logprob
        )


class BinLoss(nn.Module):
    def __call__(self, attn_hard, attn_logprob, key_lens):
        """attn_hard: ``[b, t_x, t_y]`` binary path, attn_logprob:
        ``[b, 1, t_y, t_x]`` (ref aligner.py:163-177, sign corrected)."""
        b = attn_logprob.shape[0]
        t_k = attn_logprob.shape[-1]
        logp = attn_logprob[:, 0]  # [b, t_y, t_x]
        key_idx = jnp.arange(t_k)[None, None, :]
        logp = jnp.where(key_idx > key_lens[:, None, None], NEG, logp)
        logp = jax.nn.log_softmax(logp, axis=-1)
        hard = attn_hard.transpose(0, 2, 1)  # [b, t_y, t_x]
        return -(hard * logp).sum() / b
