"""Forward-sum (CTC) alignment loss in JAX.

TPU-native replacement for the reference's `torch.nn.CTCLoss`-based
ForwardSumLoss (`/root/reference/naturalspeech2_pytorch/aligner.py:124-161`):
the attention log-probs over phonemes are treated as CTC emissions with a
prepended blank column (log-prob −1), targets are the strict phoneme index
sequence 1..K_b, and the loss is the CTC negative log-likelihood normalized
per target length and averaged over the batch (torch CTCLoss
``reduction='mean'`` + ``zero_infinity`` semantics). The forward algorithm
itself is `optax.ctc_loss` (a lax.scan over time).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

NEG = -1e9


def forward_sum_loss(
    attn_logprob: jax.Array,
    key_lens: jax.Array,
    query_lens: jax.Array,
    blank_logprob: float = -1.0,
) -> jax.Array:
    """attn_logprob: ``[b, 1, t_query(frames), t_key(phonemes)]`` raw scores,
    key_lens/query_lens: ``[b]``. Mirrors aligner.py:137-161."""
    b, _, t_q, t_k = attn_logprob.shape
    logits = attn_logprob[:, 0]  # [b, t_q, t_k]

    # prepend blank class (index 0), phoneme i → class i+1
    logits = jnp.pad(logits, ((0, 0), (0, 0), (1, 0)), constant_values=blank_logprob)

    # mask classes beyond each sample's key length (ref :148-150: positions
    # with class index > key_len are invalid; blank=0 always valid)
    class_idx = jnp.arange(t_k + 1)[None, None, :]
    logits = jnp.where(class_idx > key_lens[:, None, None], NEG, logits)

    # frame padding beyond query_lens; optax masks these steps out
    frame_idx = jnp.arange(t_q)[None, :]
    logit_paddings = (frame_idx >= query_lens[:, None]).astype(jnp.float32)

    # targets: 1..t_k, padded beyond key_lens
    labels = jnp.broadcast_to(jnp.arange(1, t_k + 1)[None, :], (b, t_k))
    label_paddings = (jnp.arange(t_k)[None, :] >= key_lens[:, None]).astype(
        jnp.float32
    )

    per_example = optax.ctc_loss(
        logits, logit_paddings, labels, label_paddings, blank_id=0
    )  # [b], negative log-likelihood

    # torch CTCLoss(reduction='mean'): divide by target length, then mean;
    # zero_infinity: infeasible alignments contribute 0
    per_example = jnp.where(
        jnp.isfinite(per_example) & (per_example < -NEG / 2), per_example, 0.0
    )
    return (per_example / jnp.maximum(key_lens, 1)).mean()
