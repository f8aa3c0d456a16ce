"""Numpy oracle of the reference forward math, for direct numerical parity.

This module transliterates the *math* of the reference denoiser + DDIM loop
(`/root/reference/naturalspeech2_pytorch/naturalspeech2_pytorch.py`:
`Model` :811-1000, `ConditionableTransformer` :748-809, `Wavenet` :597-725,
`PerceiverResampler` :532-579, `Attention` :1029-1069, `FeedForward`
:1004-1025, `RMSNorm` :727-746, schedules :1131-1156, `ddim_sample`
:1379-1431) into plain numpy, reading weights directly from the flax param
tree of `naturalspeech2_tpu.models.denoiser.Model`. Running both with
IDENTICAL weights turns the north-star "<1e-3 latent MSE vs reference"
claim into a measurement (VERDICT r1 item 2).

Layout notes: the oracle stays channels-last ([b, n, d]) — the reference's
`b d n` rearranges are pure layout, the convolution/linear math is
identical. torch `F.gelu` is the exact erf form, reproduced here.

Faithfulness notes (documented divergences of the repo implementation):
- the repo pads the key-padding mask for the `cross_attn_include_queries`
  prepended queries; the reference forwards the caller's mask unchanged,
  which *errors* in torch for any non-None mask (transformer.py module
  docstring). The oracle implements the repo's (working) semantics; strict
  reference parity is exercised with mask=None.
- reference `ddim_sample` applies `time_difference` *after* computing
  gamma_next (:1404-1406), making it a no-op there; parity runs use the
  default time_difference=0 where repo and reference agree exactly.
"""

from __future__ import annotations

import math

import numpy as np
from scipy.special import erf


# ---------------------------------------------------------------- primitives


def dense(p, x):
    out = x @ np.asarray(p["kernel"], np.float64)
    if "bias" in p:
        out = out + np.asarray(p["bias"], np.float64)
    return out


def causal_conv(p, x, dilation=1):
    """Reference CausalConv1d (:583-595): left-pad dilation·(k−1), stride 1.

    flax kernel layout [k, in, out]; x is [b, n, in]."""
    w = np.asarray(p["kernel"], np.float64)
    bias = np.asarray(p["bias"], np.float64)
    k = w.shape[0]
    pad = dilation * (k - 1)
    xp = np.pad(x, ((0, 0), (pad, 0), (0, 0)))
    n = x.shape[1]
    out = np.zeros(x.shape[:2] + (w.shape[2],))
    for j in range(k):
        out += xp[:, j * dilation : j * dilation + n] @ w[j]
    return out + bias


def silu(x):
    return x / (1.0 + np.exp(-x))


def gelu_exact(x):
    # torch F.gelu default: x · Φ(x) with the exact erf CDF
    return x * 0.5 * (1.0 + erf(x / math.sqrt(2.0)))


def rmsnorm(x, dim, gamma=None):
    # reference RMSNorm (:736-738): F.normalize(x, dim=-1) · √dim · γ
    norm = np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
    out = x / norm * math.sqrt(dim)
    if gamma is not None:
        out = out * np.asarray(gamma, np.float64)
    return out


def softmax_attention(q, k, v, mask=None, scale=None):
    """Reference Attend manual path (attend.py:112-155), [b, h, n, d]."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    sim = np.einsum("bhid,bhjd->bhij", q, k) * scale
    if mask is not None:
        sim = np.where(mask[:, None, None, :], sim, np.finfo(sim.dtype).min)
    sim = sim - sim.max(axis=-1, keepdims=True)
    attn = np.exp(sim)
    attn = attn / attn.sum(axis=-1, keepdims=True)
    return np.einsum("bhij,bhjd->bhid", attn, v)


def attention(p, x, heads, dim_head, context=None, mask=None,
              cross_attn_include_queries=False):
    """Reference Attention (:1029-1069): q/kv/out projections (no bias)."""
    ctx = x if context is None else context
    if context is not None and cross_attn_include_queries:
        ctx = np.concatenate([x, ctx], axis=-2)
        if mask is not None:  # repo semantics: queries are always valid
            pad = np.ones(mask.shape[:1] + (x.shape[-2],), dtype=bool)
            mask = np.concatenate([pad, mask], axis=-1)
    q = dense(p["to_q"], x)
    kv = dense(p["to_kv"], ctx)
    k, v = np.split(kv, 2, axis=-1)

    def split_heads(t):
        b, n, _ = t.shape
        return t.reshape(b, n, heads, dim_head).transpose(0, 2, 1, 3)

    out = softmax_attention(
        split_heads(q), split_heads(k), split_heads(v), mask=mask,
        scale=dim_head**-0.5,
    )
    b, _, n, _ = out.shape
    out = out.transpose(0, 2, 1, 3).reshape(b, n, heads * dim_head)
    return dense(p["to_out"], out)


def feed_forward(p, x, dim, mult, causal_conv_mid=False):
    """Reference FeedForward (:1009-1025): Linear → GEGLU → [CausalConv1d(3)]
    → Linear. GEGLU (:1004-1006): first half is value, second half gate."""
    h = dense(p["Dense_0"], x)
    val, gate = np.split(h, 2, axis=-1)
    h = gelu_exact(gate) * val
    if causal_conv_mid:
        h = causal_conv(p["CausalConv1d_0"]["Conv_0"], h)
    return dense(p["Dense_1"], h)


# ------------------------------------------------------------------- wavenet


def wavenet_res_block(p, x, t, dilation, cond, has_skip):
    """Reference WavenetResBlock (:597-642)."""
    res = causal_conv(p["res_conv"]["Conv_0"], x)
    h = causal_conv(p["conv"]["Conv_0"], x, dilation=dilation)
    if cond:
        film = dense(p["to_time_cond"], t)
        t_gamma, t_beta = np.split(film, 2, axis=-1)
        h = h * t_gamma[:, None, :] + t_beta[:, None, :]
    h = np.tanh(h) * (1.0 / (1.0 + np.exp(-h)))
    h = h + res
    skip = causal_conv(p["skip_conv"]["Conv_0"], h) if has_skip else None
    return h, skip


def wavenet(p, x, t, stacks, layers, cond=True):
    """Reference Wavenet (:690-725): init conv → stacks with lane threading
    (stack s block i consumes stack s−1 block i's residual, :676-686) → last
    stack's skips summed → final 1×1."""
    x = causal_conv(p["init_conv"]["Conv_0"], x)
    lanes = [x] * layers
    skips = None
    for s in range(stacks):
        is_last = s == stacks - 1
        sp = p[f"stack_{s}"]
        new_lanes, new_skips = [], []
        for i in range(layers):
            h, skip = wavenet_res_block(
                sp[f"block_{i}"], lanes[i], t, 2**i, cond, is_last
            )
            new_lanes.append(h)
            new_skips.append(skip)
        lanes = new_lanes
        if is_last:
            skips = new_skips
    return causal_conv(p["final_conv"]["Conv_0"], sum(skips))


# --------------------------------------------------------------- transformer


def conditionable_transformer(p, x, t, depth, dim, heads, dim_head, ff_mult,
                              context=None, cross_attn=False):
    """Reference ConditionableTransformer (:748-809). Adaptive RMSNorm
    (scale=False when conditioned, :770) reads γ/β per norm from the repo's
    stacked `ada_norm_w`/`ada_norm_b` parameters."""
    norms_per_layer = 3 if cross_attn else 2
    ada_w = np.asarray(p["ada_norm_w"], np.float64)  # [n_norms, dim_cond, 2d]
    ada_b = np.asarray(p["ada_norm_b"], np.float64)  # [n_norms, 2d]

    def ada_norm(h, idx):
        gb = t @ ada_w[idx] + ada_b[idx]  # [b, 2d]
        gamma, beta = np.split(gb, 2, axis=-1)
        return rmsnorm(h, dim) * gamma[:, None, :] + beta[:, None, :]

    for i in range(depth):
        base = i * norms_per_layer
        res = x
        x = ada_norm(x, base)
        x = attention(p[f"attn_{i}"], x, heads, dim_head) + res
        if cross_attn:
            res = x
            x = ada_norm(x, base + 1)
            x = attention(
                p[f"cross_attn_{i}"], x, heads, dim_head, context=context
            ) + res
        res = x
        x = ada_norm(x, base + norms_per_layer - 1)
        x = feed_forward(
            p[f"ff_{i}"], x, dim, ff_mult, causal_conv_mid=True
        ) + res

    x = rmsnorm(x, dim, gamma=p["pred_norm"]["gamma"])
    return dense(p["to_pred"], x)


# ----------------------------------------------------------------- perceiver


def perceiver_resampler(p, x, dim, depth, heads, dim_head, ff_mult=4,
                        mask=None, project_context=True):
    """Reference PerceiverResampler (:532-579)."""
    if project_context:
        x = dense(p["proj_context"], x)
    latents = np.broadcast_to(
        np.asarray(p["latents"], np.float64)[None],
        (x.shape[0],) + np.asarray(p["latents"]).shape,
    )
    for i in range(depth):
        latents = attention(
            p[f"attn_{i}"], latents, heads, dim_head, context=x, mask=mask,
            cross_attn_include_queries=True,
        ) + latents
        latents = feed_forward(p[f"ff_{i}"], latents, dim, ff_mult) + latents
    return rmsnorm(latents, dim, gamma=p["norm"]["gamma"])


# --------------------------------------------------------------------- model


def learned_sinusoidal_pos_emb(p, t):
    """Reference LearnedSinusoidalPosEmb (:108-120): [t, sin, cos]."""
    w = np.asarray(p["weights"], np.float64)
    t = np.asarray(t, np.float64)[:, None]
    freqs = t * w[None, :] * 2 * math.pi
    return np.concatenate([t, np.sin(freqs), np.cos(freqs)], axis=-1)


def pad_or_curtail_to_length(x, length, axis=1):
    if x.shape[axis] == length:
        return x
    if x.shape[axis] > length:
        return np.take(x, range(length), axis=axis)
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, length - x.shape[axis])
    return np.pad(x, pad)


def model_forward(params, cfg, x, times, prompt=None, prompt_mask=None,
                  cond=None, cond_drop=False):
    """Reference Model.forward (:929-1000). ``cond_drop`` = True replicates
    cond_drop_prob=1 (all null), False = 0 (all conditioned)."""
    p = params["params"] if "params" in params else params
    x = np.asarray(x, np.float64)
    b = x.shape[0]

    t = learned_sinusoidal_pos_emb(p["time_pos_emb"], times)
    t = silu(dense(p["to_time_hidden"], t))

    c = None
    if cfg.get("condition_on_prompt"):
        prompt = np.asarray(prompt, np.float64)
        prompt_cond = silu(dense(p["to_prompt_cond"], prompt.mean(axis=-2)))
        if cond_drop:
            prompt_cond = np.broadcast_to(
                np.asarray(p["null_prompt_cond"], np.float64)[None],
                prompt_cond.shape,
            )
        t = np.concatenate([t, prompt_cond], axis=-1)

        if cond_drop:
            c = np.broadcast_to(
                np.asarray(p["null_prompt_tokens"], np.float64)[None],
                (b,) + np.asarray(p["null_prompt_tokens"]).shape,
            )
        else:
            c = perceiver_resampler(
                p["perceiver_resampler"], prompt, cfg["dim"],
                cfg.get("resampler_depth", 2), cfg["heads"], cfg["dim_head"],
                mask=prompt_mask,
                project_context=cfg["dim_prompt"] != cfg["dim"],
            )

        cond = dense(p["cond_to_model_dim"], np.asarray(cond, np.float64))
        if cond_drop:
            cond = np.broadcast_to(
                np.asarray(p["null_cond"], np.float64)[None, None], cond.shape
            ).copy()
        cond = pad_or_curtail_to_length(cond, x.shape[1])
        x = x + cond

    x = wavenet(
        p["wavenet"], x, t, cfg["wavenet_stacks"], cfg["wavenet_layers"]
    )
    return conditionable_transformer(
        p["transformer"], x, t, cfg["depth"], cfg["dim"], cfg["heads"],
        cfg["dim_head"], cfg.get("ff_mult", 4), context=c,
        cross_attn=bool(cfg.get("condition_on_prompt")),
    )


def forward_with_cond_scale(params, cfg, x, times, cond_scale=1.0, **kw):
    """Reference forward_with_cond_scale (:914-927): two sequential passes."""
    logits = model_forward(params, cfg, x, times, cond_drop=False, **kw)
    if cond_scale == 1.0 or not cfg.get("condition_on_prompt"):
        return logits
    null_logits = model_forward(params, cfg, x, times, cond_drop=True, **kw)
    return null_logits + (logits - null_logits) * cond_scale


# ----------------------------------------------------------------- diffusion


def sigmoid_schedule(t, start=-3.0, end=3.0, tau=1.0, clamp_min=1e-9):
    """Reference sigmoid_schedule (:1144-1148), the default (:1173)."""
    t = np.asarray(t, np.float64)
    sig = lambda v: 1.0 / (1.0 + np.exp(-v))
    v_start, v_end = sig(start / tau), sig(end / tau)
    gamma = (-sig((t * (end - start) + start) / tau) + v_end) / (v_end - v_start)
    return np.clip(gamma, clamp_min, 1.0)


def gamma_to_alpha_sigma(gamma, scale=1.0):
    return np.sqrt(gamma) * scale, np.sqrt(1.0 - gamma)


def safe_div(a, b):
    return a / np.maximum(b, 1e-10)


def ddim_sample(params, cfg, audio0, timesteps, cond_scale=1.0,
                objective="v", scale=1.0, **kw):
    """Reference ddim_sample (:1379-1431) seeded with ``audio0`` (the
    reference draws randn internally; parity feeds both sides the same)."""
    audio = np.asarray(audio0, np.float64)
    b = audio.shape[0]
    times = np.linspace(1.0, 0.0, timesteps + 1)
    for i in range(timesteps):
        t, t_next = times[i], times[i + 1]
        gamma = sigmoid_schedule(t)
        gamma_next = sigmoid_schedule(t_next)
        alpha, sigma = gamma_to_alpha_sigma(gamma, scale)
        alpha_next, sigma_next = gamma_to_alpha_sigma(gamma_next, scale)
        model_output = forward_with_cond_scale(
            params, cfg, audio, np.full((b,), t), cond_scale=cond_scale, **kw
        )
        if objective == "x0":
            x_start = model_output
        elif objective == "eps":
            x_start = safe_div(audio - sigma * model_output, alpha)
        else:
            x_start = alpha * audio - sigma * model_output
        pred_noise = safe_div(audio - alpha * x_start, sigma)
        audio = x_start * alpha_next + pred_noise * sigma_next
    return audio
