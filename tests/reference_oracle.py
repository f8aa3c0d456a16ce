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


# ===================================================================== #
# Conditioning stack (VERDICT r2 item 2): PhonemeEncoder :228-287,
# SpeechPromptEncoder :289-341, DurationPitchPredictor :412-527, plain
# Transformer :1073-1115, AlignerNet (aligner.py:17-81), AudioToMel
# :181-224, f0_to_coarse :164-175, expand_encodings :1449-1455, and the
# full conditional forward losses :1520-1684.
# ===================================================================== #


def embedding(p, ids):
    return np.asarray(p["embedding"], np.float64)[np.asarray(ids)]


def conv1d(p, x, pad, dilation=1):
    """torch nn.Conv1d with symmetric padding ``pad`` (channels-last here:
    x [b, n, in], flax kernel [k, in, out])."""
    w = np.asarray(p["kernel"], np.float64)
    bias = np.asarray(p["bias"], np.float64)
    k = w.shape[0]
    xp = np.pad(x, ((0, 0), (pad, pad), (0, 0)))
    n_out = xp.shape[1] - dilation * (k - 1)
    out = np.zeros(x.shape[:1] + (n_out,) + (w.shape[2],))
    for j in range(k):
        out += xp[:, j * dilation : j * dilation + n_out] @ w[j]
    return out + bias


def plain_transformer(p, x, depth, dim, heads, dim_head, mask=None,
                      ff_mult=4, final_norm=False):
    """Reference Transformer (:1073-1115): pre-norm attn/FF with plain
    RMSNorms, FeedForward without the causal conv."""
    for i in range(depth):
        h = rmsnorm(x, dim, gamma=p[f"attn_norm_{i}"]["gamma"])
        x = attention(p[f"attn_{i}"], h, heads, dim_head, mask=mask) + x
        h = rmsnorm(x, dim, gamma=p[f"ff_norm_{i}"]["gamma"])
        x = feed_forward(p[f"ff_{i}"], h, dim, ff_mult) + x
    if final_norm:
        x = rmsnorm(x, dim, gamma=p["final_norm"]["gamma"])
    return x


def phoneme_encoder(p, cfg, ids, mask=None):
    """Reference PhonemeEncoder.forward (:269-287): pad-id remap → embed →
    CausalConv1d(k) + SiLU → Transformer."""
    ids = np.asarray(ids)
    ids = np.where(ids < 0, cfg["num_tokens"], ids)
    x = embedding(p["token_emb"], ids)
    x = causal_conv(p["conv"]["Conv_0"], x)
    x = silu(x)
    return plain_transformer(
        p["transformer"], x, cfg["depth"], cfg["dim_hidden"], cfg["heads"],
        cfg["dim_head"], mask=mask,
    )


def speech_prompt_encoder(p, cfg, x):
    """Reference SpeechPromptEncoder.forward (:334-341): conv chain walking
    ``dims`` (k=9, pad=4 'same') with SiLU after each → Transformer."""
    x = np.asarray(x, np.float64)
    k = cfg.get("kernel_size", 9)
    for i in range(len(cfg["dims"])):
        x = silu(conv1d(p[f"conv_{i}"], x, pad=(k - 1) // 2))
    return plain_transformer(
        p["transformer"], x, cfg["depth"], cfg["dims"][-1], cfg["heads"],
        cfg["dim_head"],
    )


def group_norm(p, x, groups, eps=1e-5):
    """torch nn.GroupNorm on channels-last [b, n, c]: statistics over
    (channels-in-group × time) per sample (ref Block :345-365 uses it)."""
    b, n, c = x.shape
    xg = x.reshape(b, n, groups, c // groups).transpose(0, 2, 1, 3)
    mean = xg.mean(axis=(2, 3), keepdims=True)
    var = xg.var(axis=(2, 3), keepdims=True)
    xg = (xg - mean) / np.sqrt(var + eps)
    xg = xg.transpose(0, 2, 1, 3).reshape(b, n, c)
    return xg * np.asarray(p["scale"], np.float64) + np.asarray(
        p["bias"], np.float64
    )


def conv_unit(p, x, kernel, groups=8):
    """Reference Block (:345-365): Conv(k, same) → GroupNorm → SiLU."""
    x = conv1d(p["Conv_0"], x, pad=kernel // 2)
    x = group_norm(p["GroupNorm_0"], x, groups)
    return silu(x)


def resnet_block(p, x, kernel, num_convs=2, groups=8):
    """Reference ResnetBlock (:367-401); identity residual when dims match."""
    h = x
    for i in range(num_convs):
        h = conv_unit(p[f"ConvUnit_{i}"], h, kernel, groups)
    res = conv1d(p["Conv_0"], x, pad=0) if "Conv_0" in p else x
    return h + res


def duration_pitch_trunk(p, cfg, x, prompts, prompt_mask=None):
    """Reference DurationPitchPredictorTrunk.forward (:455-466)."""
    x = np.asarray(x, np.float64)
    for i in range(cfg["depth"]):
        for c in range(cfg["num_convolutions_per_block"]):
            x = resnet_block(
                p[f"conv_{i}_{c}"], x, cfg["kernel_size"],
                num_convs=cfg["num_convs_per_resnet_block"],
            )
        h = rmsnorm(x, cfg["dim"], gamma=p[f"norm_{i}"]["gamma"])
        x = attention(
            p[f"attn_{i}"], h, cfg["heads"], cfg["dim_head"],
            context=prompts, mask=prompt_mask, cross_attn_include_queries=True,
        ) + x
    out = dense(p["to_pred"], x)[..., 0]
    return np.maximum(out, 0.0)


def duration_pitch_predictor(p, cfg, ids, prompts, prompt_mask=None):
    """Reference DurationPitchPredictor.forward (:512-527): shared phoneme
    embedding, two independent trunks."""
    x = embedding(p["phoneme_token_emb"], ids) if "phoneme_token_emb" in p \
        else np.asarray(ids, np.float64)
    dur = duration_pitch_trunk(p["to_duration_pred"], cfg, x, prompts, prompt_mask)
    pit = duration_pitch_trunk(p["to_pitch_pred"], cfg, x, prompts, prompt_mask)
    return dur, pit


# ------------------------------------------------------------------ aligner


def aligner_net(p, queries, keys, mask=None):
    """Reference AlignerNet.forward (aligner.py:55-81): conv key/query
    projections then pairwise-euclidean soft attention.

    Faithfulness note: logits here are **−cdist** (paper-correct); the
    reference softmaxes +cdist (aligner.py:73), attending to the most
    DISTANT key — a documented, deliberately-fixed defect (module docstring
    of `models/aligner.py`). queries [b, t_y, dim_in], keys [b, t_x, d_h]."""
    k = conv1d(p["key_conv1"], keys, pad=1)
    k = np.maximum(k, 0.0)
    k = conv1d(p["key_conv2"], k, pad=0)

    q = conv1d(p["query_conv1"], queries, pad=1)
    q = np.maximum(q, 0.0)
    q = conv1d(p["query_conv2"], q, pad=0)
    q = np.maximum(q, 0.0)
    q = conv1d(p["query_conv3"], q, pad=0)

    dist = np.sqrt(
        np.maximum(
            ((q[:, :, None, :] - k[:, None, :, :]) ** 2).sum(-1), 1e-12
        )
    )
    attn_logp = -dist[:, None]  # [b, 1, t_y, t_x]
    if mask is not None:
        attn_logp = np.where(mask[:, None, None, :], attn_logp, -1e9)
    m = attn_logp.max(axis=-1, keepdims=True)
    e = np.exp(attn_logp - m)
    return e / e.sum(axis=-1, keepdims=True), attn_logp


def ctc_forward_sum_loss(attn_logp, key_lens, query_lens, blank_logprob=-1.0):
    """Reference ForwardSumLoss.forward (aligner.py:137-161): prepend a
    blank column, mask classes beyond key_len, log-softmax, CTC NLL with
    targets 1..K (torch CTCLoss: per-target-length mean, zero_infinity)."""
    b, _, t_q, t_k = attn_logp.shape
    out = []
    for i in range(b):
        K, T = int(key_lens[i]), int(query_lens[i])
        logits = np.concatenate(
            [np.full((t_q, 1), blank_logprob), np.asarray(attn_logp[i, 0], np.float64)],
            axis=1,
        )
        logits[:, np.arange(t_k + 1) > K] = -1e30
        logp = logits - _logsumexp_rows(logits)
        nll = _ctc_nll(logp[:T], list(range(1, K + 1)))
        if not np.isfinite(nll) or nll >= 1e29:  # zero_infinity
            nll = 0.0
        out.append(nll / max(K, 1))
    return float(np.mean(out))


def _logsumexp_rows(x):
    m = x.max(axis=-1, keepdims=True)
    return m + np.log(np.exp(x - m).sum(axis=-1, keepdims=True))


def _ctc_nll(logp, targets):
    """Standard CTC forward algorithm (log domain), blank index 0."""
    ext = [0]
    for y in targets:
        ext += [y, 0]
    S, T = len(ext), logp.shape[0]
    alpha = np.full(S, -np.inf)
    alpha[0] = logp[0, 0]
    if S > 1:
        alpha[1] = logp[0, ext[1]]
    for t in range(1, T):
        new = np.full(S, -np.inf)
        for s in range(S):
            c = alpha[s]
            if s >= 1:
                c = np.logaddexp(c, alpha[s - 1])
            if s >= 2 and ext[s] != 0 and ext[s] != ext[s - 2]:
                c = np.logaddexp(c, alpha[s - 2])
            new[s] = c + logp[t, ext[s]]
        alpha = new
    ll = alpha[-1] if S == 1 else np.logaddexp(alpha[-1], alpha[-2])
    return -ll


def bin_loss(attn_hard, attn_logp, key_lens):
    """BinLoss (aligner.py:163-177) with the repo's documented sign fix:
    −Σ(hard·logsoftmax)/b (the reference returns the negative of this,
    rewarding misalignment)."""
    b, _, t_q, t_k = attn_logp.shape
    logp = np.asarray(attn_logp[:, 0], np.float64)
    key_idx = np.arange(t_k)[None, None, :]
    logp = np.where(key_idx > np.asarray(key_lens)[:, None, None], -1e9, logp)
    logp = logp - _logsumexp_rows(logp)
    hard = np.asarray(attn_hard, np.float64).transpose(0, 2, 1)
    return -(hard * logp).sum() / b


# ------------------------------------------------------------------ frontend


def audio_to_mel(audio, n_mels=100, sampling_rate=24000, f_max=8000.0,
                 n_fft=1024, win_length=640, hop_length=160, log=True):
    """Reference AudioToMel.forward (:201-224): torchaudio Spectrogram
    (center/reflect, periodic hann padded to n_fft) → MelScale (HTK, no
    norm) → AmplitudeToDB (power: 10·log10(clamp 1e-10))."""
    audio = np.asarray(audio, np.float64)
    pad = n_fft // 2
    audio = np.pad(audio, ((0, 0), (pad, pad)), mode="reflect")
    b, t = audio.shape
    n_frames = 1 + (t - n_fft) // hop_length

    n = np.arange(win_length)
    window = 0.5 - 0.5 * np.cos(2 * math.pi * n / win_length)  # periodic hann
    pad_w = (n_fft - win_length) // 2
    window = np.pad(window, (pad_w, n_fft - win_length - pad_w))

    frames = np.stack(
        [audio[:, i * hop_length : i * hop_length + n_fft] for i in range(n_frames)],
        axis=1,
    )
    spec = np.fft.rfft(frames * window, n=n_fft, axis=-1)
    power = np.abs(spec) ** 2  # [b, frames, freqs]

    # torchaudio melscale_fbanks (htk, norm=None)
    n_freqs = n_fft // 2 + 1
    all_freqs = np.linspace(0, sampling_rate // 2, n_freqs)
    hz2mel = lambda f: 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)
    mel2hz = lambda m: 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)
    m_pts = np.linspace(hz2mel(0.0), hz2mel(f_max), n_mels + 2)
    f_pts = mel2hz(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts[None, :] - all_freqs[:, None]
    fb = np.maximum(
        0.0, np.minimum(-slopes[:, :-2] / f_diff[:-1], slopes[:, 2:] / f_diff[1:])
    )

    mel = np.einsum("btf,fm->bmt", power, fb)
    if log:
        mel = 10.0 * np.log10(np.maximum(mel, 1e-10))
    return mel  # [b, n_mels, frames]


def f0_to_coarse(f0, f0_bin=256, f0_max=1100.0, f0_min=50.0):
    """Reference f0_to_coarse (:164-175)."""
    f0 = np.asarray(f0, np.float64)
    f0_mel_max = 1127.0 * math.log(1 + f0_max / 700.0)
    f0_mel_min = 1127.0 * math.log(1 + f0_min / 700.0)
    f0_mel = 1127.0 * np.log(1 + f0 / 700.0)
    scaled = (f0_mel - f0_mel_min) * (f0_bin - 2) / (f0_mel_max - f0_mel_min) + 1
    f0_mel = np.where(f0_mel > 0, scaled, f0_mel)
    f0_mel = np.clip(f0_mel, 1.0, float(f0_bin - 1))
    return (f0_mel + 0.5).astype(np.int64)


def expand_encodings(pitch_emb_p, phoneme_enc, attn, pitch, f0_bin):
    """Reference expand_encodings (:1449-1455), channels-last: phoneme
    encodings and the pitch embedding (of phoneme-rate coarse F0) are both
    expanded to frame rate through the alignment mask and summed.
    phoneme_enc [b, t_x, d], attn [b, t_x, n] float, pitch [b, 1, t_x]."""
    expanded_dur = np.einsum("btn,btd->bnd", attn, phoneme_enc)
    pitch_emb = embedding(pitch_emb_p, f0_to_coarse(pitch[:, 0], f0_bin))
    expanded_pitch = np.einsum("btn,btd->bnd", attn, pitch_emb)
    return expanded_dur + expanded_pitch


# -------------------------------------------------------- helpers (parity)


def create_mask(lengths, max_len):
    return np.arange(max_len)[None, :] < np.asarray(lengths)[:, None]


def average_over_durations(values, durs):
    """Reference utils/utils.py:4-26: segment means of nonzero frame values
    over per-phoneme duration spans. values [b, 1, t], durs [b, tp]."""
    values = np.asarray(values, np.float64)
    durs = np.asarray(durs, np.int64)
    b, _, t = values.shape
    ends = np.clip(np.cumsum(durs, axis=1), 0, t)
    starts = np.clip(ends - durs, 0, t)
    vc = np.pad(np.cumsum(values, axis=-1), ((0, 0), (0, 0), (1, 0)))
    nc = np.pad(
        np.cumsum((values != 0.0).astype(np.float64), axis=-1),
        ((0, 0), (0, 0), (1, 0)),
    )
    out = np.zeros((b, 1, durs.shape[1]))
    for i in range(b):
        sums = vc[i, 0][ends[i]] - vc[i, 0][starts[i]]
        cnts = nc[i, 0][ends[i]] - nc[i, 0][starts[i]]
        out[i, 0] = np.where(cnts > 0, sums / np.maximum(cnts, 1.0), 0.0)
    return out


def maximum_path(value, mask):
    """Reference maximum_path DP (aligner.py:88-120): monotonic alignment
    search forward pass + backtrack. value/mask [b, t_x, t_y]."""
    mask = np.asarray(mask, np.float64)
    value = np.asarray(value, np.float64) * mask
    b, t_x, t_y = value.shape
    direction = np.zeros(value.shape, dtype=np.int64)
    v = np.zeros((b, t_x))
    x_range = np.arange(t_x, dtype=np.float64)[None, :]
    const = -np.inf
    for j in range(t_y):
        v0 = np.pad(v, ((0, 0), (1, 0)), constant_values=const)[:, :-1]
        v1 = v
        max_mask = v1 >= v0
        v_max = np.where(max_mask, v1, v0)
        direction[:, :, j] = max_mask
        index_mask = x_range <= j
        v = np.where(index_mask, v_max + value[:, :, j], const)
    direction = np.where(mask.astype(bool), direction, 1)
    path = np.zeros(value.shape)
    index = mask[:, :, 0].sum(1).astype(np.int64) - 1
    index_range = np.arange(b)
    for j in reversed(range(t_y)):
        path[index_range, index, j] = 1
        index = index + direction[index_range, index, j] - 1
    return path * mask


def ns2_conditional_losses(params, cfgs, audio, text, text_lens, mel,
                           mel_lens, prompt, pitch, times, noise,
                           loss_weights=None):
    """Full conditional training forward (reference NaturalSpeech2.forward
    :1520-1684, with the repo's documented fix of actually ADDING the aux
    loss, :1684): conditioning stack → aligner/duration/pitch losses →
    v-objective diffusion loss with min-SNR weighting.

    ``audio`` are codec latents [b, n, d]; ``prompt`` latents [b, tp, dc];
    ``mel`` [b, n_mels, frames]; ``pitch`` [b, 1, frames]; ``times``/
    ``noise`` the injected diffusion draws. Returns (losses_dict, tensors)
    where tensors = {prompt_enc, phoneme_enc, cond} for direct comparison.
    """
    p = params["params"] if "params" in params else params
    w = {
        "duration": 1.0, "pitch": 1.0, "align": 1.0, "align_bin": 0.0,
        "scale": 1.0, "min_snr_gamma": 5.0, **(loss_weights or {}),
    }
    b = np.asarray(prompt).shape[0]
    text = np.asarray(text)
    text_lens = np.minimum(np.asarray(text_lens), text.shape[-1])
    text_mask = create_mask(text_lens, text.shape[-1])

    prompt_enc = speech_prompt_encoder(p["prompt_enc"], cfgs["prompt_enc"], prompt)
    # the reference encodes text WITHOUT the padding mask (:1539 —
    # text_mask is built at :1535 but only the aligner consumes it), so
    # padded positions attend into real ones; verified against the actual
    # torch reference in tests/test_golden_full_forward.py
    phon_enc = phoneme_encoder(p["phoneme_enc"], cfgs["phoneme_enc"], text)

    mel = np.asarray(mel, np.float64)[..., : np.asarray(pitch).shape[-1]]
    pitch = np.asarray(pitch, np.float64)[..., : mel.shape[-1]]
    mel_lens = np.minimum(np.asarray(mel_lens), mel.shape[-1])
    mel_mask = create_mask(mel_lens, mel.shape[-1])

    attn_soft, attn_logp = aligner_net(
        p["aligner"]["aligner"], mel.transpose(0, 2, 1), phon_enc,
        mask=text_mask,
    )
    attn_mask = (text_mask[:, :, None] & mel_mask[:, None, :]).astype(np.float64)
    soft = attn_soft[:, 0].transpose(0, 2, 1)  # [b, t_x, t_y]
    aln_mask = maximum_path(soft, attn_mask)
    aln_hard = aln_mask.sum(-1)

    dur_pred, pitch_pred = duration_pitch_predictor(
        p["duration_pitch"], cfgs["duration_pitch"], phon_enc, prompt_enc
    )

    pitch_phon = average_over_durations(pitch, aln_hard.astype(np.int64))
    cond = expand_encodings(
        p["pitch_emb"], phon_enc, aln_mask, pitch_phon, cfgs["f0_bin"]
    )

    duration_loss = np.abs(aln_hard - dur_pred).mean()
    pitch_loss = np.abs(pitch_phon[:, 0] - pitch_pred).mean()
    align_loss = ctc_forward_sum_loss(attn_logp, text_lens, mel_lens)
    if w["align_bin"] > 0:
        align_loss = align_loss + bin_loss(aln_mask, attn_logp, text_lens) * w["align_bin"]
    aux_loss = (
        duration_loss * w["duration"] + pitch_loss * w["pitch"]
        + align_loss * w["align"]
    )

    audio = np.asarray(audio, np.float64)
    times = np.asarray(times, np.float64)
    noise = np.asarray(noise, np.float64)
    gamma = sigmoid_schedule(times)[:, None, None]
    alpha, sigma = gamma_to_alpha_sigma(gamma, w["scale"])
    noised = alpha * audio + sigma * noise

    pred = model_forward(
        p["model"], cfgs["model"], noised, times, prompt=prompt_enc,
        cond=cond, cond_drop=False,
    )
    target = alpha * noise - sigma * audio  # v objective
    loss = ((pred - target) ** 2).mean(axis=(1, 2))
    snr = (alpha * alpha) / (sigma * sigma)
    snr = snr[:, 0, 0]
    loss_weight = np.minimum(snr, w["min_snr_gamma"]) / (snr + 1)
    # intended per-sample weighting. The reference as written broadcasts
    # the [b]-shaped reduced loss against the [b,1,1]-shaped weight
    # (:1666), an outer product whose mean degenerates to
    # mean(mse)·mean(weight) — each sample's weight decouples from its
    # loss for batch > 1. Characterised by the golden torch test
    # (test_golden_full_forward.py); the repo implements the paper's
    # per-sample form.
    diffusion_loss = (loss * loss_weight).mean()

    losses = {
        "loss": diffusion_loss + aux_loss,
        "diffusion": diffusion_loss,
        "duration": duration_loss,
        "pitch": pitch_loss,
        "align": align_loss,
    }
    tensors = {"prompt_enc": prompt_enc, "phoneme_enc": phon_enc, "cond": cond}
    return losses, tensors
