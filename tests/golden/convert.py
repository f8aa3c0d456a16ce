"""flax → torch state_dict converters for golden parity tests.

Each function maps the repo's flax param tree onto the state_dict layout
of the corresponding REFERENCE torch module (layouts observed from
`/root/reference/naturalspeech2_pytorch/naturalspeech2_pytorch.py`), so
the actual torch binary computes the expected activations for the same
weights.

Layout rules:
  flax Dense  kernel [in, out]      -> torch Linear weight [out, in]
  flax Conv   kernel [k, in, out]   -> torch Conv1d weight [out, in, k]
  everything else copies verbatim.
"""

import numpy as np
import torch


def t(x):
    return torch.from_numpy(np.asarray(x, np.float32).copy())


def lin(p, dst, name):
    dst[f"{name}.weight"] = t(p["kernel"]).T.contiguous()
    if "bias" in p:
        dst[f"{name}.bias"] = t(p["bias"])


def conv(p, dst, name):
    dst[f"{name}.weight"] = t(p["kernel"]).permute(2, 1, 0).contiguous()
    if "bias" in p:
        dst[f"{name}.bias"] = t(p["bias"])


def attention(p, dst, name):
    """Reference Attention (:1029-1069): to_q/to_kv/to_out, all bias-free."""
    lin(p["to_q"], dst, f"{name}.to_q")
    lin(p["to_kv"], dst, f"{name}.to_kv")
    lin(p["to_out"], dst, f"{name}.to_out")


def feed_forward(p, dst, name, causal_conv=False):
    """Reference FeedForward (:1004-1025): Sequential indices
    0=Linear(in→2·inner) [GEGLU], 2=causal-conv Sequential (optional),
    last=Linear(inner→dim)."""
    lin(p["Dense_0"], dst, f"{name}.0")
    if causal_conv:
        conv(p["CausalConv1d_0"]["Conv_0"], dst, f"{name}.2.1")
        lin(p["Dense_1"], dst, f"{name}.3")
    else:
        lin(p["Dense_1"], dst, f"{name}.2")


def wavenet(p, dst, prefix, stacks, layers):
    """Reference Wavenet (:690-725) + WavenetStack (:645-688)."""
    conv(p["init_conv"]["Conv_0"], dst, f"{prefix}init_conv")
    conv(p["final_conv"]["Conv_0"], dst, f"{prefix}final_conv")
    for s in range(stacks):
        for l in range(layers):
            bp = p[f"stack_{s}"][f"block_{l}"]
            base = f"{prefix}stacks.{s}.blocks.{l}"
            lin(bp["to_time_cond"], dst, f"{base}.to_time_cond")
            conv(bp["conv"]["Conv_0"], dst, f"{base}.conv")
            conv(bp["res_conv"]["Conv_0"], dst, f"{base}.res_conv")
            if "skip_conv" in bp:
                conv(bp["skip_conv"]["Conv_0"], dst, f"{base}.skip_conv")


def conditionable_transformer(p, dst, prefix, depth, cross_attn=True,
                              ff_causal_conv=True, cond=True):
    """Reference ConditionableTransformer (:748-809).

    torch layer tuple: 0=attn ada-norm, 1=attn, 2=cross ada-norm,
    3=cross-attn, 4=ff ada-norm, 5=ff (indices shift down by the norm
    slots when cond=False — adaptive=False stores plain RMSNorm gammas).
    The repo fuses the FiLM projections into stacked tensors
    ada_norm_w [n_norms, dim_cond, 2·dim] / ada_norm_b [n_norms, 2·dim]
    with n_norms = depth · (3 if cross_attn else 2), laid out
    [attn, cross, ff] per layer.
    """
    # torch slot indices are FIXED (None placeholders fill the cross slots
    # when cross_attn=False); only the flax ada-norm stacking order varies
    n_per = (3 if cross_attn else 2) if cond else 0
    for i in range(depth):
        slots = {"attn": 0, "cross": 2, "ff": 4, "ffmod": 5}
        if cond:
            ada_w = np.asarray(p["ada_norm_w"])
            ada_b = np.asarray(p["ada_norm_b"])
            order = ["attn", "cross", "ff"] if cross_attn else ["attn", "ff"]
            for j, which in enumerate(order):
                n = i * n_per + j
                name = f"{prefix}layers.{i}.{slots[which]}.to_gamma_beta"
                dst[f"{name}.weight"] = t(ada_w[n]).T.contiguous()
                dst[f"{name}.bias"] = t(ada_b[n])
        else:
            # plain RMSNorm slots hold a bare gamma parameter
            dst[f"{prefix}layers.{i}.0.gamma"] = t(p[f"attn_norm_{i}"]["gamma"])
            if cross_attn:
                dst[f"{prefix}layers.{i}.2.gamma"] = t(
                    p[f"cross_attn_norm_{i}"]["gamma"])
            dst[f"{prefix}layers.{i}.{slots['ff']}.gamma"] = t(
                p[f"ff_norm_{i}"]["gamma"])
        attention(p[f"attn_{i}"], dst, f"{prefix}layers.{i}.1")
        if cross_attn:
            attention(p[f"cross_attn_{i}"], dst, f"{prefix}layers.{i}.3")
        feed_forward(
            p[f"ff_{i}"], dst, f"{prefix}layers.{i}.{slots['ffmod']}",
            causal_conv=ff_causal_conv,
        )
    dst[f"{prefix}to_pred.0.gamma"] = t(p["pred_norm"]["gamma"])
    dst[f"{prefix}to_pred.1.weight"] = t(p["to_pred"]["kernel"]).T.contiguous()


def perceiver_resampler(p, dst, prefix, depth):
    """Reference PerceiverResampler (:532-579)."""
    dst[f"{prefix}latents"] = t(p["latents"])
    lin(p["proj_context"], dst, f"{prefix}proj_context")
    dst[f"{prefix}norm.gamma"] = t(p["norm"]["gamma"])
    for i in range(depth):
        attention(p[f"attn_{i}"], dst, f"{prefix}layers.{i}.0")
        feed_forward(p[f"ff_{i}"], dst, f"{prefix}layers.{i}.1",
                     causal_conv=False)


def plain_transformer(p, dst, prefix, depth):
    """Reference Transformer (:1073-1115): layers.{i} = (RMSNorm, Attention,
    RMSNorm, FeedForward-no-conv)."""
    for i in range(depth):
        dst[f"{prefix}layers.{i}.0.gamma"] = t(p[f"attn_norm_{i}"]["gamma"])
        attention(p[f"attn_{i}"], dst, f"{prefix}layers.{i}.1")
        dst[f"{prefix}layers.{i}.2.gamma"] = t(p[f"ff_norm_{i}"]["gamma"])
        feed_forward(p[f"ff_{i}"], dst, f"{prefix}layers.{i}.3",
                     causal_conv=False)


def phoneme_encoder(p, dst, prefix, depth):
    """Reference PhonemeEncoder (:228-287)."""
    dst[f"{prefix}token_emb.weight"] = t(p["token_emb"]["embedding"])
    conv(p["conv"]["Conv_0"], dst, f"{prefix}conv.1")
    plain_transformer(p["transformer"], dst, f"{prefix}transformer.", depth)


def speech_prompt_encoder(p, dst, prefix, depth, n_convs):
    """Reference SpeechPromptEncoder (:289-341): Sequential conv walk has
    the Conv1d modules at odd indices 1, 3, 5, …"""
    for i in range(n_convs):
        conv(p[f"conv_{i}"], dst, f"{prefix}conv.{2 * i + 1}")
    plain_transformer(p["transformer"], dst, f"{prefix}transformer.", depth)


def duration_pitch_trunk(p, dst, prefix, depth, convs_per_block=2,
                         convs_per_resnet=2):
    """Reference DurationPitchPredictorTrunk (:412-466): layers.{i} =
    (Sequential of ResnetBlocks, RMSNorm, Attention); each ResnetBlock has
    `blocks.{u}` ConvUnits (proj Conv1d + GroupNorm `norm`)."""
    for i in range(depth):
        for j in range(convs_per_block):
            cb = p[f"conv_{i}_{j}"]
            for u in range(convs_per_resnet):
                unit = cb[f"ConvUnit_{u}"]
                base = f"{prefix}layers.{i}.0.{j}.blocks.{u}"
                conv(unit["Conv_0"], dst, f"{base}.proj")
                dst[f"{base}.norm.weight"] = t(unit["GroupNorm_0"]["scale"])
                dst[f"{base}.norm.bias"] = t(unit["GroupNorm_0"]["bias"])
        dst[f"{prefix}layers.{i}.1.gamma"] = t(p[f"norm_{i}"]["gamma"])
        attention(p[f"attn_{i}"], dst, f"{prefix}layers.{i}.2")
    lin(p["to_pred"], dst, f"{prefix}to_pred.0")


def duration_pitch_predictor(p, dst, prefix, depth, convs_per_block=2,
                             convs_per_resnet=2):
    """Reference DurationPitchPredictor (:468-527): two trunks."""
    duration_pitch_trunk(p["to_duration_pred"], dst,
                         f"{prefix}to_duration_pred.", depth,
                         convs_per_block, convs_per_resnet)
    duration_pitch_trunk(p["to_pitch_pred"], dst,
                         f"{prefix}to_pitch_pred.", depth,
                         convs_per_block, convs_per_resnet)


def aligner_net(p, dst, prefix=""):
    """Reference AlignerNet (aligner.py:17-81): key_layers Conv1ds at
    indices 0, 2; query_layers at 0, 2, 4 (ReLUs between)."""
    conv(p["key_conv1"], dst, f"{prefix}key_layers.0")
    conv(p["key_conv2"], dst, f"{prefix}key_layers.2")
    conv(p["query_conv1"], dst, f"{prefix}query_layers.0")
    conv(p["query_conv2"], dst, f"{prefix}query_layers.2")
    conv(p["query_conv3"], dst, f"{prefix}query_layers.4")


def model(variables, cfg):
    """Full reference Model (:811-1000) state_dict from the repo's
    flax `models.denoiser.Model` params."""
    p = variables["params"]
    dst = {}
    dst["to_time_cond.0.weights"] = t(p["time_pos_emb"]["weights"])
    lin(p["to_time_hidden"], dst, "to_time_cond.1")
    wavenet(p["wavenet"], dst, "wavenet.",
            cfg["wavenet_stacks"], cfg["wavenet_layers"])
    conditionable_transformer(
        p["transformer"], dst, "transformer.", cfg["depth"],
        cross_attn=cfg.get("condition_on_prompt", False), cond=True,
        ff_causal_conv=True,
    )
    if cfg.get("condition_on_prompt", False):
        dst["null_prompt_cond"] = t(p["null_prompt_cond"])
        dst["null_prompt_tokens"] = t(p["null_prompt_tokens"])
        dst["null_cond"] = t(p["null_cond"]).reshape(-1, 1)
        lin(p["to_prompt_cond"], dst, "to_prompt_cond.1")
        perceiver_resampler(p["perceiver_resampler"], dst,
                            "perceiver_resampler.", cfg["resampler_depth"])
        k = t(p["cond_to_model_dim"]["kernel"])  # [in, out]
        dst["cond_to_model_dim.weight"] = k.T.unsqueeze(-1).contiguous()
        dst["cond_to_model_dim.bias"] = t(p["cond_to_model_dim"]["bias"])
    return dst


def load_into(module, state_dict):
    missing, unexpected = module.load_state_dict(state_dict, strict=True)
    assert not missing and not unexpected, (missing, unexpected)
    return module
