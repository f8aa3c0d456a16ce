"""EnCodec (24 kHz) — TPU-native JAX port with pretrained-weight import.

The reference's headline TTS quality rests on a *pretrained* Encodec
(`/root/reference/naturalspeech2_pytorch/naturalspeech2_pytorch.py:23`,
used at :1611/:1496 via `audiolm_pytorch.EncodecWrapper`). This module is
a faithful JAX re-implementation of that architecture (SEANet encoder /
decoder with causal reflect-padded convs, 2-layer residual LSTM
bottleneck, Euclidean residual VQ) whose parameters can be loaded
directly from a HuggingFace `facebook/encodec_24khz` checkpoint via
`naturalspeech2_tpu.utils.torch_import.encodec_params_from_hf` — giving
this framework the same "plug in a trained codec" path the reference
has. Golden parity against `transformers.EncodecModel` (the actual torch
binary, randomly initialised — no weights ship in this image) is tested
in `tests/test_golden_encodec.py`.

Exposes the exact codec contract the diffusion layer consumes
(SURVEY.md §2.5, same surface as `models.codec.SoundStream`):

- ``__call__(audio_2d, return_encoded=True, curtail_from_left=...) →
  (latents [b, n, 128], codes [b, n, Q], None)``   (ref :1445, :1611)
- ``decode(latents) → audio [b, n·320]``           (ref :1496)
- ``rq(latents, codes) → (quantized, ce_loss)``    (ref :1682)
- attrs ``target_sample_hz`` (24 kHz), ``seq_len_multiple_of`` (320),
  ``codebook_dim`` (128)                           (ref :1213-1244)

TPU notes: all convs are static-shape NTC `lax.conv_general_dilated`
calls XLA tiles onto the MXU; the LSTM precomputes the input projection
for the whole sequence as one big matmul (MXU) and scans only the
recurrent half; RVQ reuses the fused Pallas kernel
(`naturalspeech2_tpu.ops.rvq`).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from naturalspeech2_tpu.ops.rvq import rvq_cross_entropy, rvq_quantize, rvq_xla


# --------------------------------------------------------------------- #
# padding / conv primitives
# --------------------------------------------------------------------- #


def _pad1d(x: jax.Array, left: int, right: int, mode: str) -> jax.Array:
    """Pad the time axis of ``[b, t, c]``; reflect mode reproduces the HF
    small-input guard (extra zero pad before reflecting when t ≤ pad)."""
    if left == 0 and right == 0:
        return x
    if mode != "reflect":
        return jnp.pad(x, ((0, 0), (left, right), (0, 0)))
    t = x.shape[1]
    max_pad = max(left, right)
    extra = 0
    if t <= max_pad:
        extra = max_pad - t + 1
        x = jnp.pad(x, ((0, 0), (0, extra), (0, 0)))
    x = jnp.pad(x, ((0, 0), (left, right), (0, 0)), mode="reflect")
    if extra:
        x = x[:, : x.shape[1] - extra]
    return x


class EncodecConv(nn.Module):
    """Conv1d with Encodec's causal/asymmetric padding (channels-last).

    Mirrors `transformers` EncodecConv1d: effective kernel
    ``(k−1)·d+1``, fixed pad ``k_eff − stride`` (left for causal, split
    asymmetrically otherwise) plus right extra padding to the next
    stride multiple, so the output length is ``ceil(t / stride)``.
    """

    out_channels: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    causal: bool = True
    pad_mode: str = "reflect"
    norm_type: str = "weight_norm"  # weight_norm fused at import;
    # "time_group_norm" (the 48 kHz model) applies GroupNorm(1 group)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k_eff = (self.kernel_size - 1) * self.dilation + 1
        pad_total = k_eff - self.stride
        extra = (-x.shape[1]) % self.stride
        if self.causal:
            left, right = pad_total, extra
        else:
            r = pad_total // 2
            left, right = pad_total - r, r + extra
        x = _pad1d(x, left, right, self.pad_mode)
        x = nn.Conv(
            self.out_channels,
            (self.kernel_size,),
            strides=(self.stride,),
            kernel_dilation=(self.dilation,),
            padding="VALID",
            name="conv",
        )(x)
        if self.norm_type == "time_group_norm":
            x = nn.GroupNorm(num_groups=1, name="norm")(x)
        return x


class EncodecConvTranspose(nn.Module):
    """ConvTranspose1d with Encodec's trim (output length = t·stride for
    the causal ``trim_right_ratio=1`` configuration)."""

    out_channels: int
    kernel_size: int
    stride: int = 1
    causal: bool = True
    trim_right_ratio: float = 1.0
    norm_type: str = "weight_norm"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = nn.ConvTranspose(
            self.out_channels,
            (self.kernel_size,),
            strides=(self.stride,),
            padding="VALID",
            name="conv",
        )(x)
        if self.norm_type == "time_group_norm":
            y = nn.GroupNorm(num_groups=1, name="norm")(y)
        pad_total = self.kernel_size - self.stride
        if self.causal:
            right = math.ceil(pad_total * self.trim_right_ratio)
        else:
            right = pad_total // 2
        left = pad_total - right
        return y[:, left : y.shape[1] - right]


class EncodecLSTM(nn.Module):
    """Stacked residual LSTM bottleneck (torch gate order i, f, g, o).

    The input projection for the whole sequence is one ``[b·t, d]×[d, 4d]``
    matmul (MXU); only the ``h @ W_hh`` half runs inside the scan.
    """

    dim: int
    num_layers: int = 2

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = x
        d = self.dim
        for layer in range(self.num_layers):
            w_ih = self.param(
                f"w_ih_{layer}", nn.initializers.xavier_uniform(), (d, 4 * d)
            )
            w_hh = self.param(
                f"w_hh_{layer}", nn.initializers.xavier_uniform(), (d, 4 * d)
            )
            b_ih = self.param(f"b_ih_{layer}", nn.initializers.zeros, (4 * d,))
            b_hh = self.param(f"b_hh_{layer}", nn.initializers.zeros, (4 * d,))

            xg = h @ w_ih + (b_ih + b_hh)  # [b, t, 4d] — batched MXU matmul

            def step(carry, xg_t, w_hh=w_hh):
                hs, cs = carry
                gates = xg_t + hs @ w_hh
                i, f, g, o = jnp.split(gates, 4, axis=-1)
                i = jax.nn.sigmoid(i)
                f = jax.nn.sigmoid(f)
                g = jnp.tanh(g)
                o = jax.nn.sigmoid(o)
                cs = f * cs + i * g
                hs = o * jnp.tanh(cs)
                return (hs, cs), hs

            b = h.shape[0]
            init = (
                jnp.zeros((b, d), h.dtype),
                jnp.zeros((b, d), h.dtype),
            )
            _, hs = jax.lax.scan(step, init, jnp.swapaxes(xg, 0, 1))
            h = jnp.swapaxes(hs, 0, 1)
        return x + h


class EncodecResnetBlock(nn.Module):
    """SEANet residual unit: ELU→conv(k, dilated, dim→dim/compress)→
    ELU→conv(1, →dim), plus a 1×1 conv shortcut."""

    dim: int
    dilation: int
    kernel_size: int = 3
    compress: int = 2
    causal: bool = True
    pad_mode: str = "reflect"
    use_conv_shortcut: bool = True
    norm_type: str = "weight_norm"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        hidden = self.dim // self.compress
        kw = dict(causal=self.causal, pad_mode=self.pad_mode,
                  norm_type=self.norm_type)
        h = nn.elu(x)
        h = EncodecConv(
            hidden, self.kernel_size, dilation=self.dilation,
            name="block_1", **kw,
        )(h)
        h = nn.elu(h)
        h = EncodecConv(self.dim, 1, name="block_3", **kw)(h)
        if self.use_conv_shortcut:
            x = EncodecConv(self.dim, 1, name="shortcut", **kw)(x)
        return x + h


# --------------------------------------------------------------------- #
# encoder / decoder
# --------------------------------------------------------------------- #


class EncodecEncoder(nn.Module):
    """SEANet encoder. Submodule names carry the torch ModuleList index
    (`layer_{i}`) so checkpoint import is mechanical; parameterless ELU
    slots keep their index gap."""

    num_filters: int = 32
    upsampling_ratios: Sequence[int] = (8, 5, 4, 2)
    num_residual_layers: int = 1
    hidden_size: int = 128
    kernel_size: int = 7
    last_kernel_size: int = 7
    residual_kernel_size: int = 3
    dilation_growth_rate: int = 2
    compress: int = 2
    causal: bool = True
    pad_mode: str = "reflect"
    num_lstm_layers: int = 2
    norm_type: str = "weight_norm"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kw = dict(causal=self.causal, pad_mode=self.pad_mode,
                  norm_type=self.norm_type)
        idx = 0
        x = EncodecConv(
            self.num_filters, self.kernel_size, name=f"layer_{idx}", **kw,
        )(x)
        idx += 1
        scaling = 1
        for ratio in reversed(tuple(self.upsampling_ratios)):
            current = scaling * self.num_filters
            for j in range(self.num_residual_layers):
                x = EncodecResnetBlock(
                    current, self.dilation_growth_rate ** j,
                    kernel_size=self.residual_kernel_size,
                    compress=self.compress, name=f"layer_{idx}", **kw,
                )(x)
                idx += 1
            idx += 1  # ELU slot
            x = nn.elu(x)
            x = EncodecConv(
                current * 2, ratio * 2, stride=ratio, name=f"layer_{idx}",
                **kw,
            )(x)
            idx += 1
            scaling *= 2
        x = EncodecLSTM(
            scaling * self.num_filters, self.num_lstm_layers,
            name=f"layer_{idx}",
        )(x)
        idx += 2  # LSTM + ELU slots
        x = nn.elu(x)
        return EncodecConv(
            self.hidden_size, self.last_kernel_size, name=f"layer_{idx}",
            **kw,
        )(x)


class EncodecDecoder(nn.Module):
    """SEANet decoder (mirror of the encoder, transposed-conv upsampling)."""

    num_filters: int = 32
    upsampling_ratios: Sequence[int] = (8, 5, 4, 2)
    num_residual_layers: int = 1
    hidden_size: int = 128
    kernel_size: int = 7
    last_kernel_size: int = 7
    residual_kernel_size: int = 3
    dilation_growth_rate: int = 2
    compress: int = 2
    causal: bool = True
    pad_mode: str = "reflect"
    trim_right_ratio: float = 1.0
    num_lstm_layers: int = 2
    audio_channels: int = 1
    norm_type: str = "weight_norm"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kw = dict(causal=self.causal, pad_mode=self.pad_mode,
                  norm_type=self.norm_type)
        scaling = int(2 ** len(tuple(self.upsampling_ratios)))
        idx = 0
        x = EncodecConv(
            scaling * self.num_filters, self.kernel_size,
            name=f"layer_{idx}", **kw,
        )(x)
        idx += 1
        x = EncodecLSTM(
            scaling * self.num_filters, self.num_lstm_layers,
            name=f"layer_{idx}",
        )(x)
        idx += 1
        for ratio in tuple(self.upsampling_ratios):
            current = scaling * self.num_filters
            idx += 1  # ELU slot
            x = nn.elu(x)
            x = EncodecConvTranspose(
                current // 2, ratio * 2, stride=ratio, causal=self.causal,
                trim_right_ratio=self.trim_right_ratio,
                norm_type=self.norm_type, name=f"layer_{idx}",
            )(x)
            idx += 1
            for j in range(self.num_residual_layers):
                x = EncodecResnetBlock(
                    current // 2, self.dilation_growth_rate ** j,
                    kernel_size=self.residual_kernel_size,
                    compress=self.compress, name=f"layer_{idx}", **kw,
                )(x)
                idx += 1
            scaling //= 2
        idx += 1  # ELU slot
        x = nn.elu(x)
        return EncodecConv(
            self.audio_channels, self.last_kernel_size, name=f"layer_{idx}",
            **kw,
        )(x)


# --------------------------------------------------------------------- #
# full codec
# --------------------------------------------------------------------- #


class Encodec(nn.Module):
    """EnCodec 24 kHz with the reference codec contract.

    Defaults match `facebook/encodec_24khz` exactly; load its weights via
    `torch_import.encodec_params_from_hf`. ``latents`` in the contract are
    the *unquantized* encoder outputs (the continuous latents NaturalSpeech 2
    diffuses); ``decode`` runs the decoder directly on latents (pass
    ``quantize=True`` to snap through the RVQ codebooks first, which is
    what decoding a diffusion *sample* through a pretrained codec wants).
    """

    codebook_dim: int = 128
    num_filters: int = 32
    upsampling_ratios: Sequence[int] = (8, 5, 4, 2)
    num_residual_layers: int = 1
    num_quantizers: int = 8  # 6 kbps at 75 Hz frame rate
    codebook_size: int = 1024
    target_sample_hz: int = 24000
    kernel_size: int = 7
    last_kernel_size: int = 7
    residual_kernel_size: int = 3
    dilation_growth_rate: int = 2
    compress: int = 2
    causal: bool = True
    pad_mode: str = "reflect"
    trim_right_ratio: float = 1.0
    num_lstm_layers: int = 2
    use_pallas_rvq: bool = True
    # 48 kHz-model knobs (facebook/encodec_48khz: norm_type=
    # "time_group_norm", causal=False, audio_channels=2, normalize=True,
    # chunk_length_s=1.0, overlap=0.01, target_sample_hz=48000)
    norm_type: str = "weight_norm"
    audio_channels: int = 1
    normalize: bool = False
    chunk_length_s: Optional[float] = None
    overlap: Optional[float] = None

    @property
    def seq_len_multiple_of(self) -> int:
        return math.prod(self.upsampling_ratios)

    @property
    def chunk_length(self) -> Optional[int]:
        if self.chunk_length_s is None:
            return None
        hop = self.seq_len_multiple_of
        return int(self.chunk_length_s * self.target_sample_hz) // hop * hop

    @property
    def chunk_stride(self) -> Optional[int]:
        if self.chunk_length is None:
            return None
        return max(1, int((1.0 - (self.overlap or 0.0)) * self.chunk_length))

    def setup(self):
        kw = dict(
            num_filters=self.num_filters,
            upsampling_ratios=tuple(self.upsampling_ratios),
            num_residual_layers=self.num_residual_layers,
            hidden_size=self.codebook_dim,
            kernel_size=self.kernel_size,
            last_kernel_size=self.last_kernel_size,
            residual_kernel_size=self.residual_kernel_size,
            dilation_growth_rate=self.dilation_growth_rate,
            compress=self.compress,
            causal=self.causal,
            pad_mode=self.pad_mode,
            num_lstm_layers=self.num_lstm_layers,
            norm_type=self.norm_type,
        )
        self.encoder = EncodecEncoder(**kw)  # input channels inferred
        self.decoder = EncodecDecoder(
            trim_right_ratio=self.trim_right_ratio,
            audio_channels=self.audio_channels, **kw,
        )
        self.codebooks = self.param(
            "codebooks",
            nn.initializers.normal(1.0),
            (self.num_quantizers, self.codebook_size, self.codebook_dim),
        )

    # ------------------------------------------------------------------ #

    def _to_ntc(self, audio: jax.Array) -> jax.Array:
        """[b, T] mono or [b, C, T] multichannel → channels-last [b, T, C]."""
        if audio.ndim == 2:
            return audio[..., None]
        return jnp.swapaxes(audio, 1, 2)

    def encode_latents(self, audio: jax.Array) -> jax.Array:
        """audio ``[b, T]`` → unquantized latents ``[b, ceil(T/320), d]``."""
        return self.encoder(self._to_ntc(audio))

    def quantize(self, latents: jax.Array) -> Tuple[jax.Array, jax.Array]:
        b, n, d = latents.shape
        flat = latents.reshape(b * n, d)
        if self.use_pallas_rvq:
            quantized, codes = rvq_quantize(flat, self.codebooks)
        else:
            quantized, codes = rvq_xla(flat, self.codebooks)
            quantized = flat + jax.lax.stop_gradient(quantized - flat)
        return (
            quantized.reshape(b, n, d),
            codes.reshape(b, n, self.num_quantizers),
        )

    def dequantize(self, codes: jax.Array) -> jax.Array:
        total = jnp.zeros(
            (*codes.shape[:2], self.codebook_dim), self.codebooks.dtype
        )
        for qi in range(self.num_quantizers):
            total = total + self.codebooks[qi][codes[..., qi]]
        return total

    def decode(self, latents: jax.Array, quantize: bool = False) -> jax.Array:
        """latents ``[b, n, d]`` → audio ``[b, n·320]`` (ref decode :1496)."""
        if quantize:
            latents, _ = self.quantize(latents)
        return self.decoder(latents)[..., 0]

    def decode_from_codes(self, codes: jax.Array) -> jax.Array:
        return self.decode(self.dequantize(codes))

    def rq(self, latents: jax.Array, codes: jax.Array):
        """(quantized, ce_loss) against given codes (ref ``codec.rq`` :1682)."""
        b, n, d = latents.shape
        flat = latents.reshape(b * n, d)
        ce = rvq_cross_entropy(flat, self.codebooks, codes.reshape(b * n, -1))
        return self.dequantize(codes), ce

    def __call__(
        self,
        audio: jax.Array,
        return_encoded: bool = False,
        curtail_from_left: bool = False,
    ):
        """Reference codec call contract (`naturalspeech2_pytorch.py:1445,1611`)."""
        hop = self.seq_len_multiple_of
        t = audio.shape[-1]
        t_use = (t // hop) * hop
        if t_use != t:
            audio = (
                audio[..., t - t_use :] if curtail_from_left else audio[..., :t_use]
            )
        latents = self.encode_latents(audio)
        quantized, codes = self.quantize(latents)
        if return_encoded:
            return latents, codes, None
        return self.decode(quantized)

    # ------------------------------------------------------------------ #
    # chunked / normalized API (the 48 kHz model's encode/decode shape:
    # HF EncodecModel.encode/decode with chunk_length + overlap-add)
    # ------------------------------------------------------------------ #

    def _encode_frame(self, frame: jax.Array):
        """One chunk [b, T, C] → (codes [b, n, Q], scale [b, 1] | None)."""
        scale = None
        if self.normalize:
            mono = frame.sum(axis=-1, keepdims=True) / frame.shape[-1]
            scale = jnp.sqrt((mono ** 2).mean(axis=1)) + 1e-8  # [b, 1]
            frame = frame / scale[:, None, :]
        latents = self.encoder(frame)
        _, codes = self.quantize(latents)
        return codes, scale

    def encode_chunked(self, audio: jax.Array):
        """audio [b, T] / [b, C, T] → (codes [F, b, n, Q], scales,
        last_frame_pad_length).

        With ``chunk_length`` unset this is one frame (F=1); the 48 kHz
        configuration windows the input at ``chunk_stride`` and encodes
        each chunk independently — including a trailing PARTIAL chunk,
        whose codes are zero-padded to the full frame length and trimmed
        again at decode (exact HF EncodecModel.encode semantics; each
        chunk carries its own loudness scale when ``normalize``)."""
        x = self._to_ntc(audio)
        t = x.shape[1]
        chunk = self.chunk_length or t
        stride = self.chunk_stride or t
        frames, scales = [], []
        for off in range(0, t, stride):
            codes, scale = self._encode_frame(x[:, off : off + chunk])
            frames.append(codes)
            scales.append(scale)
        last_pad = frames[0].shape[1] - frames[-1].shape[1]
        if last_pad:
            frames[-1] = jnp.pad(
                frames[-1], ((0, 0), (0, last_pad), (0, 0))
            )
        return jnp.stack(frames), scales, last_pad

    def decode_chunked(
        self, codes: jax.Array, scales=None, last_frame_pad_length: int = 0
    ) -> jax.Array:
        """(codes [F, b, n, Q], scales) → waveform [b, C, T] via linear
        overlap-add across chunk frames (triangular weights, matching HF
        `_linear_overlap_add`; chunk stride in samples = input stride)."""
        hop = self.seq_len_multiple_of
        outs = []
        n_frames = codes.shape[0]
        for f in range(n_frames):
            frame = codes[f]
            if f == n_frames - 1 and last_frame_pad_length > 0:
                frame = frame[:, :-last_frame_pad_length]
            wav = self.decoder(self.dequantize(frame))  # [b, t, C]
            if scales is not None and scales[f] is not None:
                wav = wav * scales[f][:, None, :]
            outs.append(jnp.swapaxes(wav, 1, 2))  # [b, C, t]
        if len(outs) == 1:
            return outs[0]
        stride_out = self.chunk_stride or hop
        t_frame = outs[0].shape[-1]
        total = stride_out * (len(outs) - 1) + outs[-1].shape[-1]
        tvec = jnp.linspace(0.0, 1.0, t_frame + 2)[1:-1]
        weight = 0.5 - jnp.abs(tvec - 0.5)
        b, c = outs[0].shape[:2]
        acc = jnp.zeros((b, c, total))
        norm = jnp.zeros((total,))
        off = 0
        for wav in outs:
            tl = wav.shape[-1]
            acc = acc.at[..., off : off + tl].add(weight[:tl] * wav)
            norm = norm.at[off : off + tl].add(weight[:tl])
            off += stride_out
        return acc / norm
