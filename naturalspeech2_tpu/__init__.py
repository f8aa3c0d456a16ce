"""naturalspeech2_tpu — TPU-native NaturalSpeech 2 (JAX / XLA / Pallas / pjit).

A brand-new framework with the capabilities of
lucidrains/naturalspeech2-pytorch (reference mounted at /root/reference),
re-designed TPU-first: functional flax modules, static shapes + masks,
lax.scan samplers, Pallas kernels for the hot ops (flash attention, RVQ),
and a mesh-sharded pjit trainer.

Public surface mirrors the reference `__init__.py:21-24`.
"""

from naturalspeech2_tpu.version import __version__

from naturalspeech2_tpu.models.naturalspeech2 import (
    NaturalSpeech2,
    ddim_sample,
    ddpm_sample,
    dpmpp_sample,
    sample,
)
from naturalspeech2_tpu.models.denoiser import Model, forward_with_cond_scale
from naturalspeech2_tpu.models.transformer import (
    Attention,
    ConditionableTransformer,
    Transformer,
)
from naturalspeech2_tpu.models.wavenet import Wavenet
from naturalspeech2_tpu.models.encoders import (
    DurationPitchPredictor,
    PerceiverResampler,
    PhonemeEncoder,
    SpeechPromptEncoder,
)
from naturalspeech2_tpu.models.aligner import Aligner, BinLoss, ForwardSumLoss
from naturalspeech2_tpu.models.codec import SoundStream
from naturalspeech2_tpu.models.encodec import Encodec
from naturalspeech2_tpu.trainer import Trainer
from naturalspeech2_tpu.codec_trainer import CodecTrainer
from naturalspeech2_tpu.distill import ProgressiveDistiller
from naturalspeech2_tpu.serve import TTSEngine, TTSServer
from naturalspeech2_tpu.utils.tokenizer import Tokenizer
from naturalspeech2_tpu.utils.phonemizers.espeak_wrapper import ESpeak

# EncodecWrapper parity: the reference re-exports an external pretrained
# Encodec (`__init__.py:21-24`). `Encodec` is the faithful JAX port of that
# architecture (load facebook/encodec_24khz weights via
# `utils.torch_import.encodec_params_from_hf`); `SoundStream` is the
# from-scratch-trainable codec with the same call contract.
EncodecWrapper = Encodec
