"""naturalspeech2_tpu — TPU-native NaturalSpeech 2 (JAX / XLA / Pallas / pjit).

A brand-new framework with the capabilities of
lucidrains/naturalspeech2-pytorch (reference mounted at /root/reference),
re-designed TPU-first: functional flax modules, static shapes + masks,
lax.scan samplers, Pallas kernels for the hot ops (flash attention, RVQ),
and a mesh-sharded pjit trainer.
"""

from naturalspeech2_tpu.version import __version__
