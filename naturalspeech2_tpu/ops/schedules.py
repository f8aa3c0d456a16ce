"""Continuous-time diffusion noise schedules γ(t) and conversions.

TPU-native counterpart of the schedule layer of the reference
(`/root/reference/naturalspeech2_pytorch/naturalspeech2_pytorch.py:1131-1156`).
All functions are elementwise, dtype-preserving, and jittable; the reference's
tensor/scalar inconsistencies (e.g. ``sigmoid_schedule`` building host tensors
per call) are replaced with pure jnp math.

Semantics: γ(t) is the signal *variance* share at continuous time t ∈ [0, 1]
(γ(0)≈1 clean, γ(1)≈0 pure noise); α = √γ·scale, σ = √(1−γ).
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp


def simple_linear_schedule(t: jax.Array, clip_min: float = 1e-9) -> jax.Array:
    """γ(t) = 1 − t (reference :1133-1134)."""
    return jnp.clip(1.0 - t, min=clip_min)


def cosine_schedule(
    t: jax.Array,
    start: float = 0.0,
    end: float = 1.0,
    tau: float = 1.0,
    clip_min: float = 1e-9,
) -> jax.Array:
    """Power-cosine γ(t) with remappable endpoints (reference :1136-1142)."""
    power = 2.0 * tau
    v_start = math.cos(start * math.pi / 2) ** power
    v_end = math.cos(end * math.pi / 2) ** power
    output = jnp.cos((t * (end - start) + start) * math.pi / 2) ** power
    output = (v_end - output) / (v_end - v_start)
    return jnp.clip(output, min=clip_min)


def sigmoid_schedule(
    t: jax.Array,
    start: float = -3.0,
    end: float = 3.0,
    tau: float = 1.0,
    clamp_min: float = 1e-9,
) -> jax.Array:
    """Sigmoid γ(t) — the reference default (reference :1144-1148, :1173)."""
    v_start = jax.nn.sigmoid(jnp.asarray(start / tau, dtype=jnp.result_type(t)))
    v_end = jax.nn.sigmoid(jnp.asarray(end / tau, dtype=jnp.result_type(t)))
    gamma = (-jax.nn.sigmoid((t * (end - start) + start) / tau) + v_end) / (
        v_end - v_start
    )
    return jnp.clip(gamma, min=clamp_min, max=1.0)


SCHEDULES: dict[str, Callable[..., jax.Array]] = {
    "linear": simple_linear_schedule,
    "cosine": cosine_schedule,
    "sigmoid": sigmoid_schedule,
}


def get_schedule(name: str) -> Callable[..., jax.Array]:
    """Name → γ(t) fn, mirroring the ctor dispatch (reference :1251-1258)."""
    if name not in SCHEDULES:
        raise ValueError(f"invalid noise schedule {name!r}; choose from {sorted(SCHEDULES)}")
    return SCHEDULES[name]


def gamma_to_alpha_sigma(gamma: jax.Array, scale: float = 1.0):
    """γ → (α, σ): α = √γ·scale, σ = √(1−γ) (reference :1152-1153)."""
    return jnp.sqrt(gamma) * scale, jnp.sqrt(1.0 - gamma)


def gamma_to_log_snr(gamma: jax.Array, scale: float = 1.0, eps: float = 1e-5) -> jax.Array:
    """γ → log SNR = log(γ·scale² / (1−γ)) (reference :1155-1156)."""
    return jnp.log(jnp.clip(gamma * (scale**2) / (1.0 - gamma), min=eps))
