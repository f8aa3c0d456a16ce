"""Analytic FLOP counting by walking a jaxpr.

XLA's ``compiled.cost_analysis()`` cannot see inside Pallas custom calls
(it reports ~0 flops for kernel-heavy programs), so MFU reporting walks
the *pre-lowering* jaxpr instead: every ``dot_general`` and
``conv_general_dilated`` contributes ``2·M·N·K``-style matmul FLOPs,
higher-order primitives (scan / cond / pjit / custom_vjp / remat /
pallas_call) are recursed into, with scan multiplied by its trip count
and pallas_call by its grid size.

Elementwise / VPU work is intentionally NOT counted — the resulting
figure is *matmul* FLOPs, the numerator of MFU as usually defined
(achieved matmul FLOP/s ÷ chip peak matmul FLOP/s).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import numpy as np


def _dot_flops(eqn) -> float:
    ((lhs_c, rhs_c), (lhs_b, rhs_b)) = eqn.params["dimension_numbers"]
    lhs = eqn.invars[0].aval.shape
    rhs = eqn.invars[1].aval.shape
    batch = math.prod(lhs[i] for i in lhs_b) if lhs_b else 1
    k = math.prod(lhs[i] for i in lhs_c) if lhs_c else 1
    m = math.prod(
        d for i, d in enumerate(lhs) if i not in lhs_c and i not in lhs_b
    )
    n = math.prod(
        d for i, d in enumerate(rhs) if i not in rhs_c and i not in rhs_b
    )
    return 2.0 * batch * m * n * k


def _conv_flops(eqn) -> float:
    out = eqn.outvars[0].aval.shape
    rhs = eqn.invars[1].aval.shape  # kernel
    groups = eqn.params.get("feature_group_count", 1) * eqn.params.get(
        "batch_group_count", 1
    )
    # kernel shape per dimension_numbers: spatial dims × in_ch/g × out_ch.
    # 2 · out_elems · (prod(spatial) · in_ch_per_group) regardless of layout:
    kernel_elems = math.prod(rhs)
    # contraction per output element = kernel_elems / out_channels; find
    # the kernel's out-feature dim via the dimension numbers
    dn = eqn.params["dimension_numbers"]
    out_ch = rhs[dn.rhs_spec[0]]  # rhs_spec[0] = out-feature dim index
    per_out = kernel_elems / max(out_ch, 1)
    return 2.0 * math.prod(out) * per_out


def _jaxpr_of(params: dict) -> Any:
    for key in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
        if key in params:
            return params[key]
    return None


def count_flops_jaxpr(jaxpr) -> float:
    """Matmul+conv FLOPs of a (Closed)Jaxpr, recursively."""
    closed = jaxpr
    if hasattr(closed, "jaxpr"):
        jaxpr = closed.jaxpr
    total = 0.0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            total += _dot_flops(eqn)
        elif name == "conv_general_dilated":
            total += _conv_flops(eqn)
        elif name == "scan":
            inner = count_flops_jaxpr(eqn.params["jaxpr"])
            total += inner * eqn.params["length"]
        elif name == "while":
            # trip count is dynamic; count one iteration (documented bias)
            total += count_flops_jaxpr(eqn.params["body_jaxpr"])
        elif name == "cond":
            total += max(
                count_flops_jaxpr(b) for b in eqn.params["branches"]
            )
        elif name == "pallas_call":
            gm = eqn.params.get("grid_mapping")
            grid = getattr(gm, "grid", None) or ()
            static_grid = math.prod(
                int(g) for g in grid if isinstance(g, (int, np.integer))
            )
            total += count_flops_jaxpr(eqn.params["jaxpr"]) * max(
                static_grid, 1
            )
        else:
            inner = _jaxpr_of(eqn.params)
            if inner is not None:
                total += count_flops_jaxpr(inner)
    return total


def count_flops(fn, *args, **kwargs) -> float:
    """Matmul+conv FLOPs of one call of ``fn(*args, **kwargs)``."""
    closed = jax.make_jaxpr(lambda *a: fn(*a, **kwargs))(*args)
    return count_flops_jaxpr(closed)
