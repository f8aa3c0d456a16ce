"""Test config: force CPU backend with 8 virtual devices.

Multi-chip sharding paths are validated on a virtual 8-device CPU mesh
(`--xla_force_host_platform_device_count=8`), the TPU-world analog of testing
multi-node without a cluster (SURVEY.md §4). Must run before jax imports.
"""

import os
import sys

# NOTE: the axon TPU plugin ignores JAX_PLATFORMS; JAX_PLATFORM_NAME + the
# config update below are what actually force the CPU backend here.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# Drop the device-plugin site dir entirely for CPU-only tests: even with
# the CPU backend forced, plugin *initialization* still connects to the
# device tunnel, and a sick tunnel wedges every process (including the
# multiprocess tests' subprocess workers) at import time. Strip it from
# sys.path (this process) AND PYTHONPATH (subprocess workers).
_PLUGIN_DIR = "/root/.axon_site"
sys.path[:] = [p for p in sys.path if _PLUGIN_DIR not in p]
os.environ["PYTHONPATH"] = os.pathsep.join(
    p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep)
    if p and _PLUGIN_DIR not in p
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent XLA compilation cache: the suite's wall time is ~90% XLA
# compiles of the same tiny programs; cache them across files AND runs
# (first cold run pays once; warm `pytest -m "not slow"` drops under the
# 5-minute gate — VERDICT r3 #7). Safe to delete .pytest_jax_cache anytime.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".pytest_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def _assert_cpu():
    assert jax.default_backend() == "cpu", jax.default_backend()
    assert jax.device_count() == 8, jax.devices()


_assert_cpu()
