"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the TPU analog of the reference's CPU fallbacks (SURVEY.md §4): all
kernels/models/sharding are exercised hardware-independently; multi-chip
sharding runs on a fake mesh via xla_force_host_platform_device_count.
Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the ambient env pins the real TPU (axon)
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402  (after env setup, before any test imports)

# The env var alone does not win over the preset axon platform here; the
# config does.
jax.config.update("jax_platforms", "cpu")

# Numerical-parity tests compare against float32 torch oracles; the backend's
# default matmul/conv precision is bf16-class, so pin full precision here.
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the suite is compile-dominated on the single
# host CPU; cached runs are several times faster. Keyed by CPU-feature
# fingerprint: XLA:CPU AOT blobs are machine-specific, and this home dir
# outlives VM generations with differing features (stale reuse = SIGILL).
from mcvd_tpu.utils import cpu_fingerprint  # noqa: E402

_cache = os.path.expanduser(f"~/.cache/jax_comp_tests_{cpu_fingerprint()}")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """Two-tier suite: everything not marked `heavy` is auto-marked `quick`,
    so `pytest -m quick` gives a fast signal on this compile-bound 1-core
    host and `pytest -m heavy` is the complement (quick ∪ heavy = full)."""
    for item in items:
        if "heavy" not in item.keywords:
            item.add_marker(pytest.mark.quick)
