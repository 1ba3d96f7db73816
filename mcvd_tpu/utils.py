"""Runtime setup helpers."""

from __future__ import annotations

import os


def setup_jax(cache_dir: str | None = None, enable_cache: bool = True) -> None:
    """Enable the persistent compilation cache (the axon TPU tunnel's compile
    latency is highly variable — 20s to 500s for identical programs — so
    on-disk caching matters a lot) and other global knobs."""
    import jax

    if enable_cache:
        cache_dir = cache_dir or os.path.expanduser("~/.cache/jax_comp")
        os.makedirs(cache_dir, exist_ok=True)
        try:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        except Exception:
            pass


def force_result(x) -> float:
    """Force full materialization of a device array and return sum as float.
    On the axon backend, block_until_ready() returns before execution
    finishes; a dependent host transfer is the only reliable barrier."""
    import jax.numpy as jnp

    return float(jnp.sum(x))
