"""Process-level JAX setup: persistent compilation cache.

TPU compiles in this environment go through a remote-compile tunnel and cost
minutes; the persistent cache amortises them across processes (train CLI,
eval CLI, bench) for identical programs.
"""

from __future__ import annotations

import os


def setup(cache_dir: str | None = None) -> None:
    import jax

    cache = cache_dir or os.environ.get(
        "SAMPLENET_TPU_CACHE", os.path.expanduser("~/.cache/samplenet_tpu_xla")
    )
    os.makedirs(cache, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
