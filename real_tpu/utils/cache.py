"""Persistent XLA compilation cache.

TPU compiles are the dominant fixed cost of this engine (tens of seconds
per large program through a remote-compile tunnel); the persistent cache
makes them one-time per (program, shape) across processes.
"""

from __future__ import annotations

import os

_DEFAULT = os.path.join(os.path.expanduser("~"), ".cache", "real_tpu_xla")


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get("REAL_TPU_CACHE_DIR", _DEFAULT)
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags: cache is best-effort
