"""Persistent XLA compilation cache setup.

Compiles dominate wall-clock in this environment (remote compilation
service; cold-start ~minutes per process). Enabling the on-disk cache
makes every entry point (tests, benches, examples) pay each distinct
shape's compile exactly once per machine.
"""

from __future__ import annotations

import os


def enable_compilation_cache(subdir: str = "jax_cache") -> None:
    import jax

    root = os.environ.get(
        "KZG_TPU_CACHE",
        os.path.join(os.path.dirname(__file__), "..", "..", ".cache"),
    )
    path = os.path.join(root, subdir)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
