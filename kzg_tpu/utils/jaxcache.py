"""Persistent XLA compilation cache setup.

Compiles dominate wall-clock in this environment (remote compilation
service; cold-start ~minutes per process). Enabling the on-disk cache
makes every entry point (tests, benches, examples) pay each distinct
shape's compile exactly once per machine.

The cache directory is scoped by a machine fingerprint: XLA:CPU AOT
entries bake in the compile machine's CPU features, and loading an entry
compiled for a different microarchitecture is rejected at best (cold
recompile after a slow failed load) and SIGILL at worst. Round 1's
multichip dryrun artifact timed out partly on exactly this (VERDICT.md
"What's weak" #1), so entries from different machines must never share a
directory.
"""

from __future__ import annotations

import hashlib
import os
import platform


def machine_fingerprint() -> str:
    """Short stable id for (machine arch + CPU feature set)."""
    parts = [platform.machine()]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    parts.append(line.strip())
                    break
    except OSError:
        parts.append(platform.processor() or "")
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:12]


def raise_stack_limit() -> None:
    """Raise RLIMIT_STACK (soft -> hard) so XLA's recursive graph passes
    can't overflow.

    The field engine's fully-static carry resolution removes every
    while_loop from the hot paths, which makes fused programs (FFT
    pipelines, zero-poly trees, the recovery chains) one huge expression
    DAG; XLA:CPU recurses over it during compilation and segfaults at
    the default 8MB main-thread stack (512MB was still not enough for
    the recovery pipelines — use the hard limit, unlimited here). The
    main thread's stack grows on demand up to the soft rlimit, so
    raising it in-process is sufficient as long as it happens before
    the backend spawns worker threads that capture the limit.
    """
    import resource

    soft, hard = resource.getrlimit(resource.RLIMIT_STACK)
    if soft != hard:
        try:
            resource.setrlimit(resource.RLIMIT_STACK, (hard, hard))
        except (ValueError, OSError):
            pass


def enable_compilation_cache(subdir: str = "jax_cache") -> None:
    import jax

    raise_stack_limit()

    root = os.environ.get(
        "KZG_TPU_CACHE",
        os.path.join(os.path.dirname(__file__), "..", "..", ".cache"),
    )
    path = os.path.join(root, f"{subdir}-{machine_fingerprint()}")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
