"""Profiling helpers: JAX profiler traces + simple wall-clock timing.

The reference has no tracing at all (SURVEY.md section 5); the TPU
equivalent is the XLA profiler — wrap any pipeline in `trace(...)` and
open the dump with TensorBoard / xprof to see per-kernel timings.
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace of the enclosed block."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(label: str, sink=print):
    """Wall-clock a block (remember to block_until_ready inside)."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        sink(f"{label}: {(time.perf_counter() - t0) * 1e3:.2f} ms")


def block(tree) -> None:
    """block_until_ready over an arbitrary pytree."""
    import jax

    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()
