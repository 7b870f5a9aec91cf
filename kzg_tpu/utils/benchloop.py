"""Transport-robust benchmark timing: the iteration loop runs ON DEVICE.

Two measured pathologies of this dev environment's device transport
(a relay/tunnel in front of the chip) make naive timing wrong:

1. `block_until_ready()` does NOT wait for execution — it returns after
   the enqueue is acknowledged (measured: 0.15 ms "block" vs 4.2 s for a
   `device_get` of the same value draining the queue). Any timing that
   syncs with block_until_ready measures enqueue latency, not compute.
   Round 1/2's headline numbers (e.g. "Fr FFT 2^15 in 20 us") were this
   artifact; the true device time of that program is ~10.9 ms.
2. Per-dispatch round-trip fluctuates from ~0.06 ms to tens of ms
   BETWEEN process sessions, so per-call host loops measure the tunnel
   on a bad session (round 2's zero_poly "458 ms" row).

`device_loop` fixes both, as the b.N analogue of the reference's Go
benchmarks (fft_fr_bench_test.go etc.) with the loop compiled into ONE
dispatch:

    scan k+1 times:  args' = optimization_barrier(args); out = fn(*args')

The barrier defeats CSE/loop-invariant hoisting (without it XLA would
collapse identical iterations into one) and serializes the iterations;
`chain=True` additionally feeds each output into the next iteration's
input — a data dependence that cannot be faked at any layer. Sync is a
`device_get` of a small slice of the result (the only operation this
transport is guaranteed to complete before returning), and the measured
empty-dispatch round-trip is subtracted.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def sync(out) -> None:
    """Force completion: fetch a small slice of every output leaf.

    block_until_ready is NOT sufficient on this transport (see module
    docstring); only materializing result bytes on the host proves the
    computation ran.
    """
    for leaf in jax.tree_util.tree_leaves(out):
        flat = leaf.reshape(-1)
        np.asarray(jax.device_get(flat[:1]))


def _rtt() -> float:
    """Round-trip of a trivial dispatch + device_get (seconds, best of 5)."""
    f = jax.jit(lambda v: v + 1)
    probe = jnp.zeros((8,), jnp.uint32)
    sync(f(probe))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        sync(f(probe))
        best = min(best, time.perf_counter() - t0)
    return best


def device_loop(fn, args, k: int = 16, chain: bool = False,
                windows: int = 3):
    """Time `fn(*args)` with a (k+1)-iteration on-device loop.

    fn: traceable; args: tuple of device arrays / pytrees. chain=True
    requires fn's output to match args[0] in structure (the output feeds
    the next iteration's first argument). Returns
    (seconds_per_op, last_output, floored): floored=True means the whole
    (k+1)-iteration window measured at or below the empty-dispatch RTT,
    so seconds_per_op is a 1 ns/op FLOOR, not a measurement — callers
    must flag such rows instead of deriving speedups from them.
    """

    @jax.jit
    def run(args):
        def body(carry, _):
            a, _prev = lax.optimization_barrier(carry)
            out = fn(*a)
            if chain:
                a = (out,) + tuple(a[1:])
            return (a, out), None

        init = (tuple(args), fn(*args))
        (_, last), _ = lax.scan(body, init, None, length=k)
        return last

    out = run(args)
    sync(out)  # compile + warmup
    rtt = _rtt()
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        out = run(args)
        sync(out)
        best = min(best, time.perf_counter() - t0)
    # Floor PER-OP at 1ns: on a fast session a tiny program can measure
    # below the empty-dispatch RTT (best - rtt <= 0); such a row is
    # latency-floored, not actually free, and is flagged so callers
    # don't publish a bogus speedup off it.
    per_op = (best - rtt) / (k + 1)
    floored = per_op <= 1e-9
    return max(per_op, 1e-9), out, floored
