"""Transport-robust benchmark timing: slope between a single dispatch
and a k-iteration on-device loop.

Three measured pathologies of this dev environment's device transport
(a relay/tunnel in front of the chip) make naive timing wrong:

1. `block_until_ready()` does NOT wait for execution — it returns after
   the enqueue is acknowledged (measured: 0.15 ms "block" vs 4.2 s for a
   `device_get` of the same value draining the queue). Any timing that
   syncs with block_until_ready measures enqueue latency, not compute.
   Round 1/2's headline numbers (e.g. "Fr FFT 2^15 in 20 us") were this
   artifact; the true device time of that program is ~1 ms.
2. Per-dispatch fixed cost fluctuates from ~0.06 ms to ~90 ms BETWEEN
   process sessions, so per-call host loops measure the tunnel on a bad
   session, and subtracting a separately-probed RTT is only as good as
   the probe.
3. Carrying the (unchanged) argument tuple through a lax.scan with an
   optimization_barrier — round 3's loop shape — inflates per-iteration
   cost ~4x for Pallas programs (measured scripts/exp_truth.py: a kernel
   whose true rate is 7.0 us/mul read 30 us/mul through that loop).

The loop here fixes all three:

  * the k iterations run ON DEVICE in one dispatch (lax.scan), with
    `args` CLOSED OVER (device-resident constants — never carried, never
    copied per iteration);
  * iteration ordering is forced by a runtime-zero token derived from
    the previous output through two separate optimization_barrier calls
    (z = barrier(v) - barrier(v) is 0 at runtime but opaque to the
    compiler), added into the first argument leaf — argument VALUES are
    unchanged, so chained self-checks stay valid; `chain=True` instead
    feeds the whole output into the first argument (shapes permitting) —
    a plain data dependence;
  * the reported rate is the SLOPE (t_scan - t_single) / k between the
    scan program and a plain single dispatch of the same fn — every
    fixed cost (enqueue, transport round-trip, output fetch) cancels,
    with no trust placed in a separately measured RTT.

Sync is a `device_get` of a small slice of every output leaf (the only
operation this transport completes before returning).
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


def _runtime_zero(out):
    """A scalar that is 0 at runtime but opaque to the compiler:
    b - barrier(b). The two operands are DIFFERENT graph nodes with
    different inputs, so neither CSE (which would dedupe two identical
    barrier(v) calls into one node and fold v - v to 0 — measured: it
    does) nor algebraic simplification applies."""
    leaf = jax.tree_util.tree_leaves(out)[0].reshape(-1)[:1]
    b1 = lax.optimization_barrier(leaf)
    b2 = lax.optimization_barrier(b1)
    return (b1 - b2).reshape(())


def _inject(args, z):
    """Add the runtime-zero token into the first array leaf of args —
    values unchanged, but the compiler must order this iteration after
    the token's producer."""
    leaves, treedef = jax.tree_util.tree_flatten(tuple(args))
    leaves = [leaves[0] + z.astype(leaves[0].dtype)] + leaves[1:]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _time_best(call, windows: int):
    """(best, spread, out): best-of-N wall time and the max-min spread
    (the session's dispatch jitter estimate)."""
    times = []
    out = None
    for _ in range(windows):
        t0 = time.perf_counter()
        out = call()
        sync(out)
        times.append(time.perf_counter() - t0)
    return min(times), max(times) - min(times), out


def device_loop(fn, args, k: int = 16, chain: bool = False,
                windows: int = 3):
    """Time `fn(*args)` as the slope between 1 and k+1 on-device
    iterations.

    fn: traceable; args: tuple of device arrays / pytrees. chain=True
    requires fn's output to match args[0] in structure (the output feeds
    the next iteration's first argument). Returns
    (seconds_per_op, last_output, floored): floored=True means the scan
    window did not measurably exceed the single dispatch, so
    seconds_per_op is a 1 ns/op FLOOR, not a measurement — callers must
    flag such rows instead of deriving speedups from them.
    """
    args = tuple(args)
    k_small = max(1, k // 8)
    if k <= k_small:
        k = k_small + 1

    def make_scan(length):
        @jax.jit
        def run_scan(a):
            def body(prev, _):
                if chain:
                    nxt = (prev,) + a[1:]
                else:
                    nxt = _inject(a, _runtime_zero(prev))
                return fn(*nxt), None

            last, _ = lax.scan(body, fn(*a), None, length=length)
            return last

        return run_scan

    run_small = make_scan(k_small)
    sync(run_small(args))  # compile + warm
    t_small, j_small, _ = _time_best(lambda: run_small(args), windows)

    # Escalate the long scan until its extra compute clears the
    # session's dispatch jitter: a slope smaller than the window spread
    # is noise, not a measurement (sessions here jitter by ~±1 ms on a
    # ~90 ms fixed dispatch cost — a 16-iteration scan of a 50 us
    # program would read as zero).
    while True:
        run_big = make_scan(k)
        outk = run_big(args)
        sync(outk)
        t_big, j_big, _ = _time_best(lambda: run_big(args), windows)
        slope_total = t_big - t_small
        jitter = max(j_small, j_big)
        resolvable = slope_total > max(5 * jitter, 0.02 * t_big)
        if resolvable or k >= 4096 or t_big > 3.0:
            break
        k *= 4

    per_op = slope_total / (k - k_small)
    floored = per_op <= 1e-9 or not resolvable
    return max(per_op, 1e-9), outk, floored
