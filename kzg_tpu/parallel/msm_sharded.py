"""Multi-scalar multiplication sharded over the CRS point axis.

The TP-analogue reduction (SURVEY.md section 2 "Reduction parallel"),
built on the shared-table windowed MSM (curve/msm.py): each shard
computes the 64 per-window partial sums over its slice of the points
(batched adds only — no scalar-mul loops inside shard_map, which keeps
the SPMD program small and fast to compile), the D x 64 partials are
all-gathered, combined with a Jacobian-add tree (point addition is a
group op, not an arithmetic sum, so the combine is an explicit add tree
rather than a psum), and one replicated 63-step Horner pass folds the
window axis.

The shard_map program runs under ONE jit per (mesh, point count):
un-jitted shard_map executes eagerly, one tiny dispatch + compile per
primitive per device (the round-2 dryrun compile storm).
"""

from __future__ import annotations

import functools

import jax
from jax import lax
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..curve import g1
from ..curve.msm import horner_windows, tree_reduce, window_sums
from ..curve.weierstrass import JacobianPoint


@functools.lru_cache(maxsize=None)
def _msm_sharded_fn(mesh: Mesh, axis: str):
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis, None),
                  P(axis, None)),
        out_specs=(P(None, None), P(None, None), P(None, None)),
        check_rep=False,
    )
    def run(px, py, pz, sc):
        ws = window_sums(g1.ops, JacobianPoint(px, py, pz), sc)  # (64, 24)
        gx = lax.all_gather(ws.x, axis)  # (D, 64, 24)
        gy = lax.all_gather(ws.y, axis)
        gz = lax.all_gather(ws.z, axis)
        total = tree_reduce(g1.ops, JacobianPoint(gx, gy, gz))  # (64, 24)
        res = horner_windows(g1.ops, total)
        return res.x[None], res.y[None], res.z[None]

    return jax.jit(run)


def lin_comb_g1_sharded(points: JacobianPoint, scalars_mont, mesh: Mesh,
                        axis: str = "elem") -> JacobianPoint:
    """MSM with points (N,) and scalars (N,) sharded over `axis`.

    Returns the (replicated) single result point.
    """
    D = mesh.shape[axis]
    n = points.x.shape[0]
    if n % D != 0:
        raise ValueError("point count must divide the mesh axis")
    run = _msm_sharded_fn(mesh, axis)
    x, y, z = run(points.x, points.y, points.z, scalars_mont)
    return JacobianPoint(x[0], y[0], z[0])
