"""Multi-scalar multiplication sharded over the CRS point axis.

The TP-analogue reduction (SURVEY.md section 2 "Reduction parallel"):
each shard multiplies its slice of the CRS by its slice of the scalars
and tree-reduces locally; the D partial sums are then all-gathered and
combined on every shard (point addition is a group op, not an arithmetic
sum, so the combine is an explicit log2(D) Jacobian-add tree rather than
a psum).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
from jax import lax
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..curve import g1
from ..curve.msm import tree_reduce
from ..curve.weierstrass import JacobianPoint


def lin_comb_g1_sharded(points: JacobianPoint, scalars_mont, mesh: Mesh,
                        axis: str = "elem") -> JacobianPoint:
    """MSM with points (N,) and scalars (N,) sharded over `axis`.

    Returns the (replicated) single result point.
    """
    D = mesh.shape[axis]
    n = points.x.shape[0]
    if n % D != 0:
        raise ValueError("point count must divide the mesh axis")

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis, None),
                  P(axis, None)),
        out_specs=(P(None, None), P(None, None), P(None, None)),
        check_rep=False,
    )
    def run(px, py, pz, sc):
        prods = g1.mul(JacobianPoint(px, py, pz), sc)
        partial = tree_reduce(g1.ops, prods)  # one point per shard
        gx = lax.all_gather(partial.x, axis)  # (D, 24)
        gy = lax.all_gather(partial.y, axis)
        gz = lax.all_gather(partial.z, axis)
        total = tree_reduce(g1.ops, JacobianPoint(gx, gy, gz))
        return total.x[None], total.y[None], total.z[None]

    x, y, z = run(points.x, points.y, points.z, scalars_mont)
    return JacobianPoint(x[0], y[0], z[0])
