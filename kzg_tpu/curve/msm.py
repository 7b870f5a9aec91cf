"""Multi-scalar multiplication (the reference's LinCombG1,
bls/bls_kilic.go:132-150, backed by kilic's Pippenger MultiExp).

TPU-native v1: batched double-and-add over all points simultaneously
(255 iterations of fused double/conditional-add over the whole batch),
followed by a log2(N) pairwise tree reduction — every step is full-batch
vector work. A Pippenger windowed-bucket variant can slot in later; the
tree shape here already gives the psum-friendly decomposition used by the
sharded path (kzg_tpu.parallel.msm_sharded).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .weierstrass import JacobianPoint
from . import g1


def tree_reduce(ops, points: JacobianPoint) -> JacobianPoint:
    """Sum a (N, ...) batch of points along axis 0 with log2(N) adds."""
    n = points.x.shape[0]
    while n > 1:
        if n % 2 == 1:
            pad = ops.infinity_like(
                JacobianPoint(points.x[:1], points.y[:1], points.z[:1])
            )
            points = JacobianPoint(
                *(jnp.concatenate([c, p], axis=0) for c, p in zip(points, pad))
            )
            n += 1
        points = ops.add(
            JacobianPoint(points.x[0::2], points.y[0::2], points.z[0::2]),
            JacobianPoint(points.x[1::2], points.y[1::2], points.z[1::2]),
        )
        n //= 2
    return JacobianPoint(points.x[0], points.y[0], points.z[0])


@jax.jit
def lin_comb_g1(points: JacobianPoint, scalars_mont) -> JacobianPoint:
    """MSM: sum_i scalars[i] * points[i]. points: (N,) G1 batch,
    scalars: (N,) Fr Montgomery batch. Returns a single point."""
    prods = g1.mul(points, scalars_mont)
    return tree_reduce(g1.ops, prods)


@jax.jit
def sum_g1(points: JacobianPoint) -> JacobianPoint:
    return tree_reduce(g1.ops, points)
