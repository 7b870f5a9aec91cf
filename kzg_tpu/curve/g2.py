"""G2: points of E'(Fp2): y^2 = x^3 + 4(u+1), as batched Jacobian arrays.

API parity with the reference's G2 facade (bls/bls_kilic.go's G2 twins).
Coordinates are Fp2 elements: uint32[..., 2, 24].
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..field.constants import G2_GENERATOR_X, G2_GENERATOR_Y
from . import fp2
from .weierstrass import CurveOps, JacobianPoint

ops = CurveOps(fp2, elem_ndim=2)

GENERATOR = JacobianPoint(
    x=fp2.from_int(list(G2_GENERATOR_X)),
    y=fp2.from_int(list(G2_GENERATOR_Y)),
    z=fp2.from_int([1, 0]),
)
INFINITY = JacobianPoint(
    x=fp2.from_int([1, 0]), y=fp2.from_int([1, 0]), z=fp2.from_int([0, 0])
)


def generator(shape=()) -> JacobianPoint:
    shp = tuple(shape) + (2, 24)
    return JacobianPoint(
        *(jnp.broadcast_to(jnp.asarray(c), shp) for c in GENERATOR)
    )


def infinity(shape=()) -> JacobianPoint:
    shp = tuple(shape) + (2, 24)
    return JacobianPoint(
        *(jnp.broadcast_to(jnp.asarray(c), shp) for c in INFINITY)
    )


add = ops.add
sub = ops.sub
neg = ops.neg
double = ops.double
eq = ops.eq
select = ops.select
is_infinity = ops.is_infinity
to_affine = ops.to_affine
from_affine = ops.from_affine
mul = ops.scalar_mul  # MulG2(point, Fr scalar)
in_subgroup = ops.in_subgroup
mul_small = ops.mul_small


def to_affine_ints(p: JacobianPoint):
    """-> ((x0,x1),(y0,y1)) int tuples or None for infinity (host)."""
    x, y, inf = to_affine(p)
    xi = fp2.to_int(x)
    yi = fp2.to_int(y)
    if np.asarray(inf).shape == ():
        if bool(inf):
            return None
        return (
            (int(xi[0]), int(xi[1])),
            (int(yi[0]), int(yi[1])),
        )
    out = []
    infs = np.asarray(inf)
    for k in range(infs.shape[0]):
        if bool(infs[k]):
            out.append(None)
        else:
            out.append(
                ((int(xi[k][0]), int(xi[k][1])), (int(yi[k][0]), int(yi[k][1])))
            )
    return out
