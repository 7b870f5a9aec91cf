"""G1: points of E(Fp): y^2 = x^3 + 4, as batched Jacobian limb arrays.

API parity with the reference's G1 facade (bls/bls_kilic.go:29-112):
MulG1/AddG1/SubG1/NegG1/ClearG1/EqualG1, generator and zero constants.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..field import fp
from ..field.constants import G1_GENERATOR_X, G1_GENERATOR_Y
from .weierstrass import CurveOps, JacobianPoint

ops = CurveOps(fp, elem_ndim=1)

# host constants
GENERATOR = JacobianPoint(
    x=fp.from_int(G1_GENERATOR_X),
    y=fp.from_int(G1_GENERATOR_Y),
    z=fp.from_int(1),
)
INFINITY = JacobianPoint(x=fp.from_int(1), y=fp.from_int(1), z=fp.from_int(0))


def generator(shape=()) -> JacobianPoint:
    g = GENERATOR
    return JacobianPoint(
        *(jnp.broadcast_to(jnp.asarray(c), tuple(shape) + (fp.N_LIMBS,)) for c in g)
    )


def infinity(shape=()) -> JacobianPoint:
    p = INFINITY
    return JacobianPoint(
        *(jnp.broadcast_to(jnp.asarray(c), tuple(shape) + (fp.N_LIMBS,)) for c in p)
    )


eq = ops.eq
select = ops.select
is_infinity = ops.is_infinity
to_affine = ops.to_affine
from_affine = ops.from_affine
mul_small = ops.mul_small
in_subgroup = ops.in_subgroup


def _pallas() -> bool:
    from ..field.backend import field_backend

    return field_backend() == "pallas"


def add(p: JacobianPoint, q: JacobianPoint) -> JacobianPoint:
    """AddG1: complete Jacobian add. Routes to the fused single-kernel
    engine (curve/pallas_g1.py) under the pallas backend; the composed
    vector path otherwise."""
    if _pallas():
        from .pallas_g1 import add_pallas

        return add_pallas(p, q)
    return ops.add(p, q)


def sub(p: JacobianPoint, q: JacobianPoint) -> JacobianPoint:
    if _pallas():
        from .pallas_g1 import add_pallas

        return add_pallas(p, ops.neg(q))
    return ops.sub(p, q)


def double(p: JacobianPoint) -> JacobianPoint:
    if _pallas():
        from .pallas_g1 import double_pallas

        return double_pallas(p)
    return ops.double(p)


neg = ops.neg


def mul(p: JacobianPoint, scalars_mont) -> JacobianPoint:
    """MulG1(point, Fr scalar), batched. Under the pallas backend the
    whole signed-window ladder (table build + 64 windows) is ONE fused
    kernel; otherwise the composed vector path (weierstrass.scalar_mul)."""
    if _pallas():
        from ..field import fr as _fr
        from .pallas_g1 import scalar_mul_pallas

        return scalar_mul_pallas(p, _fr.scalar_windows_signed(scalars_mont))
    return ops.scalar_mul(p, scalars_mont)


def from_affine_ints(coords) -> JacobianPoint:
    """[(x, y) or None, ...] python ints -> Jacobian batch (host).
    None encodes the point at infinity."""
    single = isinstance(coords, tuple) and len(coords) == 2 and isinstance(
        coords[0], int
    )
    if single or coords is None:
        coords = [coords]
    xs, ys, zs = [], [], []
    for c in coords:
        if c is None:
            xs.append(1), ys.append(1), zs.append(0)
        else:
            xs.append(c[0]), ys.append(c[1]), zs.append(1)
    pt = JacobianPoint(fp.from_int(xs), fp.from_int(ys), fp.from_int(zs))
    if single or coords == [None]:
        return JacobianPoint(pt.x[0], pt.y[0], pt.z[0])
    return pt


def to_affine_ints(p: JacobianPoint):
    """-> list of (x, y) int tuples or None for infinity (host)."""
    x, y, inf = to_affine(p)
    xs = np.atleast_1d(fp.to_int(x))
    ys = np.atleast_1d(fp.to_int(y))
    infs = np.atleast_1d(np.asarray(inf))
    out = [
        None if bool(i) else (int(a), int(b))
        for a, b, i in zip(xs.ravel(), ys.ravel(), infs.ravel())
    ]
    if np.asarray(inf).shape == ():
        return out[0]
    return out
