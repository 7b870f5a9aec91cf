"""Multi-scalar multiplication (the reference's LinCombG1,
bls/bls_kilic.go:132-150, backed by kilic's Pippenger MultiExp).

TPU-native Pippenger analogue — the "shared-table windowed" MSM:

    sum_i k_i * P_i  =  sum_j 16^j * S_j,    S_j = sum_i s_ij * P_i

with s_ij the signed 4-bit digits of k_i (fr.scalar_windows_signed).
Each point builds ONE small multiples table [0..8]*P_i (7 batched adds,
shared by all 64 windows); each window sum S_j is a select-chain lookup
(9 masked selects — plain VPU work, no gathers) followed by a batched
binary tree reduction over the point axis, with all 64 windows stacked
on a trailing batch axis so every tree level is one fused add over the
whole (N/2^k, 64) block. The final combine is a single 63-step Horner
loop (4 doublings + 1 add per window) on one point.

Versus the v1 per-point windowed scalar-mul (256 doublings per point),
this shares all doublings across the batch: ~770 Fp-muls per point
instead of ~2700, with much shallower sequential depth — the same
work-sharing that makes CPU Pippenger win, recast as full-batch vector
ops. The per-window partial sums are also the natural unit for the
sharded MSM (kzg_tpu.parallel.msm_sharded): shards reduce their local
window sums, all-gather 64 points, and combine.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..field import fr
from .weierstrass import CurveOps, JacobianPoint
from . import g1

N_WINDOWS = 64


FOLD_BELOW = 16  # tree width below which the reduction scan-folds


def _g1_ops():
    """The active G1 engine: fused Pallas kernels on TPU (one launch per
    point op, curve/pallas_g1.py), the composed vector path elsewhere."""
    from ..field.backend import field_backend

    if field_backend() == "pallas":
        from .pallas_g1 import ops_pallas

        return ops_pallas
    return g1.ops


def tree_reduce(ops, points: JacobianPoint) -> JacobianPoint:
    """Sum a (N, ...) batch of points along axis 0.

    Halving levels (one batched add per level) carry ~97% of the work in
    the first few levels, so they are unrolled only while the width
    exceeds FOLD_BELOW; the narrow tail is a lax.scan fold whose add
    traces ONCE. This keeps the compiled module small — point adds are
    enormous HLO graphs (~16 Fp muls of static-carry limb arithmetic
    each), and unrolling all log2(N) levels made cold XLA compiles of
    MSM programs take minutes (the round-1 multichip-dryrun timeout).
    The tail fold adds < FOLD_BELOW sequential loop steps of negligible
    width: same total adds as the full tree, tiny extra depth.
    """
    n = points.x.shape[0]
    while n > FOLD_BELOW:
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
    if n == 1:
        return JacobianPoint(points.x[0], points.y[0], points.z[0])
    first = JacobianPoint(points.x[0], points.y[0], points.z[0])

    def body(acc, row):
        return ops.add(acc, JacobianPoint(*row)), None

    acc, _ = lax.scan(
        body, first, (points.x[1:], points.y[1:], points.z[1:]))
    return acc


def _multiples_table(ops: CurveOps, p: JacobianPoint) -> JacobianPoint:
    """[0..8]*P stacked on a new leading axis: coords (9, N..., elem).

    Built as a scan of k*P + P so the (complete) add traces once —
    compile-light for the same reason as tree_reduce's tail; the first
    step's P+P falls through add's doubling select."""
    inf = ops.infinity_like(p)

    def body(acc, _):
        nxt = ops.add(acc, p)
        return nxt, nxt

    _, mults = lax.scan(body, p, None, length=7)  # (7, N..., elem) = 2P..8P
    return JacobianPoint(
        *(jnp.concatenate([i[None], b[None], m], axis=0)
          for i, b, m in zip(inf, p, mults))
    )


def window_sums(ops: CurveOps, points: JacobianPoint,
                scalars_mont) -> JacobianPoint:
    """Per-window partial sums S_j = sum_i s_ij * P_i.

    points: (N,) batch; scalars: (..., N) Fr Montgomery batch (leading
    dims batch independent MSMs over the same points, e.g. per-blob
    commitments). Returns a JacobianPoint with coords (..., 64, elem).
    """
    edim = ops._edim
    digits = fr.scalar_windows_signed(scalars_mont)  # (..., N, 64)
    digits = jnp.moveaxis(digits, -2, 0)             # (N, ..., 64)
    bdims = digits.ndim - 2                          # scalar batch rank
    table = _multiples_table(ops, points)            # coords (9, N, elem)

    mag = jnp.abs(digits)
    negm = digits < 0                                # (N, ..., 64)
    mag = mag.reshape(mag.shape + (1,) * edim)       # (N, ..., 64, 1*edim)

    def sel(c):
        # c: (9, N, elem) -> broadcast over scalar batch + window axes
        cexp = c.reshape((9, c.shape[1]) + (1,) * (bdims + 1) + c.shape[2:])
        res = jnp.broadcast_to(cexp[0], mag.shape[:-edim] + c.shape[2:])
        for k in range(1, 9):
            res = jnp.where(mag == k, cexp[k], res)
        return res

    selected = JacobianPoint(sel(table.x), sel(table.y), sel(table.z))
    # negative digit -> negate the point (one field negation on y)
    selected = JacobianPoint(
        selected.x,
        ops.F.select(negm, ops.F.neg(selected.y), selected.y),
        selected.z,
    )
    return tree_reduce(ops, selected)  # coords (..., 64, elem)


def horner_windows(ops: CurveOps, wsums: JacobianPoint) -> JacobianPoint:
    """Combine LSB-first window sums: acc = sum_j 16^j * S_j via Horner
    (63 iterations of 4 doublings + 1 add). wsums coords: (..., 64, elem);
    returns coords (..., elem)."""
    edim = ops._edim
    waxis = wsums.x.ndim - edim - 1

    def at(j):
        return JacobianPoint(
            *(lax.dynamic_index_in_dim(c, j, axis=waxis, keepdims=False)
              for c in wsums)
        )

    acc0 = at(N_WINDOWS - 1)

    def body(i, acc):
        acc = lax.fori_loop(0, 4, lambda _, a: ops.double(a), acc)
        return ops.add(acc, at(N_WINDOWS - 2 - i))

    return lax.fori_loop(0, N_WINDOWS - 1, body, acc0)


@jax.jit
def lin_comb_g1(points: JacobianPoint, scalars_mont) -> JacobianPoint:
    """MSM: sum_i scalars[i] * points[i]. points: (N,) G1 batch,
    scalars: (..., N) Fr Montgomery batch (leading dims = independent
    MSMs over the same points). Returns coords (..., elem)."""
    ops = _g1_ops()
    return horner_windows(ops, window_sums(ops, points, scalars_mont))


@jax.jit
def sum_g1(points: JacobianPoint) -> JacobianPoint:
    return tree_reduce(_g1_ops(), points)
