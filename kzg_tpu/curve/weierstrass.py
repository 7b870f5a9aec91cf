"""Generic short-Weierstrass (a=0) Jacobian point arithmetic, branchless.

Parameterized by a duck-typed field module (kzg_tpu.field.fp for G1,
kzg_tpu.curve.fp2 for G2), so the curve group logic is written once.
The reference gets these group laws from its CPU backends (kilic Jacobian
G1/G2, bls/bls_kilic.go); here every edge case (infinity, doubling) is a
masked select so the whole batch stays on the vector unit.

Points are NamedTuples of field-element arrays (X, Y, Z), infinity encoded
as Z == 0.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

from ..field import fr


class JacobianPoint(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray


class CurveOps:
    def __init__(self, F, elem_ndim: int = 1):
        self.F = F
        self._edim = elem_ndim

    # ---- constructors ----
    def infinity_like(self, p: JacobianPoint) -> JacobianPoint:
        F = self.F
        return JacobianPoint(F.one_like(p.x), F.one_like(p.y), F.zero_like(p.z))

    def from_affine(self, x, y) -> JacobianPoint:
        return JacobianPoint(x, y, self.F.one_like(x))

    def is_infinity(self, p: JacobianPoint):
        return self.F.is_zero(p.z)

    # ---- group law ----
    def _mul_tier(self, xs, ys):
        """One F.mul over stacked operand tuples: same field values as
        the individual products (multiplication is elementwise across
        the stack), but ONE lowered mul instance instead of len(xs) —
        every vector-path field op lowers to tens of KB of carry/compare
        HLO, so instance count dominates compile time of point-heavy
        programs (sharded G1 FFT/FK20, round-5)."""
        t = self.F.mul(jnp.stack(jnp.broadcast_arrays(*xs), axis=0),
                       jnp.stack(jnp.broadcast_arrays(*ys), axis=0))
        return tuple(t[i] for i in range(len(xs)))

    def double(self, p: JacobianPoint) -> JacobianPoint:
        """dbl-2009-l (a=0). Maps infinity to infinity (Z3 = 2YZ = 0)."""
        F = self.F
        a, b, yz = self._mul_tier((p.x, p.y, p.y), (p.x, p.y, p.z))
        xb = F.add(p.x, b)
        c, xb2 = self._mul_tier((b, xb), (b, xb))
        d = F.sub(xb2, F.add(a, c))
        d = F.add(d, d)
        e = F.add(F.add(a, a), a)
        f = F.mul(e, e)
        x3 = F.sub(f, F.add(d, d))
        c8 = F.add(c, c)
        c8 = F.add(c8, c8)
        c8 = F.add(c8, c8)
        y3 = F.sub(F.mul(e, F.sub(d, x3)), c8)
        z3 = F.add(yz, yz)
        return JacobianPoint(x3, y3, z3)

    def add(self, p: JacobianPoint, q: JacobianPoint) -> JacobianPoint:
        """Complete addition via masked selects (add-2007-bl core).

        Handles P==Q (falls through to double), P==-Q (infinity), and
        either operand at infinity. Products are issued in stacked tiers
        (see _mul_tier) — bit-identical values, ~2x smaller lowering.
        """
        F = self.F
        zsum = F.add(p.z, q.z)
        z1z1, z2z2, ta, tb, zz = self._mul_tier(
            (p.z, q.z, p.y, q.y, zsum), (p.z, q.z, q.z, p.z, zsum))
        u1, u2, s1, s2 = self._mul_tier(
            (p.x, q.x, ta, tb), (z2z2, z1z1, z2z2, z1z1))
        h = F.sub(u2, u1)
        rr = F.sub(s2, s1)

        h2 = F.add(h, h)
        zred = F.sub(zz, F.add(z1z1, z2z2))
        i, z3 = self._mul_tier((h2, zred), (h2, h))
        rr2 = F.add(rr, rr)
        j, v, r4 = self._mul_tier((h, u1, rr2), (i, i, rr2))
        x3 = F.sub(r4, F.add(j, F.add(v, v)))
        s1j, t5 = self._mul_tier((s1, rr2), (j, F.sub(v, x3)))
        y3 = F.sub(t5, F.add(s1j, s1j))
        generic = JacobianPoint(x3, y3, z3)

        same_x = F.is_zero(h)
        same_y = F.is_zero(rr)
        p_inf = self.is_infinity(p)
        q_inf = self.is_infinity(q)

        dbl = self.double(p)
        use_dbl = same_x & same_y & ~p_inf & ~q_inf
        res = self._select_point(use_dbl, dbl, generic)
        # P == -Q -> infinity
        inf = self.infinity_like(p)
        use_inf = same_x & ~same_y & ~p_inf & ~q_inf
        res = self._select_point(use_inf, inf, res)
        res = self._select_point(q_inf, p, res)
        res = self._select_point(p_inf, q, res)
        return res

    def neg(self, p: JacobianPoint) -> JacobianPoint:
        return JacobianPoint(p.x, self.F.neg(p.y), p.z)

    def sub(self, p: JacobianPoint, q: JacobianPoint) -> JacobianPoint:
        return self.add(p, self.neg(q))

    def _select_point(self, mask, a: JacobianPoint, b: JacobianPoint):
        F = self.F
        return JacobianPoint(
            F.select(mask, a.x, b.x),
            F.select(mask, a.y, b.y),
            F.select(mask, a.z, b.z),
        )

    def select(self, mask, a: JacobianPoint, b: JacobianPoint):
        return self._select_point(mask, a, b)

    def eq(self, p: JacobianPoint, q: JacobianPoint):
        """Projective equality: cross-multiplied coordinate comparison."""
        F = self.F
        z1z1 = F.sqr(p.z)
        z2z2 = F.sqr(q.z)
        x_eq = F.eq(F.mul(p.x, z2z2), F.mul(q.x, z1z1))
        y_eq = F.eq(
            F.mul(F.mul(p.y, q.z), z2z2), F.mul(F.mul(q.y, p.z), z1z1)
        )
        p_inf = self.is_infinity(p)
        q_inf = self.is_infinity(q)
        return (p_inf & q_inf) | (~p_inf & ~q_inf & x_eq & y_eq)

    def to_affine(self, p: JacobianPoint):
        """-> (x, y, is_infinity). Infinity maps to (0, 0, True)."""
        F = self.F
        # batched Montgomery-trick inversion: one Fermat ladder for the
        # whole point batch instead of ~500 sequential muls per call
        zinv = F.batch_inv(p.z)
        zinv2 = F.sqr(zinv)
        x = F.mul(p.x, zinv2)
        y = F.mul(p.y, F.mul(zinv, zinv2))
        inf = self.is_infinity(p)
        return F.select(inf, F.zero_like(x), x), F.select(
            inf, F.zero_like(y), y
        ), inf

    # ---- scalar multiplication ----
    def scalar_mul(self, p: JacobianPoint, scalars_mont) -> JacobianPoint:
        """Fixed 4-bit-window multiplication over the canonical scalar.

        Builds the 16-entry multiples table [O, P, 2P, ..., 15P] once per
        batch element (15 adds), then runs 64 windows of 4 fused doublings
        plus one table-gathered addition — ~256 doubles + 79 adds instead
        of the naive ladder's 255 doubles + 255 adds + selects.

        `scalars_mont` is a Montgomery-form Fr batch broadcastable against
        the point batch (the reference normalizes Fr before kilic's G1 mul
        the same way, bls/bls_kilic.go:41-45).
        """
        windows = fr.scalar_windows(scalars_mont)  # (..., 64), 4-bit values
        # broadcast point batch against scalar batch
        shape = jnp.broadcast_shapes(p.x.shape[: p.x.ndim - self._edim],
                                     windows.shape[:-1])
        p = JacobianPoint(
            *(jnp.broadcast_to(c, shape + c.shape[c.ndim - self._edim:])
              for c in p)
        )
        windows = jnp.broadcast_to(windows, shape + (64,)).astype(jnp.int32)

        # multiples table along a fresh leading axis: (16, ..., elem),
        # built with a fori_loop so the add traces once
        inf = self.infinity_like(p)
        table0 = JacobianPoint(
            *(jnp.concatenate([
                getattr(inf, c)[None],
                getattr(p, c)[None],
                jnp.zeros((14,) + getattr(p, c).shape,
                          dtype=getattr(p, c).dtype),
            ], axis=0) for c in ("x", "y", "z"))
        )

        def tb(k, tbl):
            prev = JacobianPoint(
                *(lax.dynamic_index_in_dim(c, k - 1, axis=0, keepdims=False)
                  for c in tbl)
            )
            nxt = self.add(prev, p)
            return JacobianPoint(
                *(lax.dynamic_update_index_in_dim(c, getattr(nxt, n), k,
                                                  axis=0)
                  for c, n in zip(tbl, ("x", "y", "z")))
            )

        table = lax.fori_loop(2, 16, tb, table0)

        def gather_entry(w):
            """Select table[w] per batch element; w: int32[...].

            A 15-step select chain instead of a gather (TPU gathers are
            slow; selects are plain VPU work)."""
            wexp = w.reshape(w.shape + (1,) * self._edim)

            def pick(c):
                res = c[0]
                for k in range(1, 16):
                    res = jnp.where(wexp == k, c[k], res)
                return res

            return JacobianPoint(*(pick(c) for c in table))

        acc0 = self.infinity_like(p)

        def body(i, acc):
            acc = lax.fori_loop(0, 4, lambda _, a: self.double(a), acc)
            w = lax.dynamic_index_in_dim(
                windows, 63 - i, axis=windows.ndim - 1, keepdims=False
            )
            return self.add(acc, gather_entry(w))

        return lax.fori_loop(0, 64, body, acc0)

    def scalar_mul_ladder(self, p: JacobianPoint, scalars_mont) -> JacobianPoint:
        """Reference bit-serial double-and-add ladder (kept for
        differential testing and benchmarking against the windowed path)."""
        bits = fr.scalar_bits(scalars_mont)  # (..., 256)
        shape = jnp.broadcast_shapes(p.x.shape[: p.x.ndim - self._edim],
                                     bits.shape[:-1])
        p = JacobianPoint(
            *(jnp.broadcast_to(c, shape + c.shape[c.ndim - self._edim:])
              for c in p)
        )
        bits = jnp.broadcast_to(bits, shape + (256,))
        acc0 = self.infinity_like(p)

        def body(i, acc):
            acc = self.double(acc)
            bit = lax.dynamic_index_in_dim(
                bits, 254 - i, axis=bits.ndim - 1, keepdims=False
            )
            added = self.add(acc, p)
            return self._select_point(bit == 1, added, acc)

        return lax.fori_loop(0, 255, body, acc0)

    def mul_static_int(self, p: JacobianPoint, k: int) -> JacobianPoint:
        """p * k for a static (arbitrarily large) non-negative Python int.

        Bit-serial ladder over a constant bit table inside a fori_loop,
        so the double/add pair traces once regardless of bit length
        (compile-light; used by the batched subgroup check)."""
        if k == 0:
            return self.infinity_like(p)
        nbits = k.bit_length()
        bits = jnp.asarray(
            [(k >> (nbits - 1 - i)) & 1 for i in range(nbits)],
            dtype=jnp.uint32,
        )

        def body(i, acc):
            acc = self.double(acc)
            added = self.add(acc, p)
            return self._select_point(bits[i] == 1, added, acc)

        return lax.fori_loop(0, nbits, body, self.infinity_like(p))

    def in_subgroup(self, p: JacobianPoint):
        """r-torsion membership mask: [r]P == O (batched). The cofactors
        of BLS12-381 G1/G2 are large, so on-curve does not imply
        in-subgroup (reference validates on deserialization,
        bls/bls_kilic.go:122-130)."""
        return self.is_infinity(self.mul_static_int(p, fr.SPEC.modulus))

    def mul_small(self, p: JacobianPoint, k: int) -> JacobianPoint:
        """p * k for a small static non-negative integer."""
        acc = self.infinity_like(p)
        if k == 0:
            return acc
        for bit in bin(k)[2:]:
            acc = self.double(acc)
            if bit == "1":
                acc = self.add(acc, p)
        return acc
