"""KZG commitments and single/multi (coset) proofs.

TPU-native counterpart of the reference's KZGSettings layer
(kzg.go:11-36, kzg_single_proofs.go, kzg_multi_proofs.go): commitments and
quotient polynomials are batched device work (MSM + FFT + fused field ops);
the constant-size pairing checks at the end of verification run on host
over exact integers (kzg_tpu.curve.pairing).

Conventions:
  * polynomial coefficients / evaluations: device Montgomery limb arrays
    uint32[n, 16]
  * points entering/leaving verification: host affine int tuples
    (a handful of points; the host<->device boundary is the same place the
    reference crosses from bignum vectors into pairing-engine types)
  * scalars x, y for verification: Python ints (canonical field values)
"""

from __future__ import annotations

import jax.numpy as jnp

import functools

import jax
import numpy as np

from .. import poly
from ..curve import fp2, g1, g2, pairing
from ..curve.msm import lin_comb_g1
from ..curve.weierstrass import JacobianPoint
from ..field import fr
from ..field.constants import FR_MODULUS
from ..ntt.domain import FFTSettings
from ..ntt.fft_fr import fft
from ..utils import host_ec


@functools.partial(jax.jit, static_argnames=("max_width",))
def _check_multi_batch(commitment, proofs, ys, scale, xl_mont, crs_l,
                       rev_roots, x2_s2l, y2_s2l, max_width: int):
    """One device program for N coset-proof checks: batched coset
    interpolation + commitment MSMs, batched G2 [s^l - x^l]_2, and the
    N-lane pairing product check."""
    from ..curve.pairing_device import pairings_product_is_one
    from ..ntt.fft_fr import _fft_core

    n_samples, l = ys.shape[0], ys.shape[1]
    coset_ifft = _fft_core(ys, rev_roots, l.bit_length() - 1,
                           max_width=max_width)
    interp = fr.mul(coset_ifft, scale)            # (N, l, 16)
    is1 = lin_comb_g1(crs_l, interp)              # (N,) points
    cb = JacobianPoint(*(
        jnp.broadcast_to(c, (n_samples,) + c.shape[-1:])
        for c in commitment))
    a1 = g1.ops.sub(is1, cb)                      # -(commitment - is1)
    # b2 = [s^l]_2 - [x^l]_2, batched on device
    s2l = JacobianPoint(x2_s2l, y2_s2l, fp2.one_like(x2_s2l))
    xg2 = g2.ops.scalar_mul(g2.generator((n_samples,)), xl_mont)
    b2 = g2.ops.sub(
        JacobianPoint(*(
            jnp.broadcast_to(c, (n_samples,) + c.shape[-2:])
            for c in s2l)),
        xg2)
    b2_aff = g2.ops.to_affine(b2)
    gx2, gy2, _ = g2.ops.to_affine(g2.generator((n_samples,)))
    ginf = jnp.zeros((n_samples,), dtype=bool)
    return pairings_product_is_one(
        a1, (gx2, gy2, ginf), proofs, b2_aff)


def _as_affine_g1(pt):
    """Device JacobianPoint (single) or host affine tuple -> host affine."""
    if isinstance(pt, JacobianPoint):
        return g1.to_affine_ints(pt)
    return pt


class KZGSettings:
    """Holds the FFT domain plus the CRS [s^i]_1, [s^i]_2.

    secret_g1: device JacobianPoint batch (n,)
    secret_g2_affine: host list of affine Fp2 pairs (pairing side)
    (reference: KZGSettings, kzg.go:11-36)
    """

    def __init__(self, fs: FFTSettings, secret_g1: JacobianPoint,
                 secret_g2_affine, secret_g1_affine=None):
        n = secret_g1.x.shape[0]
        if len(secret_g2_affine) != n:
            raise ValueError("secret g1/g2 length mismatch")
        self.fs = fs
        self.secret_g1 = secret_g1
        self.secret_g2_affine = list(secret_g2_affine)
        self.secret_g1_affine = (
            list(secret_g1_affine) if secret_g1_affine is not None else None
        )

        # Whole-pipeline jits: commitments and quotient proofs run as one
        # device dispatch each (per polynomial size).
        import jax

        self._jit_commit = jax.jit(self._commit_impl)
        self._jit_proof_domain = jax.jit(
            lambda coeffs, z: self._commit_impl(
                poly.poly_quotient_on_domain(self.fs, coeffs, z))
        )
        self._jit_proof_serial = jax.jit(
            lambda coeffs, z: self._commit_impl(
                poly.poly_factor_div(coeffs, z))
        )
        self._jit_proof_multi = jax.jit(
            lambda coeffs, divisor: self._commit_impl(
                poly.poly_long_div(coeffs, divisor))
        )
        self._jit_interp_commit = jax.jit(self._interp_commit_impl)

    def _commit_impl(self, coeffs) -> JacobianPoint:
        n = coeffs.shape[0]
        pts = JacobianPoint(*(c[:n] for c in self.secret_g1))
        return lin_comb_g1(pts, coeffs)

    def _interp_commit_impl(self, ys, xinv_mont) -> JacobianPoint:
        n = ys.shape[0]
        coset_ifft = fft(self.fs, ys, inverse=True)
        scale = poly.powers_of(xinv_mont, n)
        return self._commit_impl(fr.mul(coset_ifft, scale))

    # ---------------- commitments ----------------
    def commit_to_poly(self, coeffs) -> JacobianPoint:
        """MSM of the CRS against the coefficients
        (reference: CommitToPoly, kzg_single_proofs.go:17-20)."""
        return self._jit_commit(coeffs)

    def commit_to_eval_poly(self, evals) -> JacobianPoint:
        """IFFT to coefficient form, then commit
        (reference: CommitToEvalPoly, kzg_single_proofs.go:12-15)."""
        return self.commit_to_poly(fft(self.fs, evals, inverse=True))

    # ---------------- single-point proofs ----------------
    def compute_proof_single(self, coeffs, x0: int,
                             method: str = "auto") -> JacobianPoint:
        """Commitment to q(x) = (p(x) - p(x0)) / (x - x0)
        (reference: ComputeProofSingle, kzg_single_proofs.go:36-54).

        method: "auto" uses the fully-parallel evaluation-domain quotient
        when n is a power of two and x0 is outside the domain (the random-
        challenge case); "serial" forces the synthetic-division scan.
        """
        n = coeffs.shape[0]
        z = jnp.asarray(fr.from_int(x0 % FR_MODULUS))
        pow2 = n & (n - 1) == 0
        in_domain = pow(x0 % FR_MODULUS, n, FR_MODULUS) == 1 if pow2 else True
        if method == "auto" and pow2 and not in_domain and n >= 2:
            return self._jit_proof_domain(coeffs, z)
        return self._jit_proof_serial(coeffs, z)

    def check_proof_single(self, commitment, proof, x: int, y: int) -> bool:
        """Pairing check e(proof, [s - x]_2) == e(commitment - [y]_1, G2)
        (reference: CheckProofSingle, kzg_single_proofs.go:57-75)."""
        c = _as_affine_g1(commitment)
        pi = _as_affine_g1(proof)
        s2 = self.secret_g2_affine[1]
        x2 = host_ec.g2_mul(host_ec.g2_generator(), x % FR_MODULUS)
        xn2 = host_ec.g2_sub(s2, x2)  # [s - x]_2
        y1 = host_ec.g1_mul(host_ec.g1_generator(), y % FR_MODULUS)
        cm = host_ec.g1_sub(c, y1)  # commitment - [y]_1
        return pairing.pairings_verify(
            host_ec.g1_neg(cm), host_ec.g2_generator(), pi, xn2
        )

    # ---------------- multi-point (coset) proofs ----------------
    def compute_proof_multi(self, coeffs, x0: int, n: int) -> JacobianPoint:
        """Proof for p on the coset x0 * <w_n>: commitment to
        q(x) = p(x) / (x^n - x0^n)
        (reference: ComputeProofMulti, kzg_multi_proofs.go:13-43)."""
        if n & (n - 1) != 0:
            raise ValueError("n must be a power of two")
        xn = pow(x0 % FR_MODULUS, n, FR_MODULUS)
        divisor = jnp.concatenate(
            [
                jnp.asarray(fr.from_int((-xn) % FR_MODULUS))[None, :],
                fr.zeros((n - 1,)),
                jnp.asarray(fr.from_int(1))[None, :],
            ],
            axis=0,
        )
        return self._jit_proof_multi(coeffs, divisor)

    def check_proof_multi_batch(self, commitment, proofs, xs, ys) -> list:
        """Verify N coset proofs at once on the device: for every sample
        i, p(x_i * w^j) == ys[i, j] for all j — the DAS consumer's
        verification hot path (the reference loops CheckProofMulti per
        sample, kzg_multi_proofs.go:47-88 / integration_test.go:110-113;
        here the N pairing-product checks run as one jitted program with
        batched Miller loops over the TPU Fp12 tower,
        curve/pairing_device.py).

        commitment: device JacobianPoint (single); proofs: device
        JacobianPoint batch (N,); xs: host ints (N coset offsets);
        ys: device uint32[N, l, 16]. Returns [bool] * N.
        """
        n_samples, l = ys.shape[0], ys.shape[1]
        if len(xs) != n_samples:
            raise ValueError("xs/ys length mismatch")
        # interpolation scale x_i^-j, host-precomputed (N*l mod-muls)
        xinvs = [pow(int(x) % FR_MODULUS, -1, FR_MODULUS) for x in xs]
        scale = np.empty((n_samples, l), dtype=object)
        for i, xi in enumerate(xinvs):
            p, cur = [], 1
            for _ in range(l):
                p.append(cur)
                cur = cur * xi % FR_MODULUS
            scale[i] = p
        scale_dev = jnp.asarray(fr.from_int(scale))
        xl_mont = jnp.asarray(fr.from_int(
            [pow(int(x) % FR_MODULUS, l, FR_MODULUS) for x in xs]))
        s2l = self.secret_g2_affine[l]
        x2 = jnp.asarray(fp2.from_int(list(s2l[0])))
        y2 = jnp.asarray(fp2.from_int(list(s2l[1])))
        ok = _check_multi_batch(
            commitment, proofs, ys, scale_dev, xl_mont,
            JacobianPoint(*(c[:l] for c in self.secret_g1)),
            self.fs.reverse_roots_of_unity, x2, y2,
            max_width=self.fs.max_width)
        return [bool(v) for v in np.asarray(ok)]

    def check_proof_multi(self, commitment, proof, x: int, ys) -> bool:
        """Verify p(x*w^i) == ys[i] for all i in one pairing
        (reference: CheckProofMulti, kzg_multi_proofs.go:47-88).

        ys: device uint32[n, 16] claimed evaluations on the coset, in the
        domain's natural order.
        """
        n = ys.shape[0]
        # interpolate on the coset (IFFT + unscale by x^-i) and commit,
        # in one fused dispatch
        xinv = pow(x % FR_MODULUS, -1, FR_MODULUS)
        is1 = self._jit_interp_commit(
            ys, jnp.asarray(fr.from_int(xinv)))  # [interp(s)]_1

        xn = pow(x % FR_MODULUS, n, FR_MODULUS)
        xn2 = host_ec.g2_mul(host_ec.g2_generator(), xn)
        xn_minus = host_ec.g2_sub(self.secret_g2_affine[n], xn2)  # [s^n-x^n]_2
        cm = host_ec.g1_sub(_as_affine_g1(commitment), _as_affine_g1(is1))
        return pairing.pairings_verify(
            host_ec.g1_neg(cm), host_ec.g2_generator(),
            _as_affine_g1(proof), xn_minus,
        )
