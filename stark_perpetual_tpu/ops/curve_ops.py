"""Batched Stark-curve arithmetic in Jacobian coordinates (Montgomery domain).

TPU-first design: affine formulas (one modular inversion per EC add, as in
the reference's math_utils.py:59-88) are hostile to wide batches, so the
batched path uses Jacobian coordinates -- no inversions inside the hot loop,
one batched inversion at the very end (`to_affine`).

Point representation: three int32 limb arrays (X, Y, Z), shape (..., 21),
values in Montgomery form. Z == 0 encodes the point at infinity.
Curve: y^2 = x^3 + alpha*x + beta with alpha = 1.
"""

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from stark_perpetual_tpu.ops.field import Field, stark_prime_field


class JacPoint(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray


class CurveOps:
    def __init__(self, field: Field = None):
        self.f = field if field is not None else stark_prime_field()
        from stark_perpetual_tpu.params import ALPHA

        assert ALPHA == 1
        # alpha in Montgomery form, for the doubling formula's a*Z^4 term.
        self.alpha_mont = np.asarray(self.f.pack((1 << 252) % self.f.modulus))

    # -- constructors ------------------------------------------------------

    def infinity(self, shape=()) -> JacPoint:
        z = self.f.zeros(shape)
        return JacPoint(z, z, z)

    def from_affine_mont(self, x_mont: jnp.ndarray, y_mont: jnp.ndarray) -> JacPoint:
        one = jnp.broadcast_to(jnp.asarray(self.f.one_mont_limbs), x_mont.shape)
        return JacPoint(x_mont, y_mont, one)

    def pack_affine_mont(self, points) -> Tuple[np.ndarray, np.ndarray]:
        """Host: [(x, y), ...] ints -> Montgomery limb arrays ((N,21), (N,21))."""
        p = self.f.modulus
        xs = [(x << 252) % p for x, _ in points]
        ys = [(y << 252) % p for _, y in points]
        from stark_perpetual_tpu.ops.field import pack_ints

        return pack_ints(xs), pack_ints(ys)

    # -- group law ---------------------------------------------------------

    def double(self, p: JacPoint) -> JacPoint:
        """2P (dbl-2007-bl, general a). Infinity doubles to infinity."""
        f = self.f
        X, Y, Z = p
        XX = f.mont_mul(X, X)
        YY = f.mont_mul(Y, Y)
        YYYY = f.mont_mul(YY, YY)
        ZZ = f.mont_mul(Z, Z)
        # S = 2*((X+YY)^2 - XX - YYYY)
        t = f.add(X, YY)
        S = f.sub(f.sub(f.mont_mul(t, t), XX), YYYY)
        S = f.add(S, S)
        # M = 3*XX + a*ZZ^2
        M = f.add(f.add(XX, XX), XX)
        aZZ2 = f.mont_mul(jnp.broadcast_to(jnp.asarray(self.alpha_mont), ZZ.shape),
                          f.mont_mul(ZZ, ZZ))
        M = f.add(M, aZZ2)
        # X3 = M^2 - 2S ; Y3 = M*(S - X3) - 8*YYYY ; Z3 = (Y+Z)^2 - YY - ZZ
        X3 = f.sub(f.mont_mul(M, M), f.add(S, S))
        e8 = f.add(YYYY, YYYY)
        e8 = f.add(e8, e8)
        e8 = f.add(e8, e8)
        Y3 = f.sub(f.mont_mul(M, f.sub(S, X3)), e8)
        yz = f.add(Y, Z)
        Z3 = f.sub(f.sub(f.mont_mul(yz, yz), YY), ZZ)
        return JacPoint(X3, Y3, Z3)

    def add_mixed(
        self,
        p: JacPoint,
        x2: jnp.ndarray,
        y2: jnp.ndarray,
        skip: jnp.ndarray = None,
    ):
        """P + (x2, y2) with (x2, y2) affine-Montgomery, never infinity.

        Returns (result, exceptional) where `exceptional` flags lanes that hit
        the doubling case (P == Q): the generic formula is invalid there and
        the lane's output is garbage. Callers treat it like the reference's
        "Unhashable input" error (probability ~2^-250 for honest inputs).
        P == -Q yields infinity correctly. P == infinity yields Q.
        `skip` (bool, batch-shaped): lanes where the add is a no-op.
        """
        f = self.f
        X1, Y1, Z1 = p
        Z1Z1 = f.mont_mul(Z1, Z1)
        U2 = f.mont_mul(x2, Z1Z1)
        S2 = f.mont_mul(y2, f.mont_mul(Z1, Z1Z1))
        H = f.sub(U2, X1)
        HH = f.mont_mul(H, H)
        I = f.add(f.add(HH, HH), f.add(HH, HH))
        J = f.mont_mul(H, I)
        r = f.sub(S2, Y1)
        r = f.add(r, r)
        V = f.mont_mul(X1, I)
        X3 = f.sub(f.sub(f.mont_mul(r, r), J), f.add(V, V))
        Y1J = f.mont_mul(Y1, J)
        Y3 = f.sub(f.mont_mul(r, f.sub(V, X3)), f.add(Y1J, Y1J))
        z1h = f.add(Z1, H)
        Z3 = f.sub(f.sub(f.mont_mul(z1h, z1h), Z1Z1), HH)

        p_inf = f.is_zero(Z1)
        h_zero = f.is_zero(H)
        r_zero = f.is_zero(r)
        # Doubling case (invalid for the generic formula): P finite, H=0, r=0.
        exceptional = jnp.logical_and(jnp.logical_not(p_inf), jnp.logical_and(h_zero, r_zero))

        one = jnp.broadcast_to(jnp.asarray(f.one_mont_limbs), x2.shape)
        sel_inf = p_inf[..., None]
        X3 = jnp.where(sel_inf, x2, X3)
        Y3 = jnp.where(sel_inf, y2, Y3)
        Z3 = jnp.where(sel_inf, one, Z3)
        if skip is not None:
            sel_skip = skip[..., None]
            X3 = jnp.where(sel_skip, X1, X3)
            Y3 = jnp.where(sel_skip, Y1, Y3)
            Z3 = jnp.where(sel_skip, Z1, Z3)
            exceptional = jnp.logical_and(exceptional, jnp.logical_not(skip))
        return JacPoint(X3, Y3, Z3), exceptional

    def add(self, p: JacPoint, q: JacPoint):
        """General Jacobian + Jacobian addition (add-2007-bl) with case fixups.

        Returns (result, exceptional): exceptional marks doubling-case lanes
        (both finite, same x, same y) where the generic formula is invalid;
        those lanes instead receive double(p), so the result is total.
        """
        f = self.f
        X1, Y1, Z1 = p
        X2, Y2, Z2 = q
        Z1Z1 = f.mont_mul(Z1, Z1)
        Z2Z2 = f.mont_mul(Z2, Z2)
        U1 = f.mont_mul(X1, Z2Z2)
        U2 = f.mont_mul(X2, Z1Z1)
        S1 = f.mont_mul(Y1, f.mont_mul(Z2, Z2Z2))
        S2 = f.mont_mul(Y2, f.mont_mul(Z1, Z1Z1))
        H = f.sub(U2, U1)
        HH = f.add(H, H)
        I = f.mont_mul(HH, HH)
        J = f.mont_mul(H, I)
        r = f.sub(S2, S1)
        r = f.add(r, r)
        V = f.mont_mul(U1, I)
        X3 = f.sub(f.sub(f.mont_mul(r, r), J), f.add(V, V))
        S1J = f.mont_mul(S1, J)
        Y3 = f.sub(f.mont_mul(r, f.sub(V, X3)), f.add(S1J, S1J))
        z12 = f.add(Z1, Z2)
        Z3 = f.mont_mul(f.sub(f.sub(f.mont_mul(z12, z12), Z1Z1), Z2Z2), H)

        p_inf = f.is_zero(Z1)
        q_inf = f.is_zero(Z2)
        h_zero = f.is_zero(H)
        r_zero = f.is_zero(r)
        both_finite = jnp.logical_not(jnp.logical_or(p_inf, q_inf))
        dbl_case = jnp.logical_and(both_finite, jnp.logical_and(h_zero, r_zero))

        dbl = self.double(p)
        sel_dbl = dbl_case[..., None]
        X3 = jnp.where(sel_dbl, dbl.x, X3)
        Y3 = jnp.where(sel_dbl, dbl.y, Y3)
        Z3 = jnp.where(sel_dbl, dbl.z, Z3)
        sel_p_inf = p_inf[..., None]
        X3 = jnp.where(sel_p_inf, X2, X3)
        Y3 = jnp.where(sel_p_inf, Y2, Y3)
        Z3 = jnp.where(sel_p_inf, Z2, Z3)
        sel_q_inf = q_inf[..., None]
        X3 = jnp.where(sel_q_inf, X1, X3)
        Y3 = jnp.where(sel_q_inf, Y1, Y3)
        Z3 = jnp.where(sel_q_inf, Z1, Z3)
        return JacPoint(X3, Y3, Z3), dbl_case

    # -- output conversion -------------------------------------------------

    def to_affine(self, p: JacPoint, group: int = None):
        """Jacobian -> affine (Montgomery domain) via batched inversion.

        Infinity lanes return (0, 0). p.z has shape (N, 21); the inversion
        group is the largest divisor of N up to 64 unless given.
        """
        f = self.f
        n = p.z.shape[0]
        if group is None:
            group = next(g for g in range(min(64, n), 0, -1) if n % g == 0)
        zinv = f.batch_inv(p.z, group=group)
        zinv2 = f.mont_mul(zinv, zinv)
        zinv3 = f.mont_mul(zinv2, zinv)
        x = f.mont_mul(p.x, zinv2)
        y = f.mont_mul(p.y, zinv3)
        inf = f.is_zero(p.z)[..., None]
        zero = jnp.zeros_like(x)
        return jnp.where(inf, zero, x), jnp.where(inf, zero, y)
