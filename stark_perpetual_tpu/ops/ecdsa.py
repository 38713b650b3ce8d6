"""Batched Stark-curve ECDSA for TPU: AIR-mimicking verify + sign core.

Bit-exactness contract (reference: signature.py:113-260):
  - verify reproduces `mimic_ec_mult_air` failure semantics *vectorized*: the
    reference raises AssertionError when the running partial sum shares an x
    coordinate with the scanned point; here that predicate poisons the lane
    and the lane verifies False -- exactly the lanes where the reference
    (and the AIR) fail.
  - r = x(kG) with no mod-n reduction; validity windows r, w in [1, 2^251),
    msg < 2^251, s in [1, n).
  - sign uses host-side RFC-6979 k (deterministic, seed-retry) and computes
    r, s on device with batched fixed-base scalar-mul + scalar-field ops.

Everything data-dependent is expressed as lax.scan over 251 steps with
select/poison lanes: no data-dependent control flow inside jit.
"""

import functools
from typing import List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from stark_perpetual_tpu.ops.curve_ops import CurveOps, JacPoint
from stark_perpetual_tpu.ops.field import (
    N_LIMBS,
    curve_order_field,
    pack_ints,
    stark_prime_field,
)
from stark_perpetual_tpu.ops import pedersen as _ped
from stark_perpetual_tpu.params import (
    ALPHA,
    BETA,
    EC_GEN,
    EC_ORDER,
    FIELD_PRIME,
    MINUS_SHIFT_POINT,
    N_ELEMENT_BITS_ECDSA,
    SHIFT_POINT,
)
from stark_perpetual_tpu.utils.math_utils import ec_double

_N_BITS = N_ELEMENT_BITS_ECDSA  # 251


def bit_decompose(limbs: jnp.ndarray, n_bits: int = _N_BITS) -> jnp.ndarray:
    """(..., 21) 12-bit limbs -> (..., n_bits) bits (int32 0/1).

    Vectorized: one broadcast shift over a (21, 12) bit grid instead of
    n_bits sliced shifts.
    """
    grid = (limbs[..., :, None] >> jnp.arange(12, dtype=limbs.dtype)) & 1
    flat = grid.reshape(*limbs.shape[:-1], limbs.shape[-1] * 12)
    return flat[..., :n_bits]


@functools.lru_cache(maxsize=1)
def _gen_pow_table() -> Tuple[np.ndarray, np.ndarray]:
    """Affine Montgomery tables of 2^k * EC_GEN for k in [0, 251)."""
    pts = []
    g = EC_GEN
    for _ in range(_N_BITS):
        pts.append(g)
        g = ec_double(g, ALPHA, FIELD_PRIME)
    curve = CurveOps()
    return curve.pack_affine_mont(pts)


class EcdsaOps:
    def __init__(self):
        self.curve = CurveOps()
        self.fp = stark_prime_field()
        self.fn = curve_order_field()
        # Constants (standard-domain packing done on host).
        p = FIELD_PRIME
        self.shift_x, self.shift_y = self.curve.pack_affine_mont([SHIFT_POINT])
        self.mshift_x, self.mshift_y = self.curve.pack_affine_mont([MINUS_SHIFT_POINT])
        self.beta_mont = self.fp.pack((BETA << 252) % p)
        self.alpha_mont = self.fp.pack((ALPHA << 252) % p)
        gx, gy = _gen_pow_table()
        self.gen_pow_x, self.gen_pow_y = jnp.asarray(gx), jnp.asarray(gy)

    # -- mimic scans -------------------------------------------------------

    def _mimic_fixed_base(self, bits: jnp.ndarray, shift_xy, n: int):
        """m * G + shift via 251 steps over the precomputed 2^k G table.

        bits: (N, 251). Returns (JacPoint, poison) where poison marks lanes
        where any step had x(partial) == x(2^k G) -- the AIR failure.
        """
        f = self.fp
        sx = jnp.broadcast_to(jnp.asarray(shift_xy[0][0]), (n, N_LIMBS))
        sy = jnp.broadcast_to(jnp.asarray(shift_xy[1][0]), (n, N_LIMBS))
        acc = self.curve.from_affine_mont(sx, sy)
        poison0 = jnp.zeros((n,), dtype=bool)

        def body(carry, xs):
            acc, poison = carry
            gx, gy, bit = xs  # (21,), (21,), (N,)
            zz = f.mont_mul(acc.z, acc.z)
            gxb = jnp.broadcast_to(gx, acc.x.shape)
            gyb = jnp.broadcast_to(gy, acc.x.shape)
            coll = f.eq(acc.x, f.mont_mul(gxb, zz))
            nxt, exc = self.curve.add_mixed(acc, gxb, gyb, skip=(bit == 0))
            return (nxt, poison | coll | exc), None

        (acc, poison), _ = jax.lax.scan(
            body, (acc, poison0), (self.gen_pow_x, self.gen_pow_y, bits.swapaxes(0, 1))
        )
        return acc, poison

    def _mimic_var_base(self, bits: jnp.ndarray, base: JacPoint, shift_xy, n: int):
        """m * base + shift, doubling the (variable) base inside the scan."""
        f = self.fp
        sx = jnp.broadcast_to(jnp.asarray(shift_xy[0][0]), (n, N_LIMBS))
        sy = jnp.broadcast_to(jnp.asarray(shift_xy[1][0]), (n, N_LIMBS))
        acc = self.curve.from_affine_mont(sx, sy)
        poison0 = jnp.zeros((n,), dtype=bool)

        def body(carry, bit):
            acc, q, poison = carry
            # x-collision in Jacobian: X_a * Z_q^2 == X_q * Z_a^2.
            zq2 = f.mont_mul(q.z, q.z)
            za2 = f.mont_mul(acc.z, acc.z)
            coll = f.eq(f.mont_mul(acc.x, zq2), f.mont_mul(q.x, za2))
            added, exc = self.curve.add(acc, q)
            keep = (bit == 0)[..., None]
            nxt = JacPoint(
                jnp.where(keep, acc.x, added.x),
                jnp.where(keep, acc.y, added.y),
                jnp.where(keep, acc.z, added.z),
            )
            exc = jnp.logical_and(exc, bit != 0)
            q2 = self.curve.double(q)
            return (nxt, q2, poison | coll | exc), None

        (acc, _, poison), _ = jax.lax.scan(body, (acc, base, poison0), bits.swapaxes(0, 1))
        return acc, poison

    # -- verify ------------------------------------------------------------

    def _on_curve(self, x_mont: jnp.ndarray, y_mont: jnp.ndarray) -> jnp.ndarray:
        f = self.fp
        y2 = f.mont_mul(y_mont, y_mont)
        x2 = f.mont_mul(x_mont, x_mont)
        x3 = f.mont_mul(x2, x_mont)
        ax = f.mont_mul(jnp.broadcast_to(jnp.asarray(self.alpha_mont), x_mont.shape), x_mont)
        rhs = f.add(f.add(x3, ax), jnp.broadcast_to(jnp.asarray(self.beta_mont), x_mont.shape))
        return f.eq(y2, rhs)

    def _lt_2_251(self, std_limbs: jnp.ndarray) -> jnp.ndarray:
        return std_limbs[..., 20] < (1 << 11)

    def verify_impl(self, msg, r, s, pub_x, pub_y):
        """All inputs standard-domain (N, 21) limbs. Returns (valid, input_ok).

        input_ok mirrors the reference's *assertions* (ranges, curve
        membership); valid mirrors its return value. Lanes with
        input_ok=False have unspecified `valid` (the reference raises there).
        """
        f, fn = self.fp, self.fn
        n = msg.shape[0]

        from stark_perpetual_tpu.ops.field import _sub_limbs

        n_limbs_b = jnp.broadcast_to(jnp.asarray(fn.mod_limbs), s.shape)
        _, s_borrow = _sub_limbs(s, n_limbs_b)
        s_ok = jnp.logical_and(s_borrow == 1, jnp.logical_not(fn.is_zero(s)))

        w_mont = fn.inv(fn.to_mont(s))
        w = fn.from_mont(w_mont)

        input_ok = (
            s_ok
            & self._lt_2_251(r)
            & jnp.logical_not(f.is_zero(r))
            & self._lt_2_251(w)
            & jnp.logical_not(f.is_zero(w))
            & self._lt_2_251(msg)
        )

        pub_xm, pub_ym = f.to_mont(pub_x), f.to_mont(pub_y)
        on_curve = self._on_curve(pub_xm, pub_ym)
        input_ok = input_ok & on_curve

        msg_bits = bit_decompose(msg)
        r_bits = bit_decompose(r)
        w_bits = bit_decompose(w)

        zG, poi1 = self._mimic_fixed_base(msg_bits, (self.mshift_x, self.mshift_y), n)
        rQ, poi2 = self._mimic_var_base(
            r_bits, self.curve.from_affine_mont(pub_xm, pub_ym), (self.shift_x, self.shift_y), n
        )
        # B = zG + rQ; the reference's ec_add asserts distinct x.
        zzq = f.mont_mul(rQ.z, rQ.z)
        zzg = f.mont_mul(zG.z, zG.z)
        coll_b = f.eq(f.mont_mul(zG.x, zzq), f.mont_mul(rQ.x, zzg))
        B, exc_b = self.curve.add(zG, rQ)
        wB, poi3 = self._mimic_var_base(w_bits, B, (self.shift_x, self.shift_y), n)

        # Final: x(wB - SHIFT) == r, with the reference's ec_add x-assert.
        msx = jnp.broadcast_to(jnp.asarray(self.mshift_x[0]), (n, N_LIMBS))
        msy = jnp.broadcast_to(jnp.asarray(self.mshift_y[0]), (n, N_LIMBS))
        zz_wb = f.mont_mul(wB.z, wB.z)
        coll_f = f.eq(wB.x, f.mont_mul(msx, zz_wb))
        T, exc_f = self.curve.add_mixed(wB, msx, msy)
        # r == x(T): affine compare without inversion: r * T.z^2 == T.x.
        zz_t = f.mont_mul(T.z, T.z)
        r_mont = f.to_mont(r)
        match = f.eq(f.mont_mul(r_mont, zz_t), T.x) & jnp.logical_not(f.is_zero(T.z))

        poison = poi1 | poi2 | poi3 | coll_b | exc_b | coll_f | exc_f
        valid = jnp.logical_and(match, jnp.logical_not(poison))
        return valid, input_ok

    # -- sign --------------------------------------------------------------

    def sign_core_impl(self, z, k, priv):
        """Standard-domain (N, 21) limbs -> (r, s, ok).

        ok=False lanes must retry with a fresh k (the reference's while-loop,
        probability ~2^-200 per draw).
        """
        f, fn = self.fp, self.fn
        acc, bad = self._gen_msm.accumulate(_ped.byte_windows(k))
        rx_mont, _ry = self.curve.to_affine(acc)
        r = f.from_mont(rx_mont)  # r = x(kG), no mod-n reduction (< p < 2^252)

        # Scalar-field computation: w = k / (z + r*priv), s = w^-1 mod n.
        # r < 2^251 < n so its limb pattern reinterprets directly mod n.
        r_n = fn.to_mont(r)
        priv_n = fn.to_mont(priv)
        z_n = fn.to_mont(z)
        denom = fn.add(z_n, fn.mont_mul(r_n, priv_n))  # z + r*priv (mont)
        denom_zero = fn.is_zero(denom)
        k_n = fn.to_mont(k)
        w = fn.from_mont(fn.mont_mul(k_n, fn.inv(denom)))
        s = fn.from_mont(fn.mont_mul(denom, fn.inv(k_n)))

        ok = (
            jnp.logical_not(bad)
            & self._lt_2_251(r)
            & jnp.logical_not(f.is_zero(r))
            & jnp.logical_not(denom_zero)
            & self._lt_2_251(w)
            & jnp.logical_not(fn.is_zero(w))
        )
        return r, s, ok

    @functools.cached_property
    def _gen_msm(self):
        t = _ped._tables()
        return _ped._make_msm(t["genx"], t["geny"])

    @functools.cached_property
    def jit_verify(self):
        return jax.jit(self.verify_impl)

    @functools.cached_property
    def jit_sign_core(self):
        _ = self._gen_msm  # materialize tables eagerly, never inside a trace
        return jax.jit(self.sign_core_impl)


@functools.lru_cache(maxsize=1)
def ecdsa_ops() -> EcdsaOps:
    return EcdsaOps()


# -- host conveniences -----------------------------------------------------


def verify_ints(
    items: Sequence[Tuple[int, int, int, Union[int, Tuple[int, int]]]]
) -> List[bool]:
    """Batch of (msg_hash, r, s, public_key) -> validity list.

    public_key may be an x coordinate (both y candidates are tried, like the
    reference) or an (x, y) point. Raises AssertionError if any lane violates
    the reference's input assertions.
    """
    from stark_perpetual_tpu.crypto.signature import InvalidPublicKeyError, get_y_coordinate

    ops = ecdsa_ops()
    msgs, rs, ss, xs, ys = [], [], [], [], []
    lane_map: List[List[int]] = []
    x_invalid = set()
    for idx, (msg, r, s, pub) in enumerate(items):
        assert 1 <= s < EC_ORDER, f"s = {s}"
        assert 1 <= r < 2**_N_BITS, f"r = {r}"
        assert 0 <= msg < 2**_N_BITS, f"msg_hash = {msg}"
        if isinstance(pub, tuple):
            cands = [pub]
        else:
            try:
                y = get_y_coordinate(pub)
            except InvalidPublicKeyError:
                x_invalid.add(idx)
                lane_map.append([])
                continue
            cands = [(pub, y), (pub, (-y) % FIELD_PRIME)]
        lanes = []
        for cx, cy in cands:
            lanes.append(len(msgs))
            msgs.append(msg)
            rs.append(r)
            ss.append(s)
            xs.append(cx)
            ys.append(cy)
        lane_map.append(lanes)

    if msgs:
        n = len(msgs)
        if _ped._use_pallas():
            from stark_perpetual_tpu.ops.ecdsa_pallas import verify_batch_pallas

            valid = np.asarray(
                verify_batch_pallas(
                    [
                        (m, r, s, (x, y))
                        for m, r, s, x, y in zip(msgs, rs, ss, xs, ys)
                    ]
                )
            )
        else:
            # Pad with a self-consistent valid lane (signs nothing; just keeps
            # padded lanes inside the reference's assertion ranges).
            target = max(64, -(-n // 64) * 64)
            while len(msgs) < target:
                msgs.append(0)
                rs.append(1)
                ss.append(1)
                xs.append(EC_GEN[0])
                ys.append(EC_GEN[1])
            valid, input_ok = ops.jit_verify(
                pack_ints(msgs), pack_ints(rs), pack_ints(ss), pack_ints(xs), pack_ints(ys)
            )
            valid = np.asarray(valid)[:n]
            input_ok = np.asarray(input_ok)[:n]
            assert bool(np.all(input_ok)), "verify input assertion failed"
    results = []
    for idx in range(len(items)):
        if idx in x_invalid:
            results.append(False)
        else:
            results.append(bool(np.any(valid[lane_map[idx]])))
    return results


def sign_ints(
    items: Sequence[Tuple[int, int]], seed: Optional[int] = None
) -> List[Tuple[int, int]]:
    """Batch of (msg_hash, priv_key) -> [(r, s)]; deterministic RFC-6979 k."""
    from stark_perpetual_tpu.crypto.signature import generate_k_rfc6979

    ops = ecdsa_ops()
    n = len(items)
    pending = list(range(n))
    seeds: List[Optional[int]] = [seed] * n
    out: List[Tuple[int, int]] = [None] * n  # type: ignore[list-item]
    while pending:
        ks = []
        for i in pending:
            msg, priv = items[i]
            assert 0 <= msg < 2**_N_BITS, "Message not signable."
            ks.append(generate_k_rfc6979(msg, priv, seeds[i]))
            seeds[i] = 1 if seeds[i] is None else seeds[i] + 1
        pad = _ped._pad_batch
        z = pad(pack_ints([items[i][0] for i in pending]))
        kk = pad(pack_ints(ks))
        kk[len(pending):, 0] = 1  # pad lanes need k != 0
        pv = pad(pack_ints([items[i][1] for i in pending]))
        r, s, ok = ops.jit_sign_core(z, kk, pv)
        r = ops.fp.unpack(r)
        s = ops.fp.unpack(s)
        ok = np.asarray(ok)
        still = []
        for j, i in enumerate(pending):
            if bool(ok[j]):
                out[i] = (int(r[j]), int(s[j]))
            else:
                still.append(i)
        pending = still
    return out
