"""ECDSA-builtin AIR: variable-base ec-mult ladders + verify glue.

Arithmetizes ``mimic_ec_mult_air`` (signature.py:133-148 here; reference
src/starkware/crypto/signature/signature.py:176-190): a 251-step ladder
where the running sum conditionally absorbs the base point and the base
point doubles every step. Three pooled ladders per signature reproduce the
AIR-faithful verification chain (signature.py:188-191 / reference :229-246):

    zG = mimic(z, EC_GEN, -SHIFT)
    rQ = mimic(r, Q, SHIFT)
    wB = mimic(w, zG + rQ, SHIFT)       with w = s^-1 mod n
    accept  iff  r == x(wB - SHIFT)

``EcMultAir`` proves each ladder; the single EC additions between ladders
and the final x-check are recomputed by the verifier on the *claimed*
ladder outputs, which the proof binds as boundary values
(``EcdsaVerifyStark``).

Block layout (256 rows per ladder, ``n = 256 * n_blocks``):
  rows 0..250  bit steps (suffix halves; base doubles every row)
  rows 251..254 padding (bit forced 0; base keeps doubling)
  row  255      reset row: constraints off, next block re-pinned by
                boundary assertions

Trace columns: suffix, px, py (partial sum), s (chord slope),
inv (1/(px-qx): the per-step x-inequality assert, signature.py:142),
qx, qy (doubling base), sq (tangent slope).
Public columns: pad, rst selectors.
"""

from dataclasses import dataclass
from typing import List, Sequence, Tuple

import jax.numpy as jnp

from stark_perpetual_tpu.crypto.signature import (
    MINUS_SHIFT_POINT,
    inv_mod_curve_size,
    is_point_on_curve,
    mimic_ec_mult_air,
)
from stark_perpetual_tpu.models.air import Air, StarkProof, StarkProver, verify_stark
from stark_perpetual_tpu.params import EC_GEN, EC_ORDER, FIELD_PRIME, SHIFT_POINT
from stark_perpetual_tpu.utils.math_utils import div_mod, ec_add

_BLOCK = 256
_NBITS = 251

Point = Tuple[int, int]


@dataclass
class MultBlock:
    """One ladder claim: out = scalar * base + start (all public)."""

    scalar: int
    start: Point
    base: Point
    out: Point


_DUMMY = MultBlock(1, SHIFT_POINT, EC_GEN, ec_add(SHIFT_POINT, EC_GEN, FIELD_PRIME))


class EcMultAir(Air):
    """Pooled variable-base mimic ladders (one 256-row block each)."""

    composition_static = True  # traced constraints use no per-instance state
    n_columns = 8  # suffix, px, py, s, inv, qx, qy, sq
    transition_degree = 3

    def __init__(self, blocks: Sequence[MultBlock]):
        m = len(blocks)
        assert m > 0 and m & (m - 1) == 0, "number of ladder blocks must be 2^k"
        self.blocks = list(blocks)
        self.m = m
        self.n = _BLOCK * m

    # --- witness ----------------------------------------------------------

    def trace(self) -> List[List[int]]:
        p = FIELD_PRIME
        cols = [[] for _ in range(8)]
        suffix, px, py, sl, inv, qx, qy, sq = cols
        for blk in self.blocks:
            if not 0 < blk.scalar < (1 << _NBITS):
                raise ValueError("ladder scalar outside (0, 2^251)")
            point = blk.start
            base = blk.base
            x = blk.scalar
            for i in range(_BLOCK):
                suffix.append(x)
                px.append(point[0])
                py.append(point[1])
                qx.append(base[0])
                qy.append(base[1])
                if i == _BLOCK - 1:
                    inv.append(0)
                    sl.append(0)
                    sq.append(0)
                    break
                # Per-step x-inequality (signature.py:142).
                assert point[0] != base[0]
                inv.append(pow((point[0] - base[0]) % p, p - 2, p))
                bit = x & 1 if i < _NBITS else 0
                if bit:
                    sl.append(div_mod(point[1] - base[1], point[0] - base[0], p))
                    point = ec_add(point, base, p)
                else:
                    sl.append(0)
                # Base doubles every non-reset row (y != 0: odd group order).
                tangent = div_mod(3 * base[0] * base[0] + 1, 2 * base[1], p)
                sq.append(tangent)
                base = (
                    (tangent * tangent - 2 * base[0]) % p,
                    (tangent * (base[0] - ((tangent * tangent - 2 * base[0]) % p)) - base[1]) % p,
                )
                if i < _NBITS:
                    x >>= 1
            assert (point[0], point[1]) == blk.out
        return cols

    # --- public columns ---------------------------------------------------

    def public_columns(self) -> List[List[int]]:
        pad, rst = [], []
        for _ in range(self.m):
            for i in range(_BLOCK):
                pad.append(1 if _NBITS <= i < _BLOCK - 1 else 0)
                rst.append(1 if i == _BLOCK - 1 else 0)
        return [pad, rst]

    # --- constraints (device, Montgomery domain) --------------------------

    def eval_transitions(self, f, cur, nxt, pub):
        suf, px, py, s, inv, qx, qy, sq = cur
        suf_n, px_n, py_n = nxt[0], nxt[1], nxt[2]
        qx_n, qy_n = nxt[5], nxt[6]
        pad, rst = pub

        def const(v, like):
            return jnp.broadcast_to(jnp.asarray(f.pack((v << 252) % FIELD_PRIME)), like.shape)

        one = const(1, suf)
        three = const(3, suf)
        b = f.sub(suf, f.add(suf_n, suf_n))
        ns = f.sub(one, rst)
        one_minus_b = f.sub(one, b)
        mul = f.mont_mul
        return [
            mul(ns, mul(b, f.sub(b, one))),
            mul(ns, f.sub(mul(b, f.sub(py, qy)), mul(s, f.sub(px, qx)))),
            mul(ns, f.sub(mul(s, s), mul(b, f.add(f.add(px, qx), px_n)))),
            mul(ns, f.sub(mul(s, f.sub(px, px_n)), mul(b, f.add(py, py_n)))),
            mul(ns, mul(one_minus_b, f.sub(px_n, px))),
            mul(ns, mul(one_minus_b, f.sub(py_n, py))),
            mul(ns, f.sub(mul(f.sub(px, qx), inv), one)),
            mul(pad, b),
            mul(ns, f.sub(mul(f.add(qy, qy), sq), f.add(mul(three, mul(qx, qx)), one))),
            mul(ns, f.sub(mul(sq, sq), f.add(f.add(qx, qx), qx_n))),
            mul(ns, f.sub(mul(sq, f.sub(qx, qx_n)), f.add(qy, qy_n))),
        ]

    # --- constraints (host ints, verifier) --------------------------------

    def transition_exprs_host(self, cur_vals, nxt_vals, pub_vals=()):
        p = FIELD_PRIME
        suf, px, py, s, inv, qx, qy, sq = cur_vals
        suf_n, px_n, py_n = nxt_vals[0], nxt_vals[1], nxt_vals[2]
        qx_n, qy_n = nxt_vals[5], nxt_vals[6]
        if pub_vals:
            pad, rst = pub_vals
        else:
            pad = rst = 0
        b = (suf - 2 * suf_n) % p
        ns = (1 - rst) % p
        return [
            ns * (b * (b - 1)) % p,
            ns * (b * (py - qy) - s * (px - qx)) % p,
            ns * (s * s - b * (px + qx + px_n)) % p,
            ns * (s * (px - px_n) - b * (py + py_n)) % p,
            ns * ((1 - b) * (px_n - px)) % p,
            ns * ((1 - b) * (py_n - py)) % p,
            ns * ((px - qx) * inv - 1) % p,
            pad * b % p,
            ns * (2 * qy * sq - (3 * qx * qx + 1)) % p,
            ns * (sq * sq - 2 * qx - qx_n) % p,
            ns * (sq * (qx - qx_n) - (qy + qy_n)) % p,
        ]

    # --- boundary ---------------------------------------------------------

    def boundary(self):
        out = []
        for j, blk in enumerate(self.blocks):
            base = j * _BLOCK
            out.append((0, base, blk.scalar))
            out.append((0, base + _NBITS, 0))
            out.append((1, base, blk.start[0]))
            out.append((2, base, blk.start[1]))
            out.append((5, base, blk.base[0]))
            out.append((6, base, blk.base[1]))
            out.append((1, base + _BLOCK - 1, blk.out[0]))
            out.append((2, base + _BLOCK - 1, blk.out[1]))
        return out


# --- ECDSA verify glue -----------------------------------------------------


@dataclass
class EcdsaStarkProof:
    stark: StarkProof
    # Per signature: claimed ladder outputs (zG, rQ, wB).
    intermediates: List[Tuple[Point, Point, Point]]


def _blocks_for(items, intermediates) -> List[MultBlock]:
    blocks = []
    for (z, r, s, q), (zg, rq, wb) in zip(items, intermediates):
        w = inv_mod_curve_size(s)
        b = ec_add(zg, rq, FIELD_PRIME)
        blocks.append(MultBlock(z, MINUS_SHIFT_POINT, EC_GEN, zg))
        blocks.append(MultBlock(r, SHIFT_POINT, tuple(q), rq))
        blocks.append(MultBlock(w, SHIFT_POINT, b, wb))
    while len(blocks) & (len(blocks) - 1):
        blocks.append(_DUMMY)
    return blocks


class EcdsaVerifyStark:
    """STARK-backed batch ECDSA verification (the ecdsa builtin's job).

    ``items``: list of (msg_hash, r, s, (pub_x, pub_y)). The proof binds
    every ladder; the inter-ladder EC additions and the final
    ``r == x(wB - SHIFT)`` check are host-recomputed on bound values.
    """

    def __init__(self, blowup: int = 8, n_queries: int = 16):
        self.blowup = blowup
        self.n_queries = n_queries

    def prove(self, items) -> EcdsaStarkProof:
        intermediates = []
        for z, r, s, q in items:
            w = inv_mod_curve_size(s)
            zg = mimic_ec_mult_air(z, EC_GEN, MINUS_SHIFT_POINT)
            rq = mimic_ec_mult_air(r, tuple(q), SHIFT_POINT)
            wb = mimic_ec_mult_air(w, ec_add(zg, rq, FIELD_PRIME), SHIFT_POINT)
            assert r == ec_add(wb, MINUS_SHIFT_POINT, FIELD_PRIME)[0], "invalid signature"
            intermediates.append((zg, rq, wb))
        air = EcMultAir(_blocks_for(items, intermediates))
        proof = StarkProver(air, blowup=self.blowup, n_queries=self.n_queries).prove(air.trace())
        return EcdsaStarkProof(stark=proof, intermediates=intermediates)

    def verify(self, items, proof: EcdsaStarkProof) -> bool:
        if len(proof.intermediates) != len(items):
            return False
        try:
            for (z, r, s, q), (zg, rq, wb) in zip(items, proof.intermediates):
                assert 1 <= s < EC_ORDER
                w = inv_mod_curve_size(s)
                assert 1 <= r < (1 << _NBITS)
                assert 1 <= w < (1 << _NBITS)
                assert 0 < z < (1 << _NBITS)
                assert is_point_on_curve(q[0], q[1])
                for pt in (zg, rq, wb):
                    assert is_point_on_curve(pt[0], pt[1])
                assert r == ec_add(wb, MINUS_SHIFT_POINT, FIELD_PRIME)[0]
            air = EcMultAir(_blocks_for(items, proof.intermediates))
        except AssertionError:
            return False
        return verify_stark(air, proof.stark)
