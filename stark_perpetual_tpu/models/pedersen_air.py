"""Pedersen-builtin AIR: ec-subset-sum with hash pooling.

Arithmetizes the exact trace that the reference's ``mimic_ec_mult_air``
(src/starkware/crypto/signature/signature.py:176-190) and the AIR-faithful
``pedersen_hash_as_point`` (signature.py:296-318) step through: a running
elliptic-curve point that conditionally absorbs one constant point per row,
driven by the bit decomposition of the hashed elements.

Layout (one *block* of 512 rows per hash, ``m`` hashes pooled into one
trace of ``n = 512*m`` rows):

  rows   0..251   consume bits 0..251 of element ``a`` with
                  CONSTANT_POINTS[2+i]
  rows 252..254   padding (bit forced to 0; suffix pinned 0 at row 252)
  row       255   segment switch: point copies, suffix jumps to ``b``
  rows 256..507   consume bits 0..251 of element ``b`` with
                  CONSTANT_POINTS[254+i]
  rows 508..510   padding
  row       511   hash reset: point is forced back to SHIFT_POINT for the
                  next block (the global last row's transition is excluded
                  by the vanishing polynomial)

Trace columns: ``suffix`` (remaining scalar), ``px, py`` (partial sum),
``s`` (chord slope), ``inv`` (inverse of ``px - qx``), and two carried
flags ``hf``/``gf`` for the alias exclusion below. The ``inv`` witness
proves ``px != qx`` on every non-selector row — the same per-step
x-inequality whose violation makes the reference raise "Unhashable input"
(signature.py:232).

Public (uncommitted) columns, evaluated by the verifier itself:
``qx, qy`` (constant-point tables) and the row selectors.

Bit-decomposition soundness (alias exclusion). 252 bits are consumed per
element, so a field element a < 2^252 - p would also have the encoding
a + p; accepting it would prove a *different* hash for the same input.
The flags kill every alias:
  - ``hf`` is tied to bit 251 at row 251 and carried (constant) across the
    element segment;
  - ``gf`` is tied to bit 196 at row 196 and carried across rows 0..196;
  - when hf = 1, bits 250..197 must be zero (p = 2^251 + 17*2^192 + 1, so
    a canonical high value has at most 17*2^192 above the top bit);
  - when hf = 1 and gf = 1 (bits 251 and 196 set, i.e. t >= 16 where
    t = bits 196..192), bits 195..192 must be zero, capping t at 16.
Representable values: [0, 2^251 + 17*2^192) = [0, p - 1) — every field
element except p - 1 itself (a 2^-251 completeness point, vs the previous
[2^251, p) sliver), and no integer >= p is encodable, so aliases cannot
exist.
"""

from typing import List, Sequence, Tuple

import jax.numpy as jnp

from stark_perpetual_tpu.models.air import Air
from stark_perpetual_tpu.params import CONSTANT_POINTS, FIELD_PRIME, SHIFT_POINT
from stark_perpetual_tpu.utils.math_utils import div_mod, ec_add

_BLOCK = 512
_SEG = 256  # rows per element segment
_NBITS = 252  # bits consumed per element (see alias-exclusion note above)
_MAX_INPUT = (1 << 251) + 17 * (1 << 192)  # representable: [0, p - 1)


class PedersenBuiltinAir(Air):
    """AIR for ``m`` pooled Pedersen hashes h_j = H(a_j, b_j)."""

    composition_static = True  # traced constraints use no per-instance state
    n_columns = 7  # suffix, px, py, s, inv, hf, gf
    transition_degree = 4  # sel * hf * gf * bit (the t-cap constraint)

    def __init__(self, inputs: Sequence[Tuple[int, int]], outputs: Sequence[int]):
        m = len(inputs)
        assert m > 0 and m & (m - 1) == 0, "number of pooled hashes must be 2^k"
        assert len(outputs) == m
        self.inputs = [(int(a), int(b)) for a, b in inputs]
        self.outputs = [int(h) for h in outputs]
        self.m = m
        self.n = _BLOCK * m

    # --- witness ----------------------------------------------------------

    def trace(self) -> List[List[int]]:
        suffix: List[int] = []
        px: List[int] = []
        py: List[int] = []
        sl: List[int] = []
        inv: List[int] = []
        hf: List[int] = []
        gf: List[int] = []
        p = FIELD_PRIME
        for a, b in self.inputs:
            point = SHIFT_POINT
            for el_idx, el in enumerate((a, b)):
                if not 0 <= el < _MAX_INPUT:
                    raise ValueError(
                        "PedersenBuiltinAir input p-1 is not encodable "
                        "(see alias-exclusion note)"
                    )
                base = 2 + el_idx * 252
                hf_v = (el >> 251) & 1
                gf_v = (el >> 196) & 1
                x = el
                for i in range(_SEG):
                    suffix.append(x)
                    px.append(point[0])
                    py.append(point[1])
                    hf.append(hf_v)
                    gf.append(gf_v)
                    bit = x & 1 if i < _NBITS else 0
                    qx_i = CONSTANT_POINTS[base + i][0] if i < _NBITS else 0
                    if i == _SEG - 1:
                        inv.append(0)  # seg/rst row: constraints disabled
                    else:
                        # Per-step x-inequality witness (signature.py:232).
                        assert point[0] != qx_i, "Unhashable input."
                        inv.append(pow((point[0] - qx_i) % p, p - 2, p))
                    if bit:
                        q = CONSTANT_POINTS[base + i]
                        sl.append(div_mod(point[1] - q[1], point[0] - q[0], p))
                        point = ec_add(point, q, p)
                    else:
                        sl.append(0)
                    if i < _NBITS:
                        x >>= 1
        return [suffix, px, py, sl, inv, hf, gf]

    # --- public columns ---------------------------------------------------

    def public_columns(self) -> List[List[int]]:
        qx: List[int] = []
        qy: List[int] = []
        pad: List[int] = []
        seg: List[int] = []
        rst: List[int] = []
        cp: List[int] = []  # hf carried (rows 0..250 of each segment)
        cpg: List[int] = []  # gf carried (rows 0..195)
        tie_hf: List[int] = []  # row 251: hf = bit
        tie_gf: List[int] = []  # row 196: gf = bit
        mid: List[int] = []  # rows 197..250: hf => bit = 0
        low4: List[int] = []  # rows 192..195: hf & gf => bit = 0
        for _ in range(self.m):
            for el_idx in range(2):
                base = 2 + el_idx * 252
                for i in range(_SEG):
                    if i < _NBITS:
                        qx.append(CONSTANT_POINTS[base + i][0])
                        qy.append(CONSTANT_POINTS[base + i][1])
                    else:
                        qx.append(0)
                        qy.append(0)
                    last = i == _SEG - 1
                    pad.append(1 if (_NBITS <= i < _SEG - 1) else 0)
                    seg.append(1 if (last and el_idx == 0) else 0)
                    rst.append(1 if (last and el_idx == 1) else 0)
                    cp.append(1 if i <= 250 else 0)
                    cpg.append(1 if i <= 195 else 0)
                    tie_hf.append(1 if i == 251 else 0)
                    tie_gf.append(1 if i == 196 else 0)
                    mid.append(1 if 197 <= i <= 250 else 0)
                    low4.append(1 if 192 <= i <= 195 else 0)
        return [qx, qy, pad, seg, rst, cp, cpg, tie_hf, tie_gf, mid, low4]

    # --- constraints (device, Montgomery domain) --------------------------

    def eval_transitions(self, f, cur, nxt, pub):
        suf, px, py, s, inv, hf, gf = cur
        suf_n, px_n, py_n = nxt[0], nxt[1], nxt[2]
        hf_n, gf_n = nxt[5], nxt[6]
        qx, qy, pad, seg, rst, cp, cpg, tie_hf, tie_gf, mid, low4 = pub

        def const(v, like):
            return jnp.broadcast_to(jnp.asarray(f.pack((v << 252) % FIELD_PRIME)), like.shape)

        one = const(1, suf)
        shift_x = const(SHIFT_POINT[0], suf)
        shift_y = const(SHIFT_POINT[1], suf)

        b = f.sub(suf, f.add(suf_n, suf_n))  # suffix - 2*suffix'
        ns = f.sub(one, f.add(seg, rst))  # "normal step" selector
        one_minus_b = f.sub(one, b)

        mul = f.mont_mul
        c1 = mul(ns, mul(b, f.sub(b, one)))
        c2 = mul(ns, f.sub(mul(b, f.sub(py, qy)), mul(s, f.sub(px, qx))))
        c3 = mul(ns, f.sub(mul(s, s), mul(b, f.add(f.add(px, qx), px_n))))
        c4 = mul(ns, f.sub(mul(s, f.sub(px, px_n)), mul(b, f.add(py, py_n))))
        c5 = mul(ns, mul(one_minus_b, f.sub(px_n, px)))
        c6 = mul(ns, mul(one_minus_b, f.sub(py_n, py)))
        c7 = mul(ns, f.sub(mul(f.sub(px, qx), inv), one))
        c8 = mul(pad, b)
        c9 = mul(seg, f.sub(px_n, px))
        c10 = mul(seg, f.sub(py_n, py))
        c11 = mul(rst, f.sub(px_n, shift_x))
        c12 = mul(rst, f.sub(py_n, shift_y))
        # Alias exclusion (see module docstring).
        c13 = mul(cp, f.sub(hf_n, hf))
        c14 = mul(tie_hf, f.sub(hf, b))
        c15 = mul(cpg, f.sub(gf_n, gf))
        c16 = mul(tie_gf, f.sub(gf, b))
        c17 = mul(mid, mul(hf, b))
        c18 = mul(low4, mul(hf, mul(gf, b)))
        return [c1, c2, c3, c4, c5, c6, c7, c8, c9, c10, c11, c12,
                c13, c14, c15, c16, c17, c18]

    # --- constraints (host ints, verifier) --------------------------------

    def transition_exprs_host(self, cur_vals, nxt_vals, pub_vals=()):
        p = FIELD_PRIME
        suf, px, py, s, inv, hf, gf = cur_vals
        suf_n, px_n, py_n = nxt_vals[0], nxt_vals[1], nxt_vals[2]
        hf_n, gf_n = nxt_vals[5], nxt_vals[6]
        if pub_vals:
            qx, qy, pad, seg, rst, cp, cpg, tie_hf, tie_gf, mid, low4 = pub_vals
        else:  # constraint-count probe from verify_stark
            qx = qy = pad = seg = rst = cp = cpg = 0
            tie_hf = tie_gf = mid = low4 = 0
        b = (suf - 2 * suf_n) % p
        ns = (1 - seg - rst) % p
        return [
            ns * (b * (b - 1)) % p,
            ns * (b * (py - qy) - s * (px - qx)) % p,
            ns * (s * s - b * (px + qx + px_n)) % p,
            ns * (s * (px - px_n) - b * (py + py_n)) % p,
            ns * ((1 - b) * (px_n - px)) % p,
            ns * ((1 - b) * (py_n - py)) % p,
            ns * ((px - qx) * inv - 1) % p,
            pad * b % p,
            seg * (px_n - px) % p,
            seg * (py_n - py) % p,
            rst * (px_n - SHIFT_POINT[0]) % p,
            rst * (py_n - SHIFT_POINT[1]) % p,
            cp * (hf_n - hf) % p,
            tie_hf * (hf - b) % p,
            cpg * (gf_n - gf) % p,
            tie_gf * (gf - b) % p,
            mid * (hf * b) % p,
            low4 * (hf * gf * b) % p,
        ]

    # --- boundary ---------------------------------------------------------

    def boundary(self):
        out = [(1, 0, SHIFT_POINT[0]), (2, 0, SHIFT_POINT[1])]
        for j, ((a, b), h) in enumerate(zip(self.inputs, self.outputs)):
            base = j * _BLOCK
            out.append((0, base, a))
            out.append((0, base + _NBITS, 0))
            out.append((0, base + _SEG, b))
            out.append((0, base + _SEG + _NBITS, 0))
            out.append((1, base + _BLOCK - 1, h))
        return out
