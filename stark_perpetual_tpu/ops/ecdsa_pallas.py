"""Pallas TPU kernel for batched AIR-mimicking ECDSA verification.

The XLA scan path materializes every limb intermediate to HBM between the
~20K elementwise ops of each of the 753 mimic steps; this kernel keeps the
whole verification (three 251-step double-and-add scans with per-step
x-collision poison flags, exactly signature.py:176-260) in VMEM.

Inputs per lane: msg, r, w (= s^-1 mod n, computed on the host — a scalar
modular inverse per signature is host-cheap and removes the only scalar-field
operation from the device), and the public key as an affine Montgomery point.
Outputs: match + poison flags; `valid = match and not poison`.
"""

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stark_perpetual_tpu.ops.field import LIMB_BITS, LIMB_MASK, N_LIMBS, pack_ints
from stark_perpetual_tpu.ops.pedersen_pallas import (
    _add_rows,
    _const_rows,
    _is_zero_rows,
    _madd_rows,
    _mont_mul_rows,
    _select_rows,
    _sub_rows,
)
from stark_perpetual_tpu.params import (
    EC_GEN,
    FIELD_PRIME,
    MINUS_SHIFT_POINT,
    N_ELEMENT_BITS_ECDSA,
    SHIFT_POINT,
)
from stark_perpetual_tpu.utils.math_utils import ec_double

_N_BITS = N_ELEMENT_BITS_ECDSA  # 251
_LANE_BLOCK = 2048


def _eq_rows(a, b):
    acc = a[0] ^ b[0]
    for i in range(1, N_LIMBS):
        acc = acc | (a[i] ^ b[i])
    return acc == 0


def _double_rows(X, Y, Z):
    """Jacobian doubling, alpha = 1 (curve_ops.CurveOps.double on rows)."""
    XX = _mont_mul_rows(X, X)
    YY = _mont_mul_rows(Y, Y)
    YYYY = _mont_mul_rows(YY, YY)
    ZZ = _mont_mul_rows(Z, Z)
    t = _add_rows(X, YY)
    S = _sub_rows(_sub_rows(_mont_mul_rows(t, t), XX), YYYY)
    S = _add_rows(S, S)
    M = _add_rows(_add_rows(XX, XX), XX)
    M = _add_rows(M, _mont_mul_rows(ZZ, ZZ))  # + alpha * Z^4 with alpha = 1
    X3 = _sub_rows(_mont_mul_rows(M, M), _add_rows(S, S))
    e8 = _add_rows(YYYY, YYYY)
    e8 = _add_rows(e8, e8)
    e8 = _add_rows(e8, e8)
    Y3 = _sub_rows(_mont_mul_rows(M, _sub_rows(S, X3)), e8)
    yz = _add_rows(Y, Z)
    Z3 = _sub_rows(_sub_rows(_mont_mul_rows(yz, yz), YY), ZZ)
    return X3, Y3, Z3


def _jac_add_rows(X1, Y1, Z1, X2, Y2, Z2, skip):
    """General Jacobian add (add-2007-bl) with skip lanes; assumes both
    finite and distinct-x (the mimic poisons x-collisions beforehand)."""
    Z1Z1 = _mont_mul_rows(Z1, Z1)
    Z2Z2 = _mont_mul_rows(Z2, Z2)
    U1 = _mont_mul_rows(X1, Z2Z2)
    U2 = _mont_mul_rows(X2, Z1Z1)
    S1 = _mont_mul_rows(Y1, _mont_mul_rows(Z2, Z2Z2))
    S2 = _mont_mul_rows(Y2, _mont_mul_rows(Z1, Z1Z1))
    H = _sub_rows(U2, U1)
    HH = _add_rows(H, H)
    I = _mont_mul_rows(HH, HH)
    J = _mont_mul_rows(H, I)
    r = _sub_rows(S2, S1)
    r = _add_rows(r, r)
    V = _mont_mul_rows(U1, I)
    X3 = _sub_rows(_sub_rows(_mont_mul_rows(r, r), J), _add_rows(V, V))
    S1J = _mont_mul_rows(S1, J)
    Y3 = _sub_rows(_mont_mul_rows(r, _sub_rows(V, X3)), _add_rows(S1J, S1J))
    z12 = _add_rows(Z1, Z2)
    Z3 = _mont_mul_rows(_sub_rows(_sub_rows(_mont_mul_rows(z12, z12), Z1Z1), Z2Z2), H)
    X3 = _select_rows(skip, X1, X3)
    Y3 = _select_rows(skip, Y1, Y3)
    Z3 = _select_rows(skip, Z1, Z3)
    return X3, Y3, Z3


def _bit_at(limb_ref, k):
    """Bit k (traced) of a (21, 1, 8, L) canonical limb-row ref (dynamic
    indexing is supported on refs, not on values, in Pallas TPU)."""
    row = jax.lax.div(k, LIMB_BITS)
    off = jax.lax.rem(k, LIMB_BITS)
    limb = limb_ref[row, 0]
    return (limb >> off) & 1


def _mimic_fixed(bits_ref, tab_ref, shift_xy, tile, poison):
    """m * G + shift via the precomputed 2^k G affine table (madd steps)."""
    X = _const_rows((shift_xy[0] << 252) % FIELD_PRIME, tile)
    Y = _const_rows((shift_xy[1] << 252) % FIELD_PRIME, tile)
    Z = _const_rows((1 << 252) % FIELD_PRIME, tile)

    def body(k, carry):
        X, Y, Z, poison = carry
        row = tab_ref[k]  # (42,) int32 mont limbs: gx | gy
        gx = jnp.stack([jnp.full(tile, row[i], dtype=jnp.int32) for i in range(N_LIMBS)])
        gy = jnp.stack(
            [jnp.full(tile, row[N_LIMBS + i], dtype=jnp.int32) for i in range(N_LIMBS)]
        )
        zz = _mont_mul_rows(Z, Z)
        coll = _eq_rows(X, _mont_mul_rows(gx, zz))
        bit = _bit_at(bits_ref, k)
        X2, Y2, Z2, exc = _madd_rows(X, Y, Z, gx, gy, bit == 0)
        return X2, Y2, Z2, poison | coll.astype(jnp.int32) | exc.astype(jnp.int32)

    return jax.lax.fori_loop(0, _N_BITS, body, (X, Y, Z, poison))


def _mimic_var(bits_ref, QX, QY, QZ, shift_xy, tile, poison):
    """m * Q + shift, doubling the (Jacobian) base each step."""
    X = _const_rows((shift_xy[0] << 252) % FIELD_PRIME, tile)
    Y = _const_rows((shift_xy[1] << 252) % FIELD_PRIME, tile)
    Z = _const_rows((1 << 252) % FIELD_PRIME, tile)

    def body(k, carry):
        X, Y, Z, QX, QY, QZ, poison = carry
        zq2 = _mont_mul_rows(QZ, QZ)
        za2 = _mont_mul_rows(Z, Z)
        coll = _eq_rows(_mont_mul_rows(X, zq2), _mont_mul_rows(QX, za2))
        bit = _bit_at(bits_ref, k)
        X2, Y2, Z2 = _jac_add_rows(X, Y, Z, QX, QY, QZ, bit == 0)
        QX2, QY2, QZ2 = _double_rows(QX, QY, QZ)
        return X2, Y2, Z2, QX2, QY2, QZ2, poison | coll.astype(jnp.int32)

    X, Y, Z, _qx, _qy, _qz, poison = jax.lax.fori_loop(
        0, _N_BITS, body, (X, Y, Z, QX, QY, QZ, poison)
    )
    return X, Y, Z, poison


def _verify_kernel(msg_ref, r_ref, w_ref, pubx_ref, puby_ref, tab_ref,
                   match_ref, poison_ref):
    tile = msg_ref.shape[2:]  # (8, L)
    r = r_ref[:, 0]
    pubx = pubx_ref[:, 0]  # Montgomery affine
    puby = puby_ref[:, 0]
    poison = jnp.zeros(tile, dtype=jnp.int32)

    # zG = msg * G - SHIFT (fixed-base table).
    zx, zy, zz, poison = _mimic_fixed(msg_ref, tab_ref, MINUS_SHIFT_POINT, tile, poison)
    # rQ = r * Q + SHIFT.
    one = _const_rows((1 << 252) % FIELD_PRIME, tile)
    rx, ry, rz, poison = _mimic_var(r_ref, pubx, puby, one, SHIFT_POINT, tile, poison)
    # B = zG + rQ (reference ec_add asserts distinct x).
    coll_b = _eq_rows(
        _mont_mul_rows(zx, _mont_mul_rows(rz, rz)),
        _mont_mul_rows(rx, _mont_mul_rows(zz, zz)),
    )
    poison = poison | coll_b.astype(jnp.int32)
    bx, by, bz = _jac_add_rows(zx, zy, zz, rx, ry, rz, jnp.zeros(tile, dtype=bool))
    # wB = w * B + SHIFT.
    wx, wy, wz, poison = _mimic_var(w_ref, bx, by, bz, SHIFT_POINT, tile, poison)

    # Final: x(wB - SHIFT) == r, with the x-distinctness assert.
    msx = _const_rows((MINUS_SHIFT_POINT[0] << 252) % FIELD_PRIME, tile)
    msy = _const_rows((MINUS_SHIFT_POINT[1] << 252) % FIELD_PRIME, tile)
    zz_wb = _mont_mul_rows(wz, wz)
    coll_f = _eq_rows(wx, _mont_mul_rows(msx, zz_wb))
    poison = poison | coll_f.astype(jnp.int32)
    tx, ty, tz, exc_f = _madd_rows(wx, wy, wz, msx, msy, jnp.zeros(tile, dtype=bool))
    poison = poison | exc_f.astype(jnp.int32)

    # r (standard domain) -> Montgomery via R^2 constant multiply.
    r2_rows = _const_rows((((1 << 252) ** 2) % FIELD_PRIME), tile)
    r_mont = _mont_mul_rows(r, r2_rows)
    tz2 = _mont_mul_rows(tz, tz)
    match = _eq_rows(_mont_mul_rows(r_mont, tz2), tx) & jnp.logical_not(_is_zero_rows(tz))

    match_ref[0, 0] = match.astype(jnp.int32)
    poison_ref[0, 0] = poison


@functools.lru_cache(maxsize=1)
def _gen_table() -> np.ndarray:
    """(251, 44) int32: per-step [gx limbs | gy limbs] (Montgomery), padded."""
    pts = []
    g = EC_GEN
    for _ in range(_N_BITS):
        pts.append(g)
        g = ec_double(g, 1, FIELD_PRIME)
    tab = np.zeros((_N_BITS, 2 * N_LIMBS + 2), dtype=np.int32)  # pad to 44
    for k, (x, y) in enumerate(pts):
        tab[k, :N_LIMBS] = pack_ints([(x << 252) % FIELD_PRIME])[0]
        tab[k, N_LIMBS : 2 * N_LIMBS] = pack_ints([(y << 252) % FIELD_PRIME])[0]
    return tab


@functools.lru_cache(maxsize=1)
def _verify_fn():
    tab = jnp.asarray(_gen_table())

    @jax.jit
    def run(msg, r, w, pubx_m, puby_m):
        # Inputs: (N, 21) int32; pub coords already in Montgomery form.
        n = msg.shape[0]
        block = min(_LANE_BLOCK, n)
        assert n % block == 0 and block % 8 == 0
        n_blocks, lane = n // block, block // 8

        def shape_in(a):
            return a.swapaxes(0, 1).reshape(N_LIMBS, n_blocks, 8, lane)

        ins = [shape_in(a) for a in (msg, r, w, pubx_m, puby_m)]
        in_specs = [
            pl.BlockSpec((N_LIMBS, 1, 8, lane), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM)
        ] * 5 + [
            pl.BlockSpec((_N_BITS, 2 * N_LIMBS + 2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
        ]
        match, poison = pl.pallas_call(
            _verify_kernel,
            grid=(n_blocks,),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((1, 1, 8, lane), lambda i: (0, i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 8, lane), lambda i: (0, i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((1, n_blocks, 8, lane), jnp.int32),
                jax.ShapeDtypeStruct((1, n_blocks, 8, lane), jnp.int32),
            ],
        )(*ins, tab)
        valid = (match.reshape(n) != 0) & (poison.reshape(n) == 0)
        return valid

    return run


def verify_batch_pallas(
    items: Sequence[Tuple[int, int, int, Tuple[int, int]]]
) -> List[bool]:
    """[(msg, r, s, (pub_x, pub_y))] -> validity; all the reference's input
    assertions must hold (the host wrapper in ops.ecdsa enforces them)."""
    from stark_perpetual_tpu.params import EC_ORDER

    n = len(items)
    if n == 0:
        return []
    target = max(_LANE_BLOCK, -(-n // _LANE_BLOCK) * _LANE_BLOCK)
    p = FIELD_PRIME

    msgs, rs, ws, xs, ys = [], [], [], [], []
    for msg, r, s, (px, py) in items:
        msgs.append(msg)
        rs.append(r)
        ws.append(pow(s, -1, EC_ORDER))
        xs.append((px << 252) % p)
        ys.append((py << 252) % p)
    # Pad with a benign valid-range lane.
    gx, gy = EC_GEN
    while len(msgs) < target:
        msgs.append(1)
        rs.append(1)
        ws.append(1)
        xs.append((gx << 252) % p)
        ys.append((gy << 252) % p)

    out = _verify_fn()(
        jnp.asarray(pack_ints(msgs)),
        jnp.asarray(pack_ints(rs)),
        jnp.asarray(pack_ints(ws)),
        jnp.asarray(pack_ints(xs)),
        jnp.asarray(pack_ints(ys)),
    )
    return [bool(v) for v in np.asarray(out)[:n]]
