"""Pallas TPU kernel for batched windowed-MSM (Pedersen hash / fixed-base mul).

Why a kernel: the XLA path materializes intermediates to HBM between the
~700 elementwise limb ops of every EC addition, and its table gathers cost
~1.4 ms per window. Here the whole 64-window accumulation lives in VMEM:

  - table selection is an int8 one-hot matmul on the MXU (exact: 12-bit limbs
    split into 6-bit halves), never a gather;
  - the Jacobian mixed-add runs on (limb-row, lane) int32 tiles on the VPU,
    with all temporaries in registers/VMEM;
  - HBM traffic is inputs + outputs only.

Layout: field elements as (21, B) int32 rows (limb-major), batch in lanes.
Tables: (n_windows, 84, 256) int8, rows = [x_lo(21) | y_lo(21) | x_hi(21) |
y_hi(21)] where limb = lo + (hi << 6).
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stark_perpetual_tpu.ops.field import LIMB_BITS, LIMB_MASK, N_LIMBS, stark_prime_field
from stark_perpetual_tpu.params import FIELD_PRIME, SHIFT_POINT

# CIOS constants for the Stark prime (see ops/field.py): p's nonzero 12-bit
# limbs and n' = -p^-1 mod 2^12 == 4095 (p = 1 mod 2^192).
_P_NONZERO = ((0, 1), (16, 17), (20, 2048))
_NPRIME = 4095
# Lanes per grid step: (8, _LANE_BLOCK/8) int32 tiles per limb row. Larger
# blocks amortize VPU instruction latency over more lanes (the CIOS carry
# chain is serial); 4096 measures ~30% faster than 2048 on v5e, 8192
# overflows VMEM.
_LANE_BLOCK = 4096


def _mont_mul_rows(a, b):
    """Montgomery product on (21, *tile) int32 rows; canonical limbs in/out."""
    tile = a.shape[1:]
    t = [jnp.zeros(tile, dtype=jnp.int32) for _ in range(N_LIMBS + 1)]
    for i in range(N_LIMBS):
        ai = a[i]
        for j in range(N_LIMBS):
            t[j] = t[j] + ai * b[j]
        m = ((t[0] & LIMB_MASK) * _NPRIME) & LIMB_MASK
        for j, mv in _P_NONZERO:
            t[j] = t[j] + m * mv
        carry = t[0] >> LIMB_BITS
        t = t[1:] + [jnp.zeros(tile, dtype=jnp.int32)]
        t[0] = t[0] + carry
    # carry propagate (22 limbs, < 2p) then conditional subtract p.
    limbs = []
    carry = jnp.zeros(tile, dtype=jnp.int32)
    for i in range(N_LIMBS + 1):
        v = t[i] + carry
        limbs.append(v & LIMB_MASK)
        carry = v >> LIMB_BITS
    return _cond_sub_p22(limbs)


_P22 = [(FIELD_PRIME >> (LIMB_BITS * i)) & LIMB_MASK for i in range(N_LIMBS + 1)]


def _cond_sub_p22(limbs22):
    """22 canonical limbs < 2p -> 21-limb canonical value mod p (stacked)."""
    diff = []
    borrow = jnp.zeros_like(limbs22[0])
    for i in range(N_LIMBS + 1):
        v = limbs22[i] - _P22[i] - borrow
        diff.append(v & LIMB_MASK)
        borrow = (v >> LIMB_BITS) & 1
    keep = borrow == 1  # t < p
    rows = [jnp.where(keep, limbs22[i], diff[i]) for i in range(N_LIMBS)]
    return jnp.stack(rows, axis=0)


def _add_rows(a, b):
    """(a + b) mod p on (21, B) rows (canonical in/out)."""
    limbs = []
    carry = jnp.zeros_like(a[0])
    for i in range(N_LIMBS):
        v = a[i] + b[i] + carry
        limbs.append(v & LIMB_MASK)
        carry = v >> LIMB_BITS
    limbs.append(carry)
    return _cond_sub_p22(limbs)


def _sub_rows(a, b):
    """(a - b) mod p on (21, B) rows."""
    diff = []
    borrow = jnp.zeros_like(a[0])
    for i in range(N_LIMBS):
        v = a[i] - b[i] - borrow
        diff.append(v & LIMB_MASK)
        borrow = (v >> LIMB_BITS) & 1
    # Add p back where we underflowed (mod 2^252 arithmetic drops the carry).
    fixed = []
    carry = jnp.zeros_like(a[0])
    for i in range(N_LIMBS):
        v = diff[i] + ((FIELD_PRIME >> (LIMB_BITS * i)) & LIMB_MASK) + carry
        fixed.append(v & LIMB_MASK)
        carry = v >> LIMB_BITS
    neg = borrow == 1
    return jnp.stack([jnp.where(neg, fixed[i], diff[i]) for i in range(N_LIMBS)], axis=0)


def _is_zero_rows(a):
    acc = a[0]
    for i in range(1, N_LIMBS):
        acc = acc | a[i]
    return acc == 0


def _select_rows(mask, a, b):
    """mask (*tile,) ? a : b, on (21, *tile) rows."""
    return jnp.where(mask[None], a, b)


def _madd_rows(X1, Y1, Z1, x2, y2, skip):
    """Jacobian + affine mixed add on rows; returns (X3, Y3, Z3, exceptional).

    Same case semantics as CurveOps.add_mixed: P==inf -> Q; P==-Q -> inf;
    doubling case flagged exceptional; `skip` lanes pass through.
    """
    Z1Z1 = _mont_mul_rows(Z1, Z1)
    U2 = _mont_mul_rows(x2, Z1Z1)
    S2 = _mont_mul_rows(y2, _mont_mul_rows(Z1, Z1Z1))
    H = _sub_rows(U2, X1)
    HH = _mont_mul_rows(H, H)
    I4 = _add_rows(_add_rows(HH, HH), _add_rows(HH, HH))
    J = _mont_mul_rows(H, I4)
    r = _sub_rows(S2, Y1)
    r = _add_rows(r, r)
    V = _mont_mul_rows(X1, I4)
    rr = _mont_mul_rows(r, r)
    X3 = _sub_rows(_sub_rows(rr, J), _add_rows(V, V))
    Y1J = _mont_mul_rows(Y1, J)
    Y3 = _sub_rows(_mont_mul_rows(r, _sub_rows(V, X3)), _add_rows(Y1J, Y1J))
    z1h = _add_rows(Z1, H)
    Z3 = _sub_rows(_sub_rows(_mont_mul_rows(z1h, z1h), Z1Z1), HH)

    p_inf = _is_zero_rows(Z1)
    h_zero = _is_zero_rows(H)
    r_zero = _is_zero_rows(r)
    exceptional = (~p_inf) & h_zero & r_zero & (~skip)

    one_rows = _const_rows((1 << 252) % FIELD_PRIME, X1.shape[1:])
    X3 = _select_rows(p_inf, x2, X3)
    Y3 = _select_rows(p_inf, y2, Y3)
    Z3 = _select_rows(p_inf, one_rows, Z3)
    X3 = _select_rows(skip, X1, X3)
    Y3 = _select_rows(skip, Y1, Y3)
    Z3 = _select_rows(skip, Z1, Z3)
    return X3, Y3, Z3, exceptional


def _const_rows(value: int, tile):
    rows = [
        jnp.full(tile, (value >> (LIMB_BITS * i)) & LIMB_MASK, dtype=jnp.int32)
        for i in range(N_LIMBS)
    ]
    return jnp.stack(rows, axis=0)


def _msm_kernel(n_windows: int, init_affine, digits_ref, tab_ref, out_ref, poison_ref):
    """digits_ref: (n_windows, 1, 8, L) int32 (lanes tiled (sublane, lane));
    tab_ref: (n_windows, 84, 256) int8; out_ref: (63, 1, 8, L) rows =
    X(21) | Y(21) | Z(21); poison_ref: (1, 1, 8, L) int32.
    """
    tile = digits_ref.shape[2:]  # (8, L)
    if init_affine is not None:
        x0, y0 = init_affine
        X = _const_rows((x0 << 252) % FIELD_PRIME, tile)
        Y = _const_rows((y0 << 252) % FIELD_PRIME, tile)
        Z = _const_rows((1 << 252) % FIELD_PRIME, tile)
    else:
        X = _const_rows(0, tile)
        Y = _const_rows(0, tile)
        Z = _const_rows(0, tile)
    poison = jnp.zeros(tile, dtype=jnp.int32)

    iota256 = jax.lax.broadcasted_iota(jnp.int32, (tile[0], 256, tile[1]), 1)

    def body(w, carry):
        X, Y, Z, poison = carry
        d = digits_ref[w, 0]  # (8, L)
        onehot = (iota256 == d[:, None, :]).astype(jnp.int8)  # (8, 256, L)
        tab = tab_ref[w]  # (84, 256) int8
        # (84, 256) x (8, 256, L) -> (84, 8, L): 8 MXU matmuls, exact in int32.
        sel = jax.lax.dot_general(
            tab, onehot, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
        )
        px = sel[0:21] + (sel[42:63] << 6)
        py = sel[21:42] + (sel[63:84] << 6)
        skip = d == 0
        X, Y, Z, exc = _madd_rows(X, Y, Z, px, py, skip)
        return X, Y, Z, poison | exc.astype(jnp.int32)

    X, Y, Z, poison = jax.lax.fori_loop(0, n_windows, body, (X, Y, Z, poison))
    out_ref[0:21, 0] = X
    out_ref[21:42, 0] = Y
    out_ref[42:63, 0] = Z
    poison_ref[0, 0] = poison


def build_tables_int8(table_xs: np.ndarray, table_ys: np.ndarray) -> np.ndarray:
    """(W, 256, 21) Montgomery limb tables -> (W, 84, 256) int8 lo/hi halves."""
    w = table_xs.shape[0]
    tab = np.zeros((w, 84, 256), dtype=np.int8)
    xs = table_xs.transpose(0, 2, 1)  # (W, 21, 256)
    ys = table_ys.transpose(0, 2, 1)
    tab[:, 0:21] = xs & 63
    tab[:, 21:42] = ys & 63
    tab[:, 42:63] = xs >> 6
    tab[:, 63:84] = ys >> 6
    return tab


class PallasMSM:
    """Drop-in accumulate() engine with the same contract as WindowedMSM."""

    def __init__(self, table_xs: np.ndarray, table_ys: np.ndarray, init_affine=None):
        from stark_perpetual_tpu.ops.curve_ops import CurveOps

        self.n_windows = table_xs.shape[0]
        self.tab = jnp.asarray(build_tables_int8(table_xs, table_ys))
        self.init_affine = init_affine
        self.curve = CurveOps()
        self.f = stark_prime_field()

    @functools.cached_property
    def _kernel(self):
        n_windows = self.n_windows
        init = self.init_affine
        kern = functools.partial(_msm_kernel, n_windows, init)

        @jax.jit
        def run(digits_t: jnp.ndarray, tab: jnp.ndarray):
            # digits_t: (n_windows, N) int32; lanes tiled as (blocks, 8, L).
            n = digits_t.shape[1]
            block = min(_LANE_BLOCK, n)
            assert n % block == 0 and block % 8 == 0
            n_blocks, lane = n // block, block // 8
            dg = digits_t.reshape(n_windows, n_blocks, 8, lane)
            out, poison = pl.pallas_call(
                kern,
                grid=(n_blocks,),
                in_specs=[
                    pl.BlockSpec((n_windows, 1, 8, lane), lambda i: (0, i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((n_windows, 84, 256), lambda i: (0, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=[
                    pl.BlockSpec((63, 1, 8, lane), lambda i: (0, i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, 8, lane), lambda i: (0, i, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_shape=[
                    jax.ShapeDtypeStruct((63, n_blocks, 8, lane), jnp.int32),
                    jax.ShapeDtypeStruct((1, n_blocks, 8, lane), jnp.int32),
                ],
            )(dg, tab)
            return out.reshape(63, n), poison.reshape(1, n)

        return run

    def accumulate(self, digits: jnp.ndarray):
        """digits: (N, n_windows) int32 -> (JacPoint-rows as (N,21) arrays, bad)."""
        from stark_perpetual_tpu.ops.curve_ops import JacPoint

        n = digits.shape[0]
        # Mosaic needs full-width lane tiles: pad small batches up to one
        # block (digit 0 = skip, so padded lanes are benign).
        target = max(_LANE_BLOCK, -(-n // _LANE_BLOCK) * _LANE_BLOCK)
        if target != n:
            digits = jnp.concatenate(
                [digits, jnp.zeros((target - n, digits.shape[1]), digits.dtype)], axis=0
            )
        out, poison = self._kernel(digits.swapaxes(0, 1), self.tab)
        X = out[0:21, :n].swapaxes(0, 1)
        Y = out[21:42, :n].swapaxes(0, 1)
        Z = out[42:63, :n].swapaxes(0, 1)
        return JacPoint(X, Y, Z), poison[0, :n].astype(bool)
