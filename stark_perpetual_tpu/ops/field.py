"""Multi-limb modular arithmetic for TPU: 21 x 12-bit limbs in int32 lanes.

Design (TPU-first, not a port):
  - A field element is an int32 array of shape (..., 21), little-endian
    12-bit limbs. 21 * 12 = 252 bits exactly covers the Stark field
    p = 2^251 + 17*2^192 + 1 and the curve order n (both < 2^252).
  - 12-bit limbs keep every partial product (< 2^24) and every lazily
    accumulated column (< 21 * 2^25 < 2^30) inside int32 — no 64-bit ops,
    so the same code runs on the TPU VPU (which is 32-bit) and in Pallas.
  - Multiplication is Montgomery CIOS with R = 2^252. For the Stark prime the
    reduction step is nearly free: p's limbs are [1, 0...0, 17, 0, 0, 0, 2048],
    so `m * p` touches three columns. The implementation is generic over the
    modulus (the ECDSA scalar field n uses the same code path) and XLA
    constant-folds the sparse-limb multiplies.
  - All ops vectorize over arbitrary leading batch dimensions; the batch is
    the hardware vector axis ("data parallelism" in the reference's terms --
    the reference computes one bigint at a time on the CPython VM:
    /root/reference/src/starkware/crypto/signature/math_utils.py:50-100).

The Pallas kernels in `field_pallas.py` reuse these column-arithmetic bounds.
"""

import functools
import os
from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np


def _mont_mul_mode() -> str:
    """Which mont_mul lowering to trace: "unroll" | "scan" | "columns".

    auto policy (measured on this image): CPU -> "scan" (smallest graphs,
    best XLA:CPU runtime), TPU -> "unroll" (best VPU runtime; compile cost
    amortized by the persistent cache). "columns" (schoolbook product
    columns + one REDC step, ~4x less HLO than the unrolled CIOS with
    log-depth carries) compiles ~3.6x faster than unroll on TPU at ~2x
    runtime — selectable via STARK_TPU_MONT_MUL for compile-bound paths.
    """
    mode = os.environ.get("STARK_TPU_MONT_MUL", "auto")
    if mode in ("unroll", "scan", "columns"):
        return mode
    return "scan" if jax.default_backend() == "cpu" else "unroll"


def _use_unrolled_mont() -> bool:
    return _mont_mul_mode() == "unroll"


LIMB_BITS = 12
N_LIMBS = 21
LIMB_MASK = (1 << LIMB_BITS) - 1
R_BITS = LIMB_BITS * N_LIMBS  # 252


def pack_int(value: int, n_limbs: int = N_LIMBS) -> np.ndarray:
    """Host: python int -> little-endian limb vector (np.int32, shape (n_limbs,))."""
    assert 0 <= value < 1 << (LIMB_BITS * n_limbs)
    return np.array(
        [(value >> (LIMB_BITS * i)) & LIMB_MASK for i in range(n_limbs)], dtype=np.int32
    )


def pack_ints(values: Sequence[int], n_limbs: int = N_LIMBS) -> np.ndarray:
    """Host: sequence of ints -> (len, n_limbs) int32 limb array."""
    return np.stack([pack_int(v, n_limbs) for v in values])


def unpack_ints(arr: Union[np.ndarray, jnp.ndarray]) -> np.ndarray:
    """Host: (..., n_limbs) limb array -> object array of python ints."""
    arr = np.asarray(arr)
    flat = arr.reshape(-1, arr.shape[-1])
    out = np.empty(flat.shape[0], dtype=object)
    for i, limbs in enumerate(flat):
        out[i] = sum(int(l) << (LIMB_BITS * k) for k, l in enumerate(limbs))
    return out.reshape(arr.shape[:-1])


def _shift_up(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """Shift limbs toward the high end along the last axis (value *= 2^(12s)).

    result[..., i] = x[..., i-s] (zeros shifted in at the low end; the top s
    limbs fall off). One lax.pad op: no per-limb slicing.
    """
    cfg = [(0, 0, 0)] * (x.ndim - 1) + [(s, -s, 0)]
    return jax.lax.pad(x, jnp.zeros((), x.dtype), cfg)


def _resolve_unit_carries(t: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Kogge-Stone carry resolution for limbs in [0, 2^12].

    Input limbs may be at most 2^12 (one pending unit carry each); returns
    (canonical limbs in [0, 2^12), carry_out of the top limb). log2(k)
    doubling steps of whole-array ops instead of a k-step ripple.
    """
    g = t >> LIMB_BITS  # 1 iff this limb generates a carry (t == 2^12)
    p = (t == LIMB_MASK).astype(t.dtype)  # propagates an incoming carry
    s = 1
    while s < t.shape[-1]:
        g = g | (p & _shift_up(g, s))
        p = p & _shift_up(p, s)
        s <<= 1
    carry_in = _shift_up(g, 1)
    return (t + carry_in) & LIMB_MASK, g[..., -1]


def _carry_propagate(t: jnp.ndarray) -> jnp.ndarray:
    """Carry propagation to canonical 12-bit limbs (no wraparound).

    Input limbs may be any nonnegative int32 values; output limbs are in
    [0, 2^12). The final carry must be zero (caller guarantees the true value
    fits in the given limb count).

    Two lowerings of the same arithmetic (selected like mont_mul, by backend):
      - unrolled ripple (TPU): a k-step sequential carry chain; XLA fuses it
        into tight lane code, and TPU relayouts for limb-axis shifts are
        avoided.
      - vectorized (CPU/testing): two carry-save passes shrink limbs to at
        most 2^12, then a Kogge-Stone pass resolves the remaining unit
        carries; ~10x less HLO, which dominates CPU compile time.
    """
    if _use_unrolled_mont():
        limbs = []
        carry = jnp.zeros_like(t[..., 0])
        for i in range(t.shape[-1]):
            v = t[..., i] + carry
            limbs.append(v & LIMB_MASK)
            carry = v >> LIMB_BITS
        return jnp.stack(limbs, axis=-1)
    for _ in range(2):
        c = t >> LIMB_BITS
        t = (t & LIMB_MASK) + _shift_up(c, 1)
    # Limbs now < 2^12 + 2^8; one more pass leaves at most a unit carry.
    c = t >> LIMB_BITS
    t = (t & LIMB_MASK) + _shift_up(c, 1)
    out, _carry = _resolve_unit_carries(t)
    return out


def _sub_limbs(a: jnp.ndarray, b: jnp.ndarray):
    """a - b with borrow propagation. Returns (diff mod 2^(12k), borrow_out).

    Dual lowering like _carry_propagate: unrolled borrow ripple on TPU;
    on CPU, base-2^12 two's complement a + (~b) + 1 so the carry machinery
    stays non-negative, with borrow_out = 1 - carry_out.
    """
    if _use_unrolled_mont():
        limbs = []
        borrow = jnp.zeros_like(a[..., 0])
        for i in range(a.shape[-1]):
            v = a[..., i] - b[..., i] - borrow
            limbs.append(v & LIMB_MASK)
            borrow = (v >> LIMB_BITS) & 1  # v in (-2^13, 2^12): borrow is 0 or 1
        return jnp.stack(limbs, axis=-1), borrow
    one_lsb = np.zeros(a.shape[-1], dtype=np.int32)
    one_lsb[0] = 1
    t = a + (LIMB_MASK - b) + one_lsb  # limbs in [0, 2^13)
    c = t >> LIMB_BITS
    t = (t & LIMB_MASK) + _shift_up(c, 1)  # limbs in [0, 2^12]
    diff, ks_carry = _resolve_unit_carries(t)
    # The wraparound carry leaves either in the carry-save pass (top limb's
    # shifted-off carry) or in the Kogge-Stone pass; never both (total < 2^265).
    carry_out = c[..., -1] + ks_carry
    return diff, 1 - carry_out


def _ge(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    _, borrow = _sub_limbs(a, b)
    return borrow == 0


def _mul_columns(a: jnp.ndarray, b: jnp.ndarray, out_width: int) -> jnp.ndarray:
    """Schoolbook product columns: out[..., k] = sum_{i+j=k} a_i * b_j for
    k < out_width, lazily accumulated (each column < 21 * (2^12-1)^2 < 2^29,
    int32-safe). out_width = 2*N_LIMBS gives the full product; out_width =
    N_LIMBS truncates to the low half (for REDC's m = T * N' mod R).
    """
    shape = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    acc = jnp.zeros((*shape, out_width), dtype=jnp.int32)
    for i in range(min(N_LIMBS, out_width)):
        term = a[..., i : i + 1] * b  # (..., N_LIMBS)
        cfg = [(0, 0, 0)] * (term.ndim - 1) + [(i, out_width - i - N_LIMBS, 0)]
        acc = acc + jax.lax.pad(term, jnp.zeros((), term.dtype), cfg)
    return acc


class Field:
    """Modular arithmetic over a fixed modulus < 2^252, Montgomery domain."""

    def __init__(self, modulus: int):
        assert modulus % 2 == 1 and modulus < 1 << R_BITS
        self.modulus = modulus
        self.mod_limbs = pack_int(modulus)
        self.mod_limbs22 = pack_int(modulus, N_LIMBS + 1)
        # -modulus^-1 mod 2^12 (Montgomery constant).
        self.nprime = (-pow(modulus, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)
        self.r = (1 << R_BITS) % modulus
        self.r2 = self.r * self.r % modulus
        self.r2_limbs = pack_int(self.r2)
        self.one_std_limbs = pack_int(1)
        self.one_mont_limbs = pack_int(self.r)  # 1 in Montgomery form
        self.zero_limbs = pack_int(0)
        # Nonzero columns of the modulus (sparse for the Stark prime).
        self.mod_nonzero = [(i, int(v)) for i, v in enumerate(self.mod_limbs) if v != 0]
        # Full -modulus^-1 mod 2^252 (REDC constant for the columns lowering).
        self.nprime_full = (-pow(modulus, -1, 1 << R_BITS)) % (1 << R_BITS)
        self.nprime_full_limbs = pack_int(self.nprime_full)

    # Jitted entry points (eager per-op dispatch is prohibitively slow on a
    # remote TPU; always call through these or inside an outer jit).
    @functools.cached_property
    def jit_add(self):
        return jax.jit(self.add)

    @functools.cached_property
    def jit_sub(self):
        return jax.jit(self.sub)

    @functools.cached_property
    def jit_mul(self):
        return jax.jit(self.mont_mul)

    @functools.cached_property
    def jit_to_mont(self):
        return jax.jit(self.to_mont)

    @functools.cached_property
    def jit_from_mont(self):
        return jax.jit(self.from_mont)

    @functools.cached_property
    def jit_inv(self):
        return jax.jit(self.inv)

    @functools.cached_property
    def jit_batch_inv(self):
        return jax.jit(self.batch_inv, static_argnames=("group",))

    # -- packing -----------------------------------------------------------

    def pack(self, values) -> np.ndarray:
        if isinstance(values, int):
            return pack_int(values % self.modulus)
        return pack_ints([v % self.modulus for v in values])

    def unpack(self, arr) -> np.ndarray:
        return unpack_ints(arr)

    def zeros(self, shape=()) -> jnp.ndarray:
        return jnp.zeros((*shape, N_LIMBS), dtype=jnp.int32)

    def consts(self, value: int, shape=()) -> jnp.ndarray:
        return jnp.broadcast_to(jnp.asarray(self.pack(value)), (*shape, N_LIMBS))

    # -- ring ops (canonical-limb in, canonical-limb out) ------------------

    def add(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """(a + b) mod m; inputs canonical (< m)."""
        t = _carry_propagate_with_top(a + b)
        return self._cond_sub_mod22(t)

    def sub(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """(a - b) mod m; inputs canonical (< m)."""
        diff, borrow = _sub_limbs(a, b)
        fixed = _carry_propagate(diff + self.mod_limbs)  # < 2m, and >= m - b + a
        return jnp.where((borrow == 1)[..., None], fixed, diff)

    def neg(self, a: jnp.ndarray) -> jnp.ndarray:
        return self.sub(self.consts(0, a.shape[:-1]), a)

    def mont_mul(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """Montgomery product a*b*R^-1 mod m. Inputs/outputs canonical limbs.

        CIOS with lazy carries: every column stays < 2^31 (see module doc).
        Two lowerings of the same arithmetic:
          - unrolled (TPU): all 21 CIOS iterations inlined; XLA fuses the
            whole product into tight VPU code (~350x faster than the scan
            form on a v5e) at the cost of a large graph.
          - scanned (CPU/testing): lax.scan over iterations; ~30x faster to
            compile, which dominates for the CPU test suite.
        Selection is by backend at trace time (override: STARK_TPU_MONT_MUL
        env var, values "unroll" | "scan").
        """
        mode = _mont_mul_mode()
        if mode == "unroll":
            return self._mont_mul_unrolled(a, b)
        if mode == "scan":
            return self._mont_mul_scan(a, b)
        return self._mont_mul_columns(a, b)

    def _mont_mul_columns(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """Separated-REDC lowering: full schoolbook product columns, then one
        Montgomery reduction step.

            T = a * b                     (42 columns, lazy, < 2^29 each)
            m = (T mod R) * N' mod R      (N' = -p^-1 mod 2^252; the
                                           vectorized carry pass wraps mod R)
            u = T + m * p                 (u ≡ 0 mod R by construction)
            result = u / R  (< 2p)        (drop the low 21 canonical limbs)

        ~5x fewer HLO ops than the unrolled CIOS (63 + 63 + sparse-mod adds
        instead of 21 interleaved iterations), and every carry resolution is
        the log-depth vectorized pass instead of a 21-step ripple — faster to
        compile everywhere and faster to run on both CPU and TPU.
        """
        t = _mul_columns(a, b, 2 * N_LIMBS)
        t = _carry_propagate(t)  # canonical: a*b < 2^504 fits 42 limbs exactly
        m = _mul_columns(t[..., :N_LIMBS], jnp.asarray(self.nprime_full_limbs), N_LIMBS)
        m = _carry_propagate(m)  # wraps mod R: exactly (T * N') mod 2^252
        cfg = [(0, 0, 0)] * (m.ndim - 1) + [(0, N_LIMBS, 0)]
        m42 = jax.lax.pad(m, jnp.zeros((), m.dtype), cfg)
        mp = jnp.zeros_like(m42)
        for j, v in self.mod_nonzero:  # m * p via the modulus' nonzero columns
            mp = mp + v * _shift_up(m42, j)
        u = _carry_propagate_with_top(t + mp)  # 43 limbs; low 21 are zero
        return self._cond_sub_mod22(u[..., N_LIMBS:])

    def _mont_mul_unrolled(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        shape = jnp.broadcast_shapes(a.shape, b.shape)
        a = jnp.broadcast_to(a, shape)
        b = jnp.broadcast_to(b, shape)
        t = [jnp.zeros(shape[:-1], dtype=jnp.int32) for _ in range(N_LIMBS + 1)]
        for i in range(N_LIMBS):
            ai = a[..., i]
            for j in range(N_LIMBS):
                t[j] = t[j] + ai * b[..., j]
            # m makes t[0] + m*mod divisible by 2^12; mod's sparse columns
            # (3 for the Stark prime) are the only updates.
            m = ((t[0] & LIMB_MASK) * self.nprime) & LIMB_MASK
            for j, mv in self.mod_nonzero:
                t[j] = t[j] + m * mv
            carry = t[0] >> LIMB_BITS
            t = t[1:] + [jnp.zeros(shape[:-1], dtype=jnp.int32)]
            t[0] = t[0] + carry
        out = _carry_propagate(jnp.stack(t, axis=-1))  # 22 canonical limbs, < 2m
        return self._cond_sub_mod22(out)

    def _mont_mul_scan(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        shape = jnp.broadcast_shapes(a.shape, b.shape)
        a = jnp.broadcast_to(a, shape)
        b = jnp.broadcast_to(b, shape)
        mod = jnp.asarray(self.mod_limbs)
        t0 = jnp.zeros((*shape[:-1], N_LIMBS + 1), dtype=jnp.int32)

        def body(t, ai):
            t = t.at[..., :N_LIMBS].add(ai[..., None] * b)
            m = ((t[..., 0] & LIMB_MASK) * self.nprime) & LIMB_MASK
            t = t.at[..., :N_LIMBS].add(m[..., None] * mod)
            carry = t[..., 0] >> LIMB_BITS
            t = jnp.concatenate(
                [t[..., 1:], jnp.zeros((*shape[:-1], 1), dtype=jnp.int32)], axis=-1
            )
            t = t.at[..., 0].add(carry)
            return t, None

        t, _ = jax.lax.scan(body, t0, jnp.moveaxis(a, -1, 0))
        out = _carry_propagate(t)  # 22 canonical limbs, < 2m
        return self._cond_sub_mod22(out)

    def _cond_sub_mod22(self, t22: jnp.ndarray) -> jnp.ndarray:
        """t (22 canonical limbs, < 2m) -> t mod m (21 limbs)."""
        diff, borrow = _sub_limbs(t22, jnp.broadcast_to(self.mod_limbs22, t22.shape))
        out = jnp.where((borrow == 1)[..., None], t22, diff)
        return out[..., :N_LIMBS]

    # -- domain conversion -------------------------------------------------

    def to_mont(self, a: jnp.ndarray) -> jnp.ndarray:
        return self.mont_mul(a, jnp.broadcast_to(self.r2_limbs, a.shape))

    def from_mont(self, a: jnp.ndarray) -> jnp.ndarray:
        return self.mont_mul(a, jnp.broadcast_to(self.one_std_limbs, a.shape))

    # -- predicates --------------------------------------------------------

    def eq(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        return jnp.all(a == b, axis=-1)

    def is_zero(self, a: jnp.ndarray) -> jnp.ndarray:
        return jnp.all(a == 0, axis=-1)

    # -- exponentiation / inversion ---------------------------------------

    def pow_fixed(self, a_mont: jnp.ndarray, exponent: int) -> jnp.ndarray:
        """a^exponent (Montgomery domain), fixed public exponent, via lax.scan."""
        assert exponent > 0
        n_bits = exponent.bit_length()
        bits = jnp.asarray(
            np.array([(exponent >> i) & 1 for i in range(n_bits)], dtype=np.int32)
        )
        one = jnp.broadcast_to(self.one_mont_limbs, a_mont.shape)

        def body(carry, bit):
            result, base = carry
            new_result = jnp.where((bit == 1)[..., None], self.mont_mul(result, base), result)
            new_base = self.mont_mul(base, base)
            return (new_result, new_base), None

        (result, _), _ = jax.lax.scan(body, (one, a_mont), bits)
        return result

    def inv(self, a_mont: jnp.ndarray) -> jnp.ndarray:
        """a^-1 (Montgomery domain) by Fermat; a must be nonzero (else 0)."""
        return self.pow_fixed(a_mont, self.modulus - 2)

    def batch_inv(self, a_mont: jnp.ndarray, group: int = 64) -> jnp.ndarray:
        """Batched inversion, Montgomery-trick within groups along axis 0.

        a_mont: (N, ..., N_LIMBS) with N divisible by `group`. Zero inputs
        produce garbage in their own lane only (callers mask them out).
        """
        n = a_mont.shape[0]
        assert n % group == 0
        grouped = a_mont.reshape(n // group, group, *a_mont.shape[1:])
        # Replace zeros by one so the group product stays invertible.
        zero_mask = jnp.all(grouped == 0, axis=-1, keepdims=True)
        safe = jnp.where(zero_mask, self.one_mont_limbs, grouped)

        # prefix[i] = safe[0] * ... * safe[i], scanning the group axis.
        seq = safe.swapaxes(0, 1)  # (G, C, ..., L)
        ones = jnp.broadcast_to(jnp.asarray(self.one_mont_limbs), seq.shape[1:])

        def scan_fwd(carry, x):
            nxt = self.mont_mul(carry, x)
            return nxt, nxt

        total, prefix = jax.lax.scan(scan_fwd, ones, seq)
        inv_total = self.inv(total)
        prefix_prev = jnp.concatenate([ones[None], prefix[:-1]], axis=0)

        # Backward pass: carry at step i equals inv(prefix[i]); then
        # inv(safe[i]) = carry * prefix[i-1].
        def scan_bwd(carry, xs):
            x, pfx_prev = xs
            inv_here = self.mont_mul(carry, pfx_prev)
            new_carry = self.mont_mul(carry, x)
            return new_carry, inv_here

        _, invs = jax.lax.scan(scan_bwd, inv_total, (seq, prefix_prev), reverse=True)
        return invs.swapaxes(0, 1).reshape(a_mont.shape)


def _carry_propagate_with_top(t: jnp.ndarray) -> jnp.ndarray:
    """Carry-propagate and keep one extra top limb (for values < 2^(12(k+1)))."""
    cfg = [(0, 0, 0)] * (t.ndim - 1) + [(0, 1, 0)]
    extended = jax.lax.pad(t, jnp.zeros((), t.dtype), cfg)
    return _carry_propagate(extended)


@functools.lru_cache(maxsize=None)
def get_field(modulus: int) -> Field:
    return Field(modulus)


def stark_prime_field() -> Field:
    from stark_perpetual_tpu.params import FIELD_PRIME

    return get_field(FIELD_PRIME)


def curve_order_field() -> Field:
    from stark_perpetual_tpu.params import EC_ORDER

    return get_field(EC_ORDER)
