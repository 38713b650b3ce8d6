"""Batched Pedersen hash and fixed-base scalar multiplication for TPU.

Replaces the reference's per-bit conditional EC-add loop
(/root/reference/src/starkware/crypto/signature/signature.py:306-317, ~504
sequential modular inversions per hash) with a TPU-shaped computation:

  - 8-bit windowed table lookup: the hash is SHIFT + sum over 64 windows of
    a precomputed combination point, i.e. 64 mixed Jacobian adds per hash,
    zero inversions in the loop, one batched inversion at the end.
  - Tables are built on the host once from the constant points (any window
    combination is just a sum of the published per-bit points) and cached
    as a binary artifact.
  - The batch dimension is the vector axis; `lax.scan` over the 64 windows
    keeps the XLA graph compact.

Value-exactness: the windowed sum equals the reference's per-bit sum (group
commutativity); the result is bit-identical on all published vectors. The
per-bit AIR-faithful scan (with the x-collision failure semantics) lives in
`pedersen_air.py`-style kernels in ops/ecdsa.py's mimic machinery.
"""

import functools
import os
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from stark_perpetual_tpu.ops.curve_ops import CurveOps, JacPoint
from stark_perpetual_tpu.ops.field import N_LIMBS, pack_ints, stark_prime_field
from stark_perpetual_tpu.params import CONSTANT_POINTS, EC_GEN, FIELD_PRIME, SHIFT_POINT
from stark_perpetual_tpu.utils.math_utils import EcInfinity, ec_double, ec_safe_add

WINDOW_BITS = 8
N_WINDOWS_PER_ELEMENT = 32  # 31 full bytes + the 4-bit top window
N_ELEMENT_BITS = 252

_TABLE_CACHE = os.path.join(os.path.dirname(__file__), "..", "params", "msm_tables_w8.npz")


def _build_window_tables(per_bit_points: Sequence, n_bits: int) -> Tuple[np.ndarray, np.ndarray]:
    """(n_windows, 256) tables of affine Montgomery limbs from per-bit points.

    Entry [j, d] = sum of per_bit_points[8j + i] over set bits i of d.
    Entry [j, 0] is the identity, stored as (0, 0) and skipped at runtime.
    """
    n_windows = (n_bits + WINDOW_BITS - 1) // WINDOW_BITS
    xs = np.zeros((n_windows, 256, N_LIMBS), dtype=np.int32)
    ys = np.zeros((n_windows, 256, N_LIMBS), dtype=np.int32)
    p = FIELD_PRIME
    for j in range(n_windows):
        combos: List = [EcInfinity] * 256
        width = min(WINDOW_BITS, n_bits - j * WINDOW_BITS)
        for d in range(1, 1 << width):
            low = d & -d
            prev = combos[d & (d - 1)]
            pt = per_bit_points[j * WINDOW_BITS + low.bit_length() - 1]
            combos[d] = ec_safe_add(prev, pt, 1, p)
        pts = [(0, 0) if c is EcInfinity else c for c in combos]
        xs[j] = pack_ints([(x << 252) % p for x, _ in pts])
        ys[j] = pack_ints([(y << 252) % p for _, y in pts])
    return xs, ys


@functools.lru_cache(maxsize=1)
def _tables() -> dict:
    """Load (or build+cache) the Pedersen and generator window tables."""
    if os.path.exists(_TABLE_CACHE):
        data = np.load(_TABLE_CACHE)
        return {k: data[k] for k in data.files}

    ped0 = CONSTANT_POINTS[2 : 2 + N_ELEMENT_BITS]
    ped1 = CONSTANT_POINTS[2 + N_ELEMENT_BITS : 2 + 2 * N_ELEMENT_BITS]
    gen_bits = []
    g = EC_GEN
    for _ in range(N_ELEMENT_BITS):
        gen_bits.append(g)
        g = ec_double(g, 1, FIELD_PRIME)

    p0x, p0y = _build_window_tables(ped0, N_ELEMENT_BITS)
    p1x, p1y = _build_window_tables(ped1, N_ELEMENT_BITS)
    ggx, ggy = _build_window_tables(gen_bits, N_ELEMENT_BITS)
    out = dict(p0x=p0x, p0y=p0y, p1x=p1x, p1y=p1y, genx=ggx, geny=ggy)
    np.savez_compressed(_TABLE_CACHE, **out)
    return out


def byte_windows(limbs: jnp.ndarray) -> jnp.ndarray:
    """(..., 21) 12-bit limbs -> (..., 32) 8-bit window digits (static plumbing)."""
    digits = []
    for j in range(N_WINDOWS_PER_ELEMENT):
        bit = 8 * j
        i0, sh = divmod(bit, 12)
        v = limbs[..., i0] >> sh
        if sh > 4 and i0 + 1 < N_LIMBS:
            v = v | (limbs[..., i0 + 1] << (12 - sh))
        digits.append(v & 0xFF)
    return jnp.stack(digits, axis=-1)


class WindowedMSM:
    """Sum of per-window table points, scanned over windows."""

    def __init__(self, table_xs: np.ndarray, table_ys: np.ndarray, init_affine=None):
        """table_xs/ys: (n_windows, 256, 21) int32 Montgomery limbs.
        init_affine: optional (x, y) ints; accumulation starts there.
        """
        self.curve = CurveOps()
        self.f = self.curve.f
        self.tx = jnp.asarray(table_xs)
        self.ty = jnp.asarray(table_ys)
        self.init_affine = init_affine
        if init_affine is not None:
            ix, iy = self.curve.pack_affine_mont([init_affine])
            self.init_x, self.init_y = ix[0], iy[0]

    def accumulate(self, digits: jnp.ndarray) -> Tuple[JacPoint, jnp.ndarray]:
        """digits: (N, n_windows) int32. Returns (jac_point, exceptional)."""
        n = digits.shape[0]
        if self.init_affine is not None:
            acc = self.curve.from_affine_mont(
                jnp.broadcast_to(jnp.asarray(self.init_x), (n, N_LIMBS)),
                jnp.broadcast_to(jnp.asarray(self.init_y), (n, N_LIMBS)),
            )
        else:
            acc = self.curve.infinity((n,))
        bad0 = jnp.zeros((n,), dtype=bool)

        def body(carry, xs):
            acc, bad = carry
            tx_j, ty_j, d_j = xs  # (256,21), (256,21), (N,)
            px = tx_j[d_j]
            py = ty_j[d_j]
            nxt, exc = self.curve.add_mixed(acc, px, py, skip=(d_j == 0))
            return (nxt, jnp.logical_or(bad, exc)), None

        (acc, bad), _ = jax.lax.scan(
            body, (acc, bad0), (self.tx, self.ty, digits.swapaxes(0, 1))
        )
        return acc, bad


def _use_pallas() -> bool:
    mode = os.environ.get("STARK_TPU_MSM_ENGINE", "auto")
    if mode in ("pallas", "xla"):
        return mode == "pallas"
    return jax.default_backend() not in ("cpu",)


def _make_msm(tx, ty, init_affine=None):
    if _use_pallas():
        from stark_perpetual_tpu.ops.pedersen_pallas import PallasMSM

        return PallasMSM(tx, ty, init_affine=init_affine)
    return WindowedMSM(tx, ty, init_affine=init_affine)


@functools.lru_cache(maxsize=1)
def _pedersen_msm():
    # One 64-window accumulation: element-0 windows then element-1 windows,
    # starting at the shift point (hash = SHIFT + sum of selections).
    t = _tables()
    tx = np.concatenate([t["p0x"], t["p1x"]], axis=0)
    ty = np.concatenate([t["p0y"], t["p1y"]], axis=0)
    return _make_msm(tx, ty, init_affine=SHIFT_POINT)


@functools.lru_cache(maxsize=1)
def pedersen_hash_batch():
    """Jitted (a_limbs, b_limbs) -> (hash_limbs, ok): batched 2-ary Pedersen.

    Inputs/outputs are standard-domain (N, 21) limb arrays; `ok` is a bool
    mask (False lanes hit an exceptional addition; probability ~2^-250).
    """
    msm = _pedersen_msm()  # constructed eagerly: tables must not be traced

    def impl(a_limbs, b_limbs):
        digits = jnp.concatenate([byte_windows(a_limbs), byte_windows(b_limbs)], axis=-1)
        acc, bad = msm.accumulate(digits)
        x_mont, _ = msm.curve.to_affine(acc)
        return msm.f.from_mont(x_mont), jnp.logical_not(bad)

    return jax.jit(impl)


@functools.lru_cache(maxsize=1)
def stark_key_batch():
    """Jitted (priv_limbs,) -> (pub_x, pub_y, ok): batched private-to-public."""
    t = _tables()
    msm = _make_msm(t["genx"], t["geny"])

    def impl(priv_limbs):
        acc, bad = msm.accumulate(byte_windows(priv_limbs))
        x_mont, y_mont = msm.curve.to_affine(acc)
        f = msm.f
        return f.from_mont(x_mont), f.from_mont(y_mont), jnp.logical_not(bad)

    return jax.jit(impl)


# -- host conveniences -----------------------------------------------------


def _pad_batch(arr: np.ndarray, multiple: int = 64) -> np.ndarray:
    """Pad the leading axis up so every small call shares one compiled shape."""
    n = arr.shape[0]
    target = max(multiple, -(-n // multiple) * multiple)
    if target == n:
        return arr
    pad = np.zeros((target - n, *arr.shape[1:]), dtype=arr.dtype)
    return np.concatenate([arr, pad], axis=0)


_NATIVE_CUTOVER = 1024  # below this, the native host lib beats device dispatch

# Fixed device-call shape for the int funnel and the Merkle engines: every
# batched hash call pads/chunks to this lane count so exactly ONE Pallas
# (or XLA) executable serves all of them. Pallas kernels do not land in the
# persistent compile cache on this stack, so per-shape specialization costs
# a full remote compile (~45s each through the axon service); a proof run
# touches ~10 level/layer sizes, which made shape-specialized hashing the
# dominant wall-time term of the device prover.
_CHUNK = 4096


@functools.lru_cache(maxsize=1)
def _pedersen_chunk_fn():
    msm = _pedersen_msm()

    def impl(a_limbs, b_limbs):
        digits = jnp.concatenate(
            [byte_windows(a_limbs), byte_windows(b_limbs)], axis=-1
        )
        acc, bad = msm.accumulate(digits)
        x_mont, _ = msm.curve.to_affine(acc)
        return msm.f.from_mont(x_mont), bad

    return jax.jit(impl)


def pedersen_hash_limbs_chunked(a_limbs: np.ndarray, b_limbs: np.ndarray):
    """Batched 2-ary Pedersen over (N, 21) limb arrays in fixed-shape chunks.

    Returns (hash_limbs (N, 21) np.ndarray, any_bad bool). One compiled
    executable (shape (_CHUNK, 21)) serves every call site and every N.
    """
    n = a_limbs.shape[0]
    fn = _pedersen_chunk_fn()
    outs = []
    any_bad = False
    for lo in range(0, n, _CHUNK):
        a = np.asarray(a_limbs[lo : lo + _CHUNK])
        b = np.asarray(b_limbs[lo : lo + _CHUNK])
        k = a.shape[0]
        if k < _CHUNK:
            pad = np.zeros((_CHUNK - k, a.shape[1]), dtype=a.dtype)
            a = np.concatenate([a, pad])
            b = np.concatenate([b, pad])
        h, bad = fn(jnp.asarray(a), jnp.asarray(b))
        outs.append(np.asarray(h)[:k])
        any_bad = any_bad or bool(np.asarray(bad)[:k].any())
    return np.concatenate(outs, axis=0), any_bad

# Active obligation logs (see pedersen_call_log). Every batched 2-ary hash
# in the framework funnels through pedersen_hash_ints, so recording here
# captures the complete pedersen-builtin obligation set of any computation:
# Merkle/Patricia tree nodes, position leaves, message hash chains.
_CALL_LOGS: List[List[Tuple[int, int, int]]] = []


class pedersen_call_log:
    """Context manager recording every (a, b, h) computed while active.

    The log is the pedersen-builtin trace of the enclosed computation —
    feed it to ``models.builtin_prover.prove_builtin_obligations`` to turn
    the whole run's hash obligations into one pooled STARK proof (the
    role of the pedersen builtin segment in the reference's AIR,
    src/services/perpetual/cairo/main.cairo:1).
    """

    def __enter__(self) -> List[Tuple[int, int, int]]:
        self.calls: List[Tuple[int, int, int]] = []
        _CALL_LOGS.append(self.calls)
        return self.calls

    def __exit__(self, *exc) -> None:
        _CALL_LOGS.remove(self.calls)


def pedersen_hash_ints(pairs: Sequence[Tuple[int, int]]) -> List[int]:
    n = len(pairs)
    if n == 0:
        return []
    if _CALL_LOGS:
        out = _pedersen_hash_ints(pairs)
        for log in _CALL_LOGS:
            log.extend((a, b, h) for (a, b), h in zip(pairs, out))
        return out
    return _pedersen_hash_ints(pairs)


def _pedersen_hash_ints(pairs: Sequence[Tuple[int, int]]) -> List[int]:
    n = len(pairs)
    # On a CPU backend the "device" path is eager XLA with a per-shape
    # compile — the native host library wins at every size there; on TPU
    # only small batches stay on the host.
    if n < _NATIVE_CUTOVER or jax.default_backend() == "cpu":
        from stark_perpetual_tpu.runtime import native

        out = native.pedersen_hash_batch(pairs)
        if out is not None:
            return out
    f = stark_prime_field()
    a = f.pack([a for a, _ in pairs])
    b = f.pack([b for _, b in pairs])
    h, any_bad = pedersen_hash_limbs_chunked(a, b)
    assert not any_bad, "Unhashable input."
    return [int(v) for v in f.unpack(h)]


def private_to_stark_key_ints(privs: Sequence[int]) -> List[int]:
    f = stark_prime_field()
    n = len(privs)
    arr = _pad_batch(pack_ints(list(privs)))
    arr[n:, 0] = 1  # pad lanes: scalar 1 (scalar 0 would hit the identity path)
    x, _y, ok = stark_key_batch()(arr)
    assert bool(np.all(np.asarray(ok)[:n]))
    return [int(v) for v in f.unpack(x)[:n]]
