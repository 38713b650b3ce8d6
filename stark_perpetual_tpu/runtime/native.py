"""ctypes binding for the native host crypto library (csrc/starkcrypto.c).

Build on demand (cc -O3 -shared); fall back to pure Python silently when no
compiler is available. `pedersen_hash` here is ~100x faster than the bigint
host oracle and is used by host-side pipelines (config hashing, leaf prep);
the TPU kernels remain the bulk path.
"""

import ctypes
import functools
import os
import subprocess
from typing import List, Optional, Sequence, Tuple

import numpy as np

_SO_PATH = os.path.join(os.path.dirname(__file__), "_starkcrypto.so")
_SRC_PATH = os.path.join(os.path.dirname(__file__), "..", "..", "csrc", "starkcrypto.c")


def _build() -> Optional[str]:
    if os.path.exists(_SO_PATH) and os.path.getmtime(_SO_PATH) >= os.path.getmtime(_SRC_PATH):
        return _SO_PATH
    for cc in ("cc", "gcc", "clang"):
        try:
            subprocess.run(
                [cc, "-O3", "-shared", "-fPIC", "-o", _SO_PATH, _SRC_PATH],
                check=True,
                capture_output=True,
            )
            return _SO_PATH
        except (OSError, subprocess.CalledProcessError):
            continue
    return None


def _int_to_u64x4(v: int) -> np.ndarray:
    return np.array(
        [(v >> (64 * k)) & 0xFFFFFFFFFFFFFFFF for k in range(4)], dtype=np.uint64
    )


def _u64x4_to_int(a) -> int:
    return sum(int(a[k]) << (64 * k) for k in range(4))


@functools.lru_cache(maxsize=1)
def _lib() -> Optional[ctypes.CDLL]:
    path = _build()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.stark_set_constant_points.argtypes = [ctypes.POINTER(ctypes.c_uint64)]
    lib.stark_pedersen_hash.argtypes = [ctypes.POINTER(ctypes.c_uint64)] * 3
    lib.stark_pedersen_hash.restype = ctypes.c_int
    lib.stark_pedersen_hash_batch.argtypes = [
        ctypes.POINTER(ctypes.c_uint64)
    ] * 3 + [ctypes.c_long]
    lib.stark_pedersen_hash_batch.restype = ctypes.c_int
    lib.stark_private_to_public.argtypes = [ctypes.POINTER(ctypes.c_uint64)] * 3
    lib.stark_private_to_public.restype = ctypes.c_int

    from stark_perpetual_tpu.params import CONSTANT_POINTS

    table = np.zeros((506, 8), dtype=np.uint64)
    for i, (x, y) in enumerate(CONSTANT_POINTS):
        table[i, :4] = _int_to_u64x4(x)
        table[i, 4:] = _int_to_u64x4(y)
    lib.stark_set_constant_points(
        table.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))
    )
    return lib


def available() -> bool:
    return _lib() is not None


def pedersen_hash(a: int, b: int) -> Optional[int]:
    """Native Pedersen; None if the library is unavailable or on the
    (unreachable in practice) exceptional-addition case."""
    lib = _lib()
    if lib is None:
        return None
    av, bv = _int_to_u64x4(a), _int_to_u64x4(b)
    out = np.zeros(4, dtype=np.uint64)
    rc = lib.stark_pedersen_hash(
        av.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        bv.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
    )
    if rc != 0:
        return None
    return _u64x4_to_int(out)


def pedersen_hash_batch(pairs: Sequence[Tuple[int, int]]) -> Optional[List[int]]:
    lib = _lib()
    if lib is None or not pairs:
        return None if lib is None else []
    n = len(pairs)
    a = np.zeros((n, 4), dtype=np.uint64)
    b = np.zeros((n, 4), dtype=np.uint64)
    for i, (x, y) in enumerate(pairs):
        a[i] = _int_to_u64x4(x)
        b[i] = _int_to_u64x4(y)
    out = np.zeros((n, 4), dtype=np.uint64)
    rc = lib.stark_pedersen_hash_batch(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        n,
    )
    if rc != 0:
        return None
    return [_u64x4_to_int(out[i]) for i in range(n)]


def private_to_stark_key(priv: int) -> Optional[Tuple[int, int]]:
    lib = _lib()
    if lib is None:
        return None
    pv = _int_to_u64x4(priv)
    ox = np.zeros(4, dtype=np.uint64)
    oy = np.zeros(4, dtype=np.uint64)
    rc = lib.stark_private_to_public(
        pv.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        ox.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        oy.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
    )
    if rc != 0:
        return None
    return _u64x4_to_int(ox), _u64x4_to_int(oy)
