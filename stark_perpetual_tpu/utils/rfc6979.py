"""RFC 6979 deterministic nonce generation (HMAC-SHA2 DRBG), from the spec.

Implements RFC 6979 section 3.2 plus the "additional data" variant of section
3.6 (extra entropy appended after bits2octets(h1) in the two seeding steps),
matching the behavior the reference obtains from the `ecdsa` package
(/root/reference/src/starkware/crypto/signature/signature.py:25,128-134).
"""

import hmac
from typing import Callable


def _bits2int(data: bytes, qlen: int) -> int:
    x = int.from_bytes(data, "big")
    blen = len(data) * 8
    if blen > qlen:
        x >>= blen - qlen
    return x


def _int2octets(x: int, rolen: int) -> bytes:
    return x.to_bytes(rolen, "big")


def _bits2octets(data: bytes, q: int, qlen: int, rolen: int) -> bytes:
    z1 = _bits2int(data, qlen)
    z2 = z1 - q
    if z2 < 0:
        z2 = z1
    return _int2octets(z2, rolen)


def generate_k(
    order: int,
    secexp: int,
    hash_func: Callable,
    data: bytes,
    extra_entropy: bytes = b"",
) -> int:
    """Deterministic k in [1, order) for ECDSA over `order`.

    `data` is the (already hashed) message as big-endian bytes.
    """
    qlen = order.bit_length()
    holen = hash_func().digest_size
    rolen = (qlen + 7) // 8

    seed = _int2octets(secexp, rolen) + _bits2octets(data, order, qlen, rolen) + extra_entropy

    v = b"\x01" * holen
    k = b"\x00" * holen
    k = hmac.new(k, v + b"\x00" + seed, hash_func).digest()
    v = hmac.new(k, v, hash_func).digest()
    k = hmac.new(k, v + b"\x01" + seed, hash_func).digest()
    v = hmac.new(k, v, hash_func).digest()

    while True:
        t = b""
        while len(t) < rolen:
            v = hmac.new(k, v, hash_func).digest()
            t += v
        secret = _bits2int(t, qlen)
        if 1 <= secret < order:
            return secret
        k = hmac.new(k, v + b"\x00", hash_func).digest()
        v = hmac.new(k, v, hash_func).digest()
