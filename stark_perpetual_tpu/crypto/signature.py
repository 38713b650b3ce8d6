"""Host-side Stark crypto: Pedersen hash, Stark-curve ECDSA, key utilities.

This is the exact scalar layer: it defines the bit-exactness contract that the
TPU batched kernels (`stark_perpetual_tpu.ops`) must reproduce.

Behavioral parity targets (no code copied; semantics re-derived and verified
against the reference's published test vectors):
  - /root/reference/src/starkware/crypto/signature/signature.py:84-318
  - /root/reference/src/starkware/crypto/signature/fast_pedersen_hash.py:17-52

Key semantics intentionally preserved, including the documented deviations
from classic ECDSA:
  - r = x(kG) with NO reduction mod the curve order.
  - r, w, msg_hash constrained to [1, 2^251) / [0, 2^251).
  - verify mirrors the AIR: w*(z*G + r*Q) computed via 251-step double-and-add
    scans starting from +/-SHIFT_POINT with an x-inequality check each step,
    failing (returning False) exactly when the AIR would fail.
  - RFC-6979 nonce with the elliptic.js compatibility quirk: a message hash
    one nibble short of full length is shifted left by 4 bits before seeding.
"""

import hashlib
import itertools
import math
import secrets
from typing import Optional, Tuple, Union

from stark_perpetual_tpu.params import (
    ALPHA,
    BETA,
    CONSTANT_POINTS,
    EC_GEN,
    EC_ORDER,
    FIELD_PRIME,
    MINUS_SHIFT_POINT,
    N_ELEMENT_BITS_ECDSA,
    N_ELEMENT_BITS_HASH,
    PEDERSEN_LOW_PART_BITS,
    SHIFT_POINT,
)
from stark_perpetual_tpu.utils import rfc6979
from stark_perpetual_tpu.utils.encode import to_bytes_no_pad
from stark_perpetual_tpu.utils.math_utils import (
    EcInfinity,
    ECPoint,
    div_mod,
    ec_add,
    ec_double,
    ec_mult,
    ec_safe_add,
    is_quad_residue,
    sqrt_mod,
)

ECSignature = Tuple[int, int]


class InvalidPublicKeyError(Exception):
    def __init__(self):
        super().__init__("Given x coordinate does not represent any point on the elliptic curve.")


def get_y_coordinate(stark_key_x_coordinate: int) -> int:
    """A y with (x, y) on the curve (the other option is -y); raises if x is invalid."""
    x = stark_key_x_coordinate
    y_squared = (x * x * x + ALPHA * x + BETA) % FIELD_PRIME
    if not is_quad_residue(y_squared, FIELD_PRIME):
        raise InvalidPublicKeyError()
    return sqrt_mod(y_squared, FIELD_PRIME)


def get_random_private_key() -> int:
    return secrets.randbelow(EC_ORDER - 1) + 1


def private_key_to_ec_point_on_stark_curve(priv_key: int) -> ECPoint:
    assert 0 < priv_key < EC_ORDER
    return ec_mult(priv_key, EC_GEN, ALPHA, FIELD_PRIME)


def private_to_stark_key(priv_key: int) -> int:
    return private_key_to_ec_point_on_stark_curve(priv_key)[0]


def inv_mod_curve_size(x: int) -> int:
    return div_mod(1, x, EC_ORDER)


def generate_k_rfc6979(msg_hash: int, priv_key: int, seed: Optional[int] = None) -> int:
    # elliptic.js compatibility: a hash exactly one hex nibble short of the
    # full 32-byte length is padded by a left shift of 4 bits.
    if 1 <= msg_hash.bit_length() % 8 <= 4 and msg_hash.bit_length() >= 248:
        msg_hash *= 16

    if seed is None:
        extra_entropy = b""
    else:
        extra_entropy = seed.to_bytes(math.ceil(seed.bit_length() / 8), "big")

    return rfc6979.generate_k(
        EC_ORDER,
        priv_key,
        hashlib.sha256,
        msg_hash.to_bytes(math.ceil(msg_hash.bit_length() / 8), "big"),
        extra_entropy=extra_entropy,
    )


def sign(msg_hash: int, priv_key: int, seed: Optional[int] = None) -> ECSignature:
    assert 0 <= msg_hash < 2**N_ELEMENT_BITS_ECDSA, "Message not signable."

    # Retry loop: a drawn k is rejected (with negligible probability) when r,
    # w, or z + r*priv fall outside the validity windows below; the seed is
    # bumped so the next k differs deterministically.
    while True:
        k = generate_k_rfc6979(msg_hash, priv_key, seed)
        seed = 1 if seed is None else seed + 1

        x = ec_mult(k, EC_GEN, ALPHA, FIELD_PRIME)[0]

        r = int(x)  # Deviation from classic ECDSA: no mod-order reduction.
        if not (1 <= r < 2**N_ELEMENT_BITS_ECDSA):
            continue
        if (msg_hash + r * priv_key) % EC_ORDER == 0:
            continue
        w = div_mod(k, msg_hash + r * priv_key, EC_ORDER)
        if not (1 <= w < 2**N_ELEMENT_BITS_ECDSA):
            continue
        s = inv_mod_curve_size(w)
        return r, s


def mimic_ec_mult_air(m: int, point: ECPoint, shift_point: ECPoint) -> ECPoint:
    """m * point + shift_point via the AIR's 251-step double-and-add.

    Raises AssertionError exactly when the AIR errors: whenever the running
    partial sum shares an x coordinate with the current doubled point.
    """
    assert 0 < m < 2**N_ELEMENT_BITS_ECDSA
    partial_sum = shift_point
    for _ in range(N_ELEMENT_BITS_ECDSA):
        assert partial_sum[0] != point[0]
        if m & 1:
            partial_sum = ec_add(partial_sum, point, FIELD_PRIME)
        point = ec_double(point, ALPHA, FIELD_PRIME)
        m >>= 1
    assert m == 0
    return partial_sum


def is_point_on_curve(x: int, y: int) -> bool:
    return pow(y, 2, FIELD_PRIME) == (pow(x, 3, FIELD_PRIME) + ALPHA * x + BETA) % FIELD_PRIME


def is_valid_stark_private_key(private_key: int) -> bool:
    return 0 < private_key < EC_ORDER


def is_valid_stark_key(stark_key: int) -> bool:
    try:
        get_y_coordinate(stark_key_x_coordinate=stark_key)
    except InvalidPublicKeyError:
        return False
    return True


def verify(msg_hash: int, r: int, s: int, public_key: Union[int, ECPoint]) -> bool:
    assert 1 <= s < EC_ORDER, f"s = {s}"
    w = inv_mod_curve_size(s)
    assert 1 <= r < 2**N_ELEMENT_BITS_ECDSA, f"r = {r}"
    assert 1 <= w < 2**N_ELEMENT_BITS_ECDSA, f"w = {w}"
    assert 0 <= msg_hash < 2**N_ELEMENT_BITS_ECDSA, f"msg_hash = {msg_hash}"

    if isinstance(public_key, int):
        try:
            y = get_y_coordinate(public_key)
        except InvalidPublicKeyError:
            return False
        return verify(msg_hash, r, s, (public_key, y)) or verify(
            msg_hash, r, s, (public_key, (-y) % FIELD_PRIME)
        )

    assert is_point_on_curve(x=public_key[0], y=public_key[1])

    # AIR-faithful evaluation order: w*(z*G + r*Q), each scalar-mul shifted so
    # the zero point never appears; failure here <=> failure in the AIR.
    try:
        zG = mimic_ec_mult_air(msg_hash, EC_GEN, MINUS_SHIFT_POINT)
        rQ = mimic_ec_mult_air(r, public_key, SHIFT_POINT)
        wB = mimic_ec_mult_air(w, ec_add(zG, rQ, FIELD_PRIME), SHIFT_POINT)
        x = ec_add(wB, MINUS_SHIFT_POINT, FIELD_PRIME)[0]
    except AssertionError:
        return False

    return r == x


def grind_key(key_seed: int, key_value_limit: int) -> int:
    """SHA-256 grind of a seed into an unbiased value in [0, key_value_limit).

    Rejection-samples over [0, 2^256) restricted to the largest multiple of
    the limit, with a JS-compatible minimal-byte encoding of seed and index.
    """
    max_allowed_value = 2**256 - (2**256 % key_value_limit)
    for index in itertools.count():
        hash_input = to_bytes_no_pad(key_seed) + to_bytes_no_pad(index)
        key = int(hashlib.sha256(hash_input).hexdigest(), 16)
        if key < max_allowed_value:
            return key % key_value_limit
    raise AssertionError("unreachable")


#################
# Pedersen hash #
#################


def pedersen_hash(*elements: int) -> int:
    return pedersen_hash_as_point(*elements)[0]


def pedersen_hash_as_point(*elements: int) -> ECPoint:
    """AIR-faithful per-bit Pedersen accumulation (errors on x-collision)."""
    point = SHIFT_POINT
    for i, x in enumerate(elements):
        assert 0 <= x < FIELD_PRIME
        point_list = CONSTANT_POINTS[
            2 + i * N_ELEMENT_BITS_HASH : 2 + (i + 1) * N_ELEMENT_BITS_HASH
        ]
        assert len(point_list) == N_ELEMENT_BITS_HASH
        for pt in point_list:
            assert point[0] != pt[0], "Unhashable input."
            if x & 1:
                point = ec_add(point, pt, FIELD_PRIME)
            x >>= 1
        assert x == 0
    return point


def fast_pedersen_hash(x: int, y: int) -> int:
    """Fast host Pedersen, equal in value to the AIR-faithful path; the host
    analog of the reference's C-accelerated path (fast_pedersen_hash.py:34-44).
    Uses the native C library when available, else the per-bit tables.
    """
    from stark_perpetual_tpu.runtime import native

    if native.available():
        result = native.pedersen_hash(x, y)
        if result is not None:
            return result
    acc = EcInfinity
    for i, element in enumerate((x, y)):
        assert 0 <= element < FIELD_PRIME, "Element integer value is out of range"
        table = CONSTANT_POINTS[2 + i * N_ELEMENT_BITS_HASH : 2 + (i + 1) * N_ELEMENT_BITS_HASH]
        bit = 0
        while element:
            if element & 1:
                acc = ec_safe_add(acc, table[bit], ALPHA, FIELD_PRIME)
            element >>= 1
            bit += 1
    result = ec_safe_add(acc, SHIFT_POINT, ALPHA, FIELD_PRIME)
    assert result is not EcInfinity
    return result[0]


def pedersen_hash_func(x: bytes, y: bytes) -> bytes:
    """32-byte in / 32-byte out Pedersen (hash_state building block)."""
    assert len(x) == len(y) == 32, "Unexpected element length."
    from stark_perpetual_tpu.utils.encode import from_bytes, to_bytes

    return to_bytes(fast_pedersen_hash(from_bytes(x), from_bytes(y)))


# Re-exported constant for callers that need the fast-path split.
LOW_PART_BITS = PEDERSEN_LOW_PART_BITS
LOW_PART_MASK = 2**PEDERSEN_LOW_PART_BITS - 1
