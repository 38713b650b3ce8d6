"""HD key derivation: mnemonic/path -> ground Stark key.

Parity: /root/reference/src/starkware/crypto/signature/src/js/key_derivation.js:54-162.
Implements from the public specs (BIP-39 seed, BIP-32 over secp256k1,
SLIP-style path m/2645'/layer'/application'/eth1'/eth2'/index) with the
StarkEx sha256 key grinding; no external wallet libraries.
"""

import hashlib
import hmac
from typing import Tuple

from stark_perpetual_tpu.params import EC_ORDER

# --- minimal secp256k1 (for BIP-32 public-key serialization) ---------------

_SECP_P = 2**256 - 2**32 - 977
_SECP_N = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEBAAEDCE6AF48A03BBFD25E8CD0364141
_SECP_G = (
    0x79BE667EF9DCBBAC55A06295CE870B07029BFCDB2DCE28D959F2815B16F81798,
    0x483ADA7726A3C4655DA4FBFC0E1108A8FD17B448A68554199C47D08FFB10D4B8,
)


def _secp_add(p1, p2):
    if p1 is None:
        return p2
    if p2 is None:
        return p1
    x1, y1 = p1
    x2, y2 = p2
    if x1 == x2:
        if (y1 + y2) % _SECP_P == 0:
            return None
        m = (3 * x1 * x1) * pow(2 * y1, -1, _SECP_P) % _SECP_P
    else:
        m = (y2 - y1) * pow(x2 - x1, -1, _SECP_P) % _SECP_P
    x3 = (m * m - x1 - x2) % _SECP_P
    y3 = (m * (x1 - x3) - y1) % _SECP_P
    return x3, y3


def _secp_mult(k: int, point=_SECP_G):
    result = None
    base = point
    while k:
        if k & 1:
            result = _secp_add(result, base)
        base = _secp_add(base, base)
        k >>= 1
    return result


def _serP(point: Tuple[int, int]) -> bytes:
    x, y = point
    return bytes([2 + (y & 1)]) + x.to_bytes(32, "big")


# --- BIP-39 / BIP-32 -------------------------------------------------------


def mnemonic_to_seed(mnemonic: str, passphrase: str = "") -> bytes:
    import unicodedata

    m = unicodedata.normalize("NFKD", mnemonic).encode()
    salt = unicodedata.normalize("NFKD", "mnemonic" + passphrase).encode()
    return hashlib.pbkdf2_hmac("sha512", m, salt, 2048, dklen=64)


def _master_key(seed: bytes) -> Tuple[int, bytes]:
    digest = hmac.new(b"Bitcoin seed", seed, hashlib.sha512).digest()
    return int.from_bytes(digest[:32], "big"), digest[32:]


def _ckd_priv(k: int, chain: bytes, index: int) -> Tuple[int, bytes]:
    if index >= 1 << 31:  # hardened
        data = b"\x00" + k.to_bytes(32, "big") + index.to_bytes(4, "big")
    else:
        data = _serP(_secp_mult(k)) + index.to_bytes(4, "big")
    digest = hmac.new(chain, data, hashlib.sha512).digest()
    child = (int.from_bytes(digest[:32], "big") + k) % _SECP_N
    return child, digest[32:]


def derive_private_key_from_path(seed: bytes, path: str) -> int:
    parts = path.split("/")
    assert parts[0] == "m"
    k, chain = _master_key(seed)
    for part in parts[1:]:
        if part.endswith("'"):
            index = int(part[:-1]) + (1 << 31)
        else:
            index = int(part)
        k, chain = _ckd_priv(k, chain, index)
    return k


# --- StarkEx grinding & paths ---------------------------------------------


def grind_key_from_bytes(seed_bytes: bytes, limit: int = EC_ORDER) -> int:
    """JS-compatible grinding: the seed keeps its full byte width (leading
    zeros preserved), the index is appended as a minimal-width byte.
    """
    max_allowed = 2**256 - (2**256 % limit)
    index = 0
    while True:
        idx_bytes = index.to_bytes(max(1, (index.bit_length() + 7) // 8), "big")
        key = int.from_bytes(hashlib.sha256(seed_bytes + idx_bytes).digest(), "big")
        if key < max_allowed:
            return key % limit
        index += 1


def get_account_path(layer: str, application: str, eth_address: str, index: int) -> str:
    """m/2645'/layer'/application'/eth1'/eth2'/index (31-bit hash slices)."""

    def low_bits(value: int, start: int, width: int) -> int:
        return (value >> start) & ((1 << width) - 1)

    layer_int = low_bits(int.from_bytes(hashlib.sha256(layer.encode()).digest(), "big"), 0, 31)
    app_int = low_bits(
        int.from_bytes(hashlib.sha256(application.encode()).digest(), "big"), 0, 31
    )
    addr = int(eth_address, 16)
    eth1 = low_bits(addr, 0, 31)
    eth2 = low_bits(addr, 31, 31)
    return f"m/2645'/{layer_int}'/{app_int}'/{eth1}'/{eth2}'/{index}"


def get_key_pair_from_path(mnemonic: str, path: str) -> int:
    """Mnemonic + path -> ground Stark private key (int)."""
    seed = mnemonic_to_seed(mnemonic)
    key_seed = derive_private_key_from_path(seed, path)
    return grind_key_from_bytes(key_seed.to_bytes(32, "big"))


def get_private_key_from_eth_signature(eth_signature: str) -> int:
    """Eth signature (130 hex chars) -> ground Stark private key (uses r)."""
    sig = eth_signature.removeprefix("0x")
    assert len(sig) == 130 and all(c in "0123456789abcdefABCDEF" for c in sig)
    r = bytes.fromhex(sig[:64])
    return grind_key_from_bytes(r)
