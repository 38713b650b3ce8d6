"""Byte/int encoding helpers (parity: /root/reference/src/starkware/python/utils.py:414-451)."""

from typing import Optional


HASH_BYTES = 32


def to_bytes(value: int, length: Optional[int] = None, byte_order: str = "big") -> bytes:
    """Converts an integer to bytes (default: 32 bytes, big endian)."""
    if length is None:
        length = HASH_BYTES
    return int.to_bytes(value, length=length, byteorder=byte_order)


def from_bytes(value: bytes, byte_order: str = "big") -> int:
    return int.from_bytes(value, byteorder=byte_order)


def to_bytes_no_pad(x: int) -> bytes:
    """Minimal big-endian encoding; 0 encodes as b'\\x00' (JS compatibility)."""
    return x.to_bytes(max(1, (x.bit_length() + 7) // 8), "big")
