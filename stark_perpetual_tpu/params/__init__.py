"""Stark curve parameters, loaded from the generated artifact.

`stark_params.npz` is produced by `tools/gen_params.py` from the public
nothing-up-my-sleeve derivation (digits of pi); anchors are verified at
generation time and re-verified cheaply here.
"""

import os
from typing import List, Tuple

import numpy as np

_NPZ_PATH = os.path.join(os.path.dirname(__file__), "stark_params.npz")


def _u64x4_to_int(a: np.ndarray) -> int:
    return sum(int(a[k]) << (64 * k) for k in range(4))


_data = np.load(_NPZ_PATH)

FIELD_PRIME: int = _u64x4_to_int(_data["field_prime_u64"])
EC_ORDER: int = _u64x4_to_int(_data["ec_order_u64"])
BETA: int = _u64x4_to_int(_data["beta_u64"])
ALPHA: int = int(_data["alpha"])
FIELD_GEN: int = int(_data["field_gen"])

_pts = _data["constant_points_u64"]
CONSTANT_POINTS: List[Tuple[int, int]] = [
    (_u64x4_to_int(_pts[i, 0]), _u64x4_to_int(_pts[i, 1])) for i in range(_pts.shape[0])
]

N_ELEMENT_BITS_ECDSA = 251
N_ELEMENT_BITS_HASH = 252

SHIFT_POINT = CONSTANT_POINTS[0]
MINUS_SHIFT_POINT = (SHIFT_POINT[0], FIELD_PRIME - SHIFT_POINT[1])
EC_GEN = CONSTANT_POINTS[1]

# Pedersen fast-path bases: per input element the low 248 bits use the first
# point of its table and the high 4 bits the 249th (each table entry k is
# 2^k times its window base point).
PEDERSEN_LOW_PART_BITS = 248
PEDERSEN_HASH_POINTS = (
    CONSTANT_POINTS[2],  # P0: element 0, low 248 bits
    CONSTANT_POINTS[2 + PEDERSEN_LOW_PART_BITS],  # P1: element 0, high 4 bits
    CONSTANT_POINTS[2 + N_ELEMENT_BITS_HASH],  # P2: element 1, low 248 bits
    CONSTANT_POINTS[2 + N_ELEMENT_BITS_HASH + PEDERSEN_LOW_PART_BITS],  # P3
)

assert FIELD_PRIME == 2**251 + 17 * 2**192 + 1
assert len(CONSTANT_POINTS) == 2 + 2 * N_ELEMENT_BITS_HASH
assert SHIFT_POINT == (
    0x49EE3EBA8C1600700EE1B87EB599F16716B0B1022947733551FDE4050CA6804,
    0x3CA0CFE4B3BC6DDF346D49D06EA0ED34E621062C0E056C1D0405D266E10268A,
)
assert EC_GEN == (
    0x1EF15C18599971B7BECED415A40F0C7DEACFD9B0D1819E03D723D8BC943CFCA,
    0x5668060AA49730B7BE4801DF46EC62DE53ECD11ABE43A32873000C36E8DC1F,
)
