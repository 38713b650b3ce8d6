"""Generate the Stark curve + Pedersen constant points from first principles.

The StarkEx parameters are "nothing up my sleeve" numbers derived from the
decimal digits of pi (public derivation documented at
/root/reference/src/starkware/crypto/signature/nothing_up_my_sleeve_gen.py:50-104
and https://docs.starkware.co/starkex/crypto/pedersen-hash-function.html).
This script re-derives them independently with mpmath/our own Tonelli-Shanks,
verifies the well-known anchor constants (SHIFT_POINT, EC_GEN, BETA), and
writes a binary artifact `stark_perpetual_tpu/params/stark_params.npz`.

Derivation (as published):
  - FIELD_PRIME p = 2^251 + 17*2^192 + 1, ALPHA = 1.
  - beta = int(first 76 decimal digits of pi) + 379.
  - For i = 1, 2, ...: x = int(digits[i*76:(i+1)*76]); bump x by 1 until
    x^3 + x + beta is a quadratic residue mod p; y = min square root.
    Points 1 and 2 are stored directly (shift point, ECDSA generator); each
    subsequent seed point contributes itself plus 247 (odd i) or 3 (even i)
    successive doublings, forming the per-bit Pedersen tables
    (248-bit low part + 4-bit high part per input element, 2 inputs).
"""

import json
import os
import sys

import mpmath
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from stark_perpetual_tpu.utils.math_utils import (  # noqa: E402
    ec_double,
    is_quad_residue,
    sqrt_mod,
)

FIELD_PRIME = 2**251 + 17 * 2**192 + 1
FIELD_GEN = 3
ALPHA = 1
EC_ORDER = 0x800000000000010FFFFFFFFFFFFFFFFB781126DCAE7B2321E66A241ADC64D2F

# Public anchor constants (also asserted by the reference implementation at
# signature.py:61-68 and nothing_up_my_sleeve_gen.py:104).
EXPECTED_BETA = 0x6F21413EFBE40DE150E596D72F7A8C5609AD26C15C915C1F4CDFCB99CEE9E89
EXPECTED_SHIFT_POINT = (
    0x49EE3EBA8C1600700EE1B87EB599F16716B0B1022947733551FDE4050CA6804,
    0x3CA0CFE4B3BC6DDF346D49D06EA0ED34E621062C0E056C1D0405D266E10268A,
)
EXPECTED_EC_GEN = (
    0x1EF15C18599971B7BECED415A40F0C7DEACFD9B0D1819E03D723D8BC943CFCA,
    0x5668060AA49730B7BE4801DF46EC62DE53ECD11ABE43A32873000C36E8DC1F,
)

N_ELEMENT_BITS = 252
N_POINTS = 2 + 2 * N_ELEMENT_BITS  # shift point + ecdsa generator + hash tables


def pi_decimal_digits(n_digits: int) -> str:
    mpmath.mp.dps = n_digits
    return "3" + str(mpmath.mp.pi)[2:]


def generate() -> tuple:
    pi_str = pi_decimal_digits(76 * (1 + N_POINTS) + 100)
    beta = int(pi_str[:76]) + 379
    assert beta == EXPECTED_BETA, "beta derivation mismatch"

    points = []
    i = 0
    while len(points) < N_POINTS:
        i += 1
        x = int(pi_str[i * 76 : (i + 1) * 76])
        while True:
            y_squared = x**3 + ALPHA * x + beta
            if is_quad_residue(y_squared, FIELD_PRIME):
                y = sqrt_mod(y_squared, FIELD_PRIME)
                break
            x += 1
        pt = (x % FIELD_PRIME, y % FIELD_PRIME)
        if i <= 2:
            points.append(pt)
            continue
        # Seed point plus successive doublings: 248 entries for odd seeds
        # (low-248-bit table halves), 4 entries for even seeds (high nibble).
        for _ in range(248 if i % 2 == 1 else 4):
            points.append(pt)
            pt = ec_double(pt, ALPHA, FIELD_PRIME)
    return beta, points


def int_to_u64x4(v: int) -> np.ndarray:
    return np.array([(v >> (64 * k)) & 0xFFFFFFFFFFFFFFFF for k in range(4)], dtype=np.uint64)


def main() -> None:
    beta, points = generate()
    assert points[0] == EXPECTED_SHIFT_POINT, "shift point mismatch"
    assert points[1] == EXPECTED_EC_GEN, "ecdsa generator mismatch"
    for x, y in points:
        assert (y * y - (x * x * x + ALPHA * x + beta)) % FIELD_PRIME == 0

    arr = np.zeros((N_POINTS, 2, 4), dtype=np.uint64)
    for idx, (x, y) in enumerate(points):
        arr[idx, 0] = int_to_u64x4(x)
        arr[idx, 1] = int_to_u64x4(y)

    out_dir = os.path.join(os.path.dirname(__file__), "..", "stark_perpetual_tpu", "params")
    os.makedirs(out_dir, exist_ok=True)
    np.savez_compressed(
        os.path.join(out_dir, "stark_params.npz"),
        constant_points_u64=arr,
        field_prime_u64=int_to_u64x4(FIELD_PRIME),
        ec_order_u64=int_to_u64x4(EC_ORDER),
        beta_u64=int_to_u64x4(beta),
        alpha=np.uint64(ALPHA),
        field_gen=np.uint64(FIELD_GEN),
    )
    meta = {
        "n_points": N_POINTS,
        "field_prime": hex(FIELD_PRIME),
        "ec_order": hex(EC_ORDER),
        "alpha": ALPHA,
        "beta": hex(beta),
        "field_gen": FIELD_GEN,
    }
    with open(os.path.join(out_dir, "stark_params_meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    print(f"wrote {N_POINTS} constant points; all anchors verified")


if __name__ == "__main__":
    main()
