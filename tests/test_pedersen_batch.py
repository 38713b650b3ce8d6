"""Batched TPU-path Pedersen / key derivation vs host oracle and golden vectors."""

import random

import numpy as np

import vectors
from stark_perpetual_tpu.crypto import signature as hostsig
from stark_perpetual_tpu.ops import pedersen as P
from stark_perpetual_tpu.params import EC_ORDER, FIELD_PRIME


def test_pedersen_golden_vectors():
    pairs = [(a, b) for a, b, _ in vectors.PEDERSEN_VECTORS]
    out = P.pedersen_hash_ints(pairs)
    assert out == [e for _, _, e in vectors.PEDERSEN_VECTORS]


def test_pedersen_random_vs_host():
    rng = random.Random(42)
    pairs = [(rng.randrange(FIELD_PRIME), rng.randrange(FIELD_PRIME)) for _ in range(14)]
    pairs += [(0, 0), (1, 0), (0, 1), (FIELD_PRIME - 1, FIELD_PRIME - 1)]
    out = P.pedersen_hash_ints(pairs)
    for (a, b), got in zip(pairs, out):
        assert got == hostsig.pedersen_hash(a, b)


def test_stark_key_golden_vectors():
    privs = list(vectors.PRECOMPUTED_KEYS)
    out = P.private_to_stark_key_ints(privs)
    assert out == [vectors.PRECOMPUTED_KEYS[p] for p in privs]


def test_stark_key_y_matches_host():
    privs = [5, 7, 1 + (EC_ORDER >> 1)]
    from stark_perpetual_tpu.ops.field import pack_ints, stark_prime_field
    from stark_perpetual_tpu.utils.math_utils import ec_mult
    from stark_perpetual_tpu.params import ALPHA, EC_GEN

    f = stark_prime_field()
    arr = P._pad_batch(pack_ints(privs))
    arr[len(privs):, 0] = 1
    x, y, ok = P.stark_key_batch()(arr)
    assert bool(np.all(np.asarray(ok)))
    xs = [int(v) for v in f.unpack(x)[: len(privs)]]
    ys = [int(v) for v in f.unpack(y)[: len(privs)]]
    for priv, gx, gy in zip(privs, xs, ys):
        ex, ey = ec_mult(priv, EC_GEN, ALPHA, FIELD_PRIME)
        assert (gx, gy) == (ex, ey)


def test_byte_windows_roundtrip():
    from stark_perpetual_tpu.ops.field import stark_prime_field

    f = stark_prime_field()
    vals = [0, 1, FIELD_PRIME - 1, 0x123456789ABCDEF0FEDCBA9876543210, 1 << 251]
    digits = np.asarray(P.byte_windows(f.pack(vals)))
    for v, d in zip(vals, digits):
        rec = sum(int(dj) << (8 * j) for j, dj in enumerate(d))
        assert rec == v
