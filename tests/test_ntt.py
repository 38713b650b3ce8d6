"""NTT/LDE kernels vs host DFT oracle."""

import random

import numpy as np

from stark_perpetual_tpu.ops import ntt as NTT
from stark_perpetual_tpu.ops.field import stark_prime_field
from stark_perpetual_tpu.params import FIELD_GEN, FIELD_PRIME


def test_root_of_unity():
    for order in (2, 4, 1024, 1 << 20):
        w = NTT.root_of_unity(order)
        assert pow(w, order, FIELD_PRIME) == 1
        assert pow(w, order // 2, FIELD_PRIME) == FIELD_PRIME - 1  # primitive


def test_ntt_matches_dft():
    f = stark_prime_field()
    rng = random.Random(5)
    n = 16
    vals = [rng.randrange(FIELD_PRIME) for _ in range(n)]
    got = f.unpack(NTT.ntt_ops().ntt(f.pack(vals)))
    expected = NTT.dft_host(vals)
    assert [int(v) for v in got] == expected


def test_intt_roundtrip():
    f = stark_prime_field()
    rng = random.Random(6)
    n = 256
    vals = [rng.randrange(FIELD_PRIME) for _ in range(n)]
    ops = NTT.ntt_ops()
    fwd = ops.ntt(f.pack(vals))
    back = f.unpack(ops.ntt(fwd, inverse=True))
    assert [int(v) for v in back] == vals


def test_ntt_convolution_property():
    # NTT(a) * NTT(b) == NTT(circular_conv(a, b)) pointwise.
    f = stark_prime_field()
    rng = random.Random(7)
    n = 8
    a = [rng.randrange(FIELD_PRIME) for _ in range(n)]
    b = [rng.randrange(FIELD_PRIME) for _ in range(n)]
    conv = [0] * n
    for i in range(n):
        for j in range(n):
            conv[(i + j) % n] = (conv[(i + j) % n] + a[i] * b[j]) % FIELD_PRIME
    ops = NTT.ntt_ops()
    fa = [int(v) for v in f.unpack(ops.ntt(f.pack(a)))]
    fb = [int(v) for v in f.unpack(ops.ntt(f.pack(b)))]
    fc = [int(v) for v in f.unpack(ops.ntt(f.pack(conv)))]
    assert fc == [x * y % FIELD_PRIME for x, y in zip(fa, fb)]


def test_lde_evaluates_on_coset():
    f = stark_prime_field()
    rng = random.Random(8)
    n, blowup = 8, 4
    coeffs = [rng.randrange(FIELD_PRIME) for _ in range(n)]
    evals = f.unpack(NTT.ntt_ops().lde(f.pack(coeffs), blowup, shift=FIELD_GEN))
    w = NTT.root_of_unity(n * blowup)
    for k in [0, 1, 5, 31]:
        x = FIELD_GEN * pow(w, k, FIELD_PRIME) % FIELD_PRIME
        expected = 0
        for i, c in enumerate(reversed(coeffs)):
            expected = (expected * x + c) % FIELD_PRIME
        assert int(evals[k]) == expected
