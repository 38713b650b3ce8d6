"""Limb field engine vs host bigints (random + structured cases)."""

import random

import numpy as np
import jax.numpy as jnp
import pytest

from stark_perpetual_tpu.ops import field as F
from stark_perpetual_tpu.params import EC_ORDER, FIELD_PRIME


@pytest.fixture(scope="module", params=[FIELD_PRIME, EC_ORDER], ids=["GF(p)", "GF(n)"])
def fld(request):
    return F.get_field(request.param)


def _rand_elems(modulus, n, seed=0):
    rng = random.Random(seed)
    special = [0, 1, 2, modulus - 1, modulus - 2, (1 << 251) - 1, 17 << 192]
    vals = [s % modulus for s in special]
    vals += [rng.randrange(modulus) for _ in range(n - len(vals))]
    return vals


def test_pack_roundtrip(fld):
    vals = _rand_elems(fld.modulus, 32)
    arr = fld.pack(vals)
    back = fld.unpack(arr)
    assert [int(v) for v in back] == vals


def test_add_sub(fld):
    a_vals = _rand_elems(fld.modulus, 64, seed=1)
    b_vals = _rand_elems(fld.modulus, 64, seed=2)
    a, b = fld.pack(a_vals), fld.pack(b_vals)
    got_add = fld.unpack(fld.jit_add(a, b))
    got_sub = fld.unpack(fld.jit_sub(a, b))
    for av, bv, ga, gs in zip(a_vals, b_vals, got_add, got_sub):
        assert int(ga) == (av + bv) % fld.modulus
        assert int(gs) == (av - bv) % fld.modulus


def test_mont_mul(fld):
    a_vals = _rand_elems(fld.modulus, 64, seed=3)
    b_vals = _rand_elems(fld.modulus, 64, seed=4)
    am = fld.jit_to_mont(fld.pack(a_vals))
    bm = fld.jit_to_mont(fld.pack(b_vals))
    got = fld.unpack(fld.jit_from_mont(fld.jit_mul(am, bm)))
    for av, bv, g in zip(a_vals, b_vals, got):
        assert int(g) == av * bv % fld.modulus


def test_mont_domain_roundtrip(fld):
    vals = _rand_elems(fld.modulus, 32, seed=5)
    arr = fld.pack(vals)
    back = fld.unpack(fld.jit_from_mont(fld.jit_to_mont(arr)))
    assert [int(v) for v in back] == vals


def test_pow_and_inv(fld):
    vals = [v for v in _rand_elems(fld.modulus, 16, seed=6) if v != 0]
    am = fld.jit_to_mont(fld.pack(vals))
    got_sq = fld.unpack(fld.jit_from_mont(fld.pow_fixed(am, 2)))
    for v, g in zip(vals, got_sq):
        assert int(g) == v * v % fld.modulus
    got_inv = fld.unpack(fld.jit_from_mont(fld.jit_inv(am)))
    for v, g in zip(vals, got_inv):
        assert int(g) * v % fld.modulus == 1


def test_batch_inv(fld):
    vals = _rand_elems(fld.modulus, 128, seed=7)
    vals = [v if v != 0 else 1 for v in vals]
    am = fld.jit_to_mont(fld.pack(vals))
    got = fld.unpack(fld.jit_from_mont(fld.jit_batch_inv(am, group=32)))
    for v, g in zip(vals, got):
        assert int(g) * v % fld.modulus == 1


def test_batch_inv_with_zeros(fld):
    # Zero lanes produce garbage but must not corrupt neighbors.
    vals = _rand_elems(fld.modulus, 64, seed=8)
    vals[3] = 0
    vals[17] = 0
    am = fld.jit_to_mont(fld.pack(vals))
    got = fld.unpack(fld.jit_from_mont(fld.jit_batch_inv(am, group=16)))
    for i, (v, g) in enumerate(zip(vals, got)):
        if v != 0:
            assert int(g) * v % fld.modulus == 1, f"lane {i}"


def test_predicates(fld):
    a = fld.pack([5, 0, fld.modulus - 1])
    assert list(np.asarray(fld.is_zero(a))) == [False, True, False]
    assert list(np.asarray(fld.eq(a, a))) == [True, True, True]


def test_batch_shapes(fld):
    # 2-D batches broadcast correctly.
    a_vals = _rand_elems(fld.modulus, 12, seed=9)
    a = jnp.asarray(fld.pack(a_vals)).reshape(3, 4, F.N_LIMBS)
    out = fld.jit_add(a, a)
    got = fld.unpack(out).reshape(-1)
    for v, g in zip(a_vals, got):
        assert int(g) == 2 * v % fld.modulus


from stark_perpetual_tpu.utils.testing import random_test


@random_test(seed=7)
def test_field_algebra_property(fld, rng):
    """Randomized algebraic identities: (a*b)*inv(b) == a, a+b-b == a."""
    n = 32
    a_vals = [rng.randrange(fld.modulus) for _ in range(n)]
    b_vals = [rng.randrange(1, fld.modulus) for _ in range(n)]
    a, b = fld.pack(a_vals), fld.pack(b_vals)
    am, bm = fld.to_mont(a), fld.to_mont(b)
    prod = fld.mont_mul(am, bm)
    back = fld.unpack(fld.from_mont(fld.mont_mul(prod, fld.jit_inv(bm))))
    assert [int(v) for v in back] == a_vals
    got = fld.unpack(fld.jit_sub(fld.jit_add(a, b), b))
    assert [int(v) for v in got] == a_vals
