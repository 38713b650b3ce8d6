"""Batched ECDSA verify/sign vs golden vectors and the host oracle."""

import numpy as np
import pytest

import vectors
from stark_perpetual_tpu.crypto import signature as hostsig
from stark_perpetual_tpu.ops import ecdsa as E
from stark_perpetual_tpu.params import EC_ORDER


def _resolved_vectors():
    out = []
    for msg, priv, r, s, pub in vectors.SIGNATURE_VECTORS:
        if pub is None:
            pub = hostsig.private_to_stark_key(priv)
        out.append((msg, priv, r, s, pub))
    return out


def test_verify_golden_and_negatives():
    vecs = _resolved_vectors()
    items = []
    expected = []
    for msg, _priv, r, s, pub in vecs:
        items.append((msg, r, s, pub))  # x-only: tries both y candidates
        expected.append(True)
        items.append((msg ^ 1, r, s, pub))
        expected.append(False)
        items.append((msg, r ^ 2, s, pub))
        expected.append(False)
    got = E.verify_ints(items)
    assert got == expected


def test_verify_full_point():
    msg, _priv, r, s, pub = _resolved_vectors()[0]
    y = hostsig.get_y_coordinate(pub)
    full = [(msg, r, s, (pub, y)), (msg, r, s, (pub, (-y) % hostsig.FIELD_PRIME))]
    got = E.verify_ints(full)
    assert got.count(True) == 1  # exactly one y candidate verifies


def test_verify_input_assertions():
    msg, _priv, r, s, pub = _resolved_vectors()[0]
    with pytest.raises(AssertionError):
        E.verify_ints([(msg, r, EC_ORDER, pub)])
    with pytest.raises(AssertionError):
        E.verify_ints([(msg, 2**251, s, pub)])


def test_sign_matches_host_bit_exact():
    vecs = _resolved_vectors()
    items = [(msg, priv) for msg, priv, _r, _s, _pub in vecs]
    got = E.sign_ints(items)
    for (msg, priv, r, s, _pub), (gr, gs) in zip(vecs, got):
        assert (gr, gs) == (r, s)


def test_sign_verify_roundtrip_device():
    import random

    rng = random.Random(99)
    items = [(rng.randrange(0, 2**251), rng.randrange(1, EC_ORDER)) for _ in range(4)]
    sigs = E.sign_ints(items)
    ver = E.verify_ints(
        [(msg, r, s, hostsig.private_to_stark_key(priv)) for (msg, priv), (r, s) in zip(items, sigs)]
    )
    assert all(ver)
    # Host oracle agrees lane by lane.
    for (msg, priv), (r, s) in zip(items, sigs):
        assert hostsig.sign(msg, priv) == (r, s)
