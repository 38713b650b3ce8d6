"""Bit-exactness of the host (oracle) crypto layer vs the published vectors."""

import pytest

from stark_perpetual_tpu.crypto import signature as sig
from stark_perpetual_tpu.params import EC_ORDER, FIELD_PRIME

import vectors


def test_pedersen_vectors():
    for a, b, expected in vectors.PEDERSEN_VECTORS:
        assert sig.pedersen_hash(a, b) == expected


def test_fast_pedersen_matches_slow():
    for a, b, expected in vectors.PEDERSEN_VECTORS:
        assert sig.fast_pedersen_hash(a, b) == expected
    # A few structured inputs.
    for a, b in [(0, 0), (1, 0), (0, 1), (FIELD_PRIME - 1, FIELD_PRIME - 1), (12345, 6789)]:
        assert sig.fast_pedersen_hash(a, b) == sig.pedersen_hash(a, b)


def test_pedersen_hash_func_bytes():
    a, b, expected = vectors.PEDERSEN_VECTORS[0]
    out = sig.pedersen_hash_func(a.to_bytes(32, "big"), b.to_bytes(32, "big"))
    assert int.from_bytes(out, "big") == expected


def test_private_to_stark_key_vectors():
    for priv, pub in vectors.PRECOMPUTED_KEYS.items():
        assert sig.private_to_stark_key(priv) == pub


def test_sign_vectors_bit_exact():
    for msg_hash, priv, r_exp, s_exp, _pub in vectors.SIGNATURE_VECTORS:
        r, s = sig.sign(msg_hash, priv)
        assert (r, s) == (r_exp, s_exp)


def test_verify_vectors():
    for msg_hash, priv, r, s, pub in vectors.SIGNATURE_VECTORS:
        if pub is None:
            pub = sig.private_to_stark_key(priv)
        assert sig.verify(msg_hash, r, s, pub)
        # x-only public key path tries both y candidates.
        assert sig.verify(msg_hash, r, s, int(pub))
        # Tampered message must not verify.
        assert not sig.verify(msg_hash ^ 1, r, s, pub)
        # Tampered r must not verify.
        assert not sig.verify(msg_hash, (r ^ 2), s, pub)


def test_verify_rejects_out_of_range():
    msg_hash, _priv, r, s, pub = vectors.SIGNATURE_VECTORS[0]
    with pytest.raises(AssertionError):
        sig.verify(msg_hash, r, EC_ORDER, pub)
    with pytest.raises(AssertionError):
        sig.verify(msg_hash, 2**251, s, pub)
    with pytest.raises(AssertionError):
        sig.verify(2**251, r, s, pub)


def test_sign_verify_roundtrip_random():
    import random

    rng = random.Random(1234)
    for _ in range(5):
        priv = rng.randrange(1, EC_ORDER)
        msg = rng.randrange(0, 2**251)
        r, s = sig.sign(msg, priv)
        assert sig.verify(msg, r, s, sig.private_to_stark_key(priv))


def test_nibble_quirk_path():
    # A message hash with bit_length in [248, 252] and %8 in [1,4] takes the
    # *16 branch of generate_k; check sign/verify still round-trips there.
    msg = (1 << 249) + 5  # bit_length 250 -> 250 % 8 == 2 -> quirk active
    priv = 0x3C1E9550E66958296D11B60F8E8E7A7AD990D07FA65D5F7652C4A6C87D4E3CC
    r, s = sig.sign(msg, priv)
    assert sig.verify(msg, r, s, sig.private_to_stark_key(priv))


def test_grind_key():
    # Vector from the reference JS test suite (key_derivation.spec.js):
    # grinding a known seed with the stark order limit.
    ground = sig.grind_key(
        0x86F3E7293141F20A8BAFF320E8EE4ACCB9D4A4BF2B4D295E8CEE784DB46E0519, EC_ORDER
    )
    assert ground == 0x5C8C8683596C732541A59E03007B2D30DBBBB873556FE65B5FB63C16688F941


def test_get_y_coordinate():
    for priv in list(vectors.PRECOMPUTED_KEYS)[:3]:
        pub = vectors.PRECOMPUTED_KEYS[priv]
        y = sig.get_y_coordinate(pub)
        assert sig.is_point_on_curve(pub, y)
    assert sig.is_valid_stark_key(vectors.PRECOMPUTED_KEYS[0x1])


def test_invalid_stark_key():
    # An x with no curve point must raise / report invalid.
    bad_x = 3  # y^2 = 27+3+beta; check validity result is stable either way
    expected = sig.is_valid_stark_key(bad_x)
    if not expected:
        with pytest.raises(sig.InvalidPublicKeyError):
            sig.get_y_coordinate(bad_x)
