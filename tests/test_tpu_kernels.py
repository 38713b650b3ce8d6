"""Real-device Pallas kernel tests. Run with:

    STARK_TPU_TESTS=1 python -m pytest tests/test_tpu_kernels.py -q

Skipped in the default CPU suite (Pallas TPU kernels don't lower on CPU).
"""

import os
import random

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("STARK_TPU_TESTS") != "1",
    reason="TPU kernel tests need STARK_TPU_TESTS=1 and a real device",
)


def test_pallas_pedersen_bit_exact():
    from stark_perpetual_tpu.crypto import signature as hostsig
    from stark_perpetual_tpu.ops.pedersen import pedersen_hash_batch, _pad_batch
    from stark_perpetual_tpu.ops.field import stark_prime_field
    import numpy as np

    f = stark_prime_field()
    rng = random.Random(31)
    pairs = [(rng.randrange(f.modulus), rng.randrange(f.modulus)) for _ in range(64)]
    a = _pad_batch(f.pack([a for a, _ in pairs]))
    b = _pad_batch(f.pack([b for _, b in pairs]))
    h, ok = pedersen_hash_batch()(a, b)
    assert bool(np.asarray(ok).all())
    got = [int(v) for v in f.unpack(h)[: len(pairs)]]
    assert got == [hostsig.pedersen_hash(x, y) for x, y in pairs]


def test_pallas_ecdsa_verify_matches_host():
    from stark_perpetual_tpu.crypto import signature as hostsig
    from stark_perpetual_tpu.ops.ecdsa_pallas import verify_batch_pallas

    rng = random.Random(32)
    items, expected = [], []
    for _ in range(4):
        priv = rng.randrange(1, hostsig.EC_ORDER)
        msg = rng.randrange(0, 2**251)
        r, s = hostsig.sign(msg, priv)
        pub = hostsig.private_to_stark_key(priv)
        y = hostsig.get_y_coordinate(pub)
        for cand in (y, (-y) % hostsig.FIELD_PRIME):
            items.append((msg, r, s, (pub, cand)))
            expected.append(hostsig.verify(msg, r, s, (pub, cand)))
        items.append((msg ^ 1, r, s, (pub, y)))
        expected.append(hostsig.verify(msg ^ 1, r, s, (pub, y)))
    assert verify_batch_pallas(items) == expected
