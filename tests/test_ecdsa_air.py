"""ECDSA-builtin AIR: ladder witness consistency + STARK-backed verify.

Mirrors the reference's AIR-faithful chain (signature.py:229-246): three
mimic ladders per signature, glued at bound boundary values.
"""

import pytest

from stark_perpetual_tpu.crypto.signature import (
    pedersen_hash,
    private_key_to_ec_point_on_stark_curve,
    sign,
)
from stark_perpetual_tpu.models.ecdsa_air import (
    EcdsaVerifyStark,
    EcMultAir,
    MultBlock,
    _blocks_for,
)
from stark_perpetual_tpu.params import EC_GEN, FIELD_PRIME, SHIFT_POINT
from stark_perpetual_tpu.utils.math_utils import ec_add, ec_mult

pytestmark = pytest.mark.usefixtures("no_compile_cache")


def _item(priv=0x1234, a=11, b=22):
    msg = pedersen_hash(a, b)
    r, s = sign(msg, priv)
    return (msg, r, s, private_key_to_ec_point_on_stark_curve(priv))


def test_ladder_witness_satisfies_constraints_everywhere():
    k = 0xDEADBEEFCAFE
    out = ec_add(ec_mult(k, EC_GEN, 1, FIELD_PRIME), SHIFT_POINT, FIELD_PRIME)
    air = EcMultAir([MultBlock(k, SHIFT_POINT, EC_GEN, out)])
    cols = air.trace()
    pubs = air.public_columns()
    for i in range(air.n - 1):
        vals = air.transition_exprs_host(
            [c[i] for c in cols], [c[i + 1] for c in cols], [p[i] for p in pubs]
        )
        assert all(v == 0 for v in vals), f"row {i}: {vals}"
    for col, row, value in air.boundary():
        assert cols[col][row] == value % FIELD_PRIME


def test_wrong_output_claim_breaks_witness():
    k = 7
    good = ec_add(ec_mult(k, EC_GEN, 1, FIELD_PRIME), SHIFT_POINT, FIELD_PRIME)
    bad = ((good[0] + 1) % FIELD_PRIME, good[1])
    air = EcMultAir([MultBlock(k, SHIFT_POINT, EC_GEN, bad)])
    with pytest.raises(AssertionError):
        air.trace()


@pytest.fixture(scope="module")
def proven():
    items = [_item()]
    stark = EcdsaVerifyStark(blowup=8, n_queries=8)
    proof = stark.prove(items)
    return items, stark, proof


def test_ecdsa_stark_roundtrip(proven):
    items, stark, proof = proven
    assert stark.verify(items, proof)
    # Tampered message must fail the host glue or the bound boundary.
    bad_items = [(items[0][0] ^ 1, items[0][1], items[0][2], items[0][3])]
    assert not stark.verify(bad_items, proof)


def test_ecdsa_stark_rejects_forged_intermediates(proven):
    items, stark, proof = proven
    import copy

    proof = copy.deepcopy(proof)
    zg, rq, wb = proof.intermediates[0]
    # An attacker shifting a claimed ladder output must be caught by the
    # boundary constraints even if the final host check is arranged to pass.
    forged = ec_add(zg, EC_GEN, FIELD_PRIME)
    proof.intermediates[0] = (forged, rq, wb)
    assert not stark.verify(items, proof)


def test_blocks_padding_to_power_of_two():
    items = [_item()]
    blocks = _blocks_for(items, [(EC_GEN, SHIFT_POINT, EC_GEN)])
    assert len(blocks) == 4  # 3 real ladders + 1 dummy
