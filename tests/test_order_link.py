"""OrderLinkAir: limit-order execution fairness/range/delta proofs.

A handcrafted two-execution schedule (one buy, one sell fill of the same
signed order plus a second order) proves end to end; tampered public
claims tables and unfair/cheating witnesses must fail.
"""

import pytest

from stark_perpetual_tpu.models.perpetual.order_link_air import (
    OrderExecRecord,
    OrderLinkAir,
    order_link_public_surface,
)

pytestmark = pytest.mark.usefixtures("no_compile_cache")

MSG_A = (0x1234 << 187) + 0xDEADBEEF  # oid 0x1234
MSG_B = (0xBEEF << 187) + (1 << 186) + 77  # oid 0xBEEF
FEE_PID = 99

RECORDS = [
    # Buy 10 synthetic for <= 500 collateral, fee limit 50: filled 10 at 450,
    # fee 5. Fee fairness: 5*500 <= 50*450; assets: (450-1)*10 < 500*10.
    OrderExecRecord(
        message_hash=MSG_A, order_id=0x1234, amount_synthetic=10,
        amount_collateral=500, amount_fee=50, is_buying=1,
        actual_synthetic=10, actual_collateral=450, actual_fee=5,
        position_id=1, asset_id_synthetic=0x4254432D37, fee_position_id=FEE_PID,
    ),
    # Sell 10 synthetic for >= 400 collateral, fee limit 40: receives 450,
    # fee 4. Assets: 10*400 < 10*(450+1).
    OrderExecRecord(
        message_hash=MSG_B, order_id=0xBEEF, amount_synthetic=10,
        amount_collateral=400, amount_fee=40, is_buying=0,
        actual_synthetic=10, actual_collateral=450, actual_fee=4,
        position_id=2, asset_id_synthetic=0x4254432D37, fee_position_id=FEE_PID,
    ),
]


@pytest.fixture(scope="module")
def surface():
    return order_link_public_surface(RECORDS)


@pytest.fixture(scope="module")
def prover(surface):
    from stark_perpetual_tpu.models.air import StarkProver

    fc, upd = surface
    air = OrderLinkAir(fc, upd, FEE_PID, len(RECORDS))
    return StarkProver(air, blowup=4, n_queries=4)


@pytest.fixture(scope="module")
def proven(prover):
    return prover.air, prover.prove(prover.air.trace(RECORDS))


def test_public_surface(surface):
    fc, upd = surface
    assert (MSG_A, 0x1234, 10, 1) in fc and (MSG_B, 0xBEEF, 10, 1) in fc
    # Produced updates: fee +5 and +4, buyer col -455, seller col +446,
    # buyer syn +10, seller syn -10.
    from stark_perpetual_tpu.params import FIELD_PRIME

    keys = {(pid, tag, aid, kc, op) for pid, tag, aid, kc, op, _mu in upd}
    assert (FEE_PID, 0, 0, 0, 5) in keys and (FEE_PID, 0, 0, 0, 4) in keys
    assert (1, 0, 0, 0, (-455) % FIELD_PRIME) in keys
    assert (2, 0, 0, 0, 446) in keys
    assert (1, 1, 0x4254432D37, 0, 10) in keys
    assert (2, 1, 0x4254432D37, 0, (-10) % FIELD_PRIME) in keys


def test_roundtrip(proven):
    from stark_perpetual_tpu.models.air import verify_stark

    air, proof = proven
    assert verify_stark(air, proof)


def test_tampered_claims_rejected(proven, surface):
    from stark_perpetual_tpu.models.air import verify_stark

    _air, proof = proven
    fc, upd = surface
    # Wrong full amount in a consumed claim.
    bad_fc = [(m, o, f + 1, mu) for m, o, f, mu in fc[:1]] + list(fc[1:])
    assert not verify_stark(OrderLinkAir(bad_fc, upd, FEE_PID, 2), proof)
    # Wrong delta in a produced update.
    bad_upd = [(p, t, a, k, op + 1, mu) for p, t, a, k, op, mu in upd[:1]] + list(upd[1:])
    assert not verify_stark(OrderLinkAir(fc, bad_upd, FEE_PID, 2), proof)
    # Wrong fee position id.
    assert not verify_stark(OrderLinkAir(fc, upd, FEE_PID + 1, 2), proof)
    # Dropped multiplicity.
    bad_fc = [(m, o, f, 0) for m, o, f, mu in fc[:1]] + list(fc[1:])
    assert not verify_stark(OrderLinkAir(bad_fc, upd, FEE_PID, 2), proof)


def test_unfair_records_unbuildable():
    # Fee over limit: 50*500 < 51*450 fails the ratio.
    bad = OrderExecRecord(
        message_hash=MSG_A, order_id=0x1234, amount_synthetic=10,
        amount_collateral=500, amount_fee=50, is_buying=1,
        actual_synthetic=10, actual_collateral=450, actual_fee=51,
        position_id=1, asset_id_synthetic=7, fee_position_id=FEE_PID,
    )
    fc, upd = order_link_public_surface([bad])
    air = OrderLinkAir(fc, upd, FEE_PID, 1)
    with pytest.raises(ValueError, match="fee fairness"):
        air.trace([bad])
    # Buy side paying more than the limit price: (501-1)*10 < 500*10 fails.
    bad2 = OrderExecRecord(
        message_hash=MSG_A, order_id=0x1234, amount_synthetic=10,
        amount_collateral=500, amount_fee=50, is_buying=1,
        actual_synthetic=10, actual_collateral=501, actual_fee=0,
        position_id=1, asset_id_synthetic=7, fee_position_id=FEE_PID,
    )
    fc, upd = order_link_public_surface([bad2])
    with pytest.raises(ValueError, match="assets-ratio"):
        OrderLinkAir(fc, upd, FEE_PID, 1).trace([bad2])
    # Wrong order id for the message hash.
    bad3 = OrderExecRecord(
        message_hash=MSG_A, order_id=0x1235, amount_synthetic=10,
        amount_collateral=500, amount_fee=50, is_buying=1,
        actual_synthetic=10, actual_collateral=450, actual_fee=5,
        position_id=1, asset_id_synthetic=7, fee_position_id=FEE_PID,
    )
    fc, upd = order_link_public_surface([bad3])
    with pytest.raises(ValueError, match="order id"):
        OrderLinkAir(fc, upd, FEE_PID, 1).trace([bad3])
    # Trader position == fee position.
    bad4 = OrderExecRecord(
        message_hash=MSG_A, order_id=0x1234, amount_synthetic=10,
        amount_collateral=500, amount_fee=50, is_buying=1,
        actual_synthetic=10, actual_collateral=450, actual_fee=5,
        position_id=FEE_PID, asset_id_synthetic=7, fee_position_id=FEE_PID,
    )
    fc, upd = order_link_public_surface([bad4])
    with pytest.raises(ValueError, match="fee position"):
        OrderLinkAir(fc, upd, FEE_PID, 1).trace([bad4])


def test_buy_zero_collateral_fill_allowed():
    """The reference's actual_collateral == 0 buy-side early return
    (validate_limit_order.cairo:49-55): a zero-collateral buy fill skips the
    assets-ratio check and must prove."""
    from stark_perpetual_tpu.models.air import StarkProver, verify_stark

    rec = OrderExecRecord(
        message_hash=MSG_A, order_id=0x1234, amount_synthetic=10,
        amount_collateral=500, amount_fee=50, is_buying=1,
        actual_synthetic=1, actual_collateral=0, actual_fee=0,
        position_id=1, asset_id_synthetic=7, fee_position_id=FEE_PID,
    )
    fc, upd = order_link_public_surface([rec])
    air = OrderLinkAir(fc, upd, FEE_PID, 1)
    proof = StarkProver(air, blowup=4, n_queries=4).prove(air.trace([rec]))
    assert verify_stark(air, proof)


def test_cheating_witness_rejected(prover):
    """A witness whose deltas do not match the produced-claims table: the
    trace commits fine but the upd-side lookup cannot close."""
    from dataclasses import replace

    from stark_perpetual_tpu.models.air import verify_stark

    air = prover.air
    cheat = [RECORDS[0], replace(RECORDS[1], actual_fee=3, actual_collateral=449)]
    proof = prover.prove(air.trace(cheat))
    assert not verify_stark(air, proof)
