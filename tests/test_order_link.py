"""OrderLinkAir: limit-order execution fairness/range/delta/message proofs.

A handcrafted two-execution schedule (one buy, one sell) proves end to end;
tampered public claims tables (fulfillment, produced updates, pedersen
pool), unfair witnesses and field/message mismatches must fail.
"""

from dataclasses import replace

import pytest

from stark_perpetual_tpu.models.perpetual.order_link_air import (
    OrderExecRecord,
    OrderLinkAir,
    order_link_public_surface,
)

pytestmark = pytest.mark.usefixtures("no_compile_cache")

FEE_PID = 99
ACOLL = 0x555344432D31  # collateral asset id
BTC = 0x4254432D37


def make_record(**kw):
    """Build a record whose message hash/order id genuinely match its fields
    (the AIR's pool lookups walk the real Pedersen chain)."""
    base = dict(
        message_hash=0, order_id=0, amount_synthetic=10, amount_collateral=500,
        amount_fee=50, is_buying=1, actual_synthetic=10, actual_collateral=450,
        actual_fee=5, position_id=1, asset_id_synthetic=BTC,
        fee_position_id=FEE_PID, nonce=17, expiration_timestamp=123456,
        asset_id_collateral=ACOLL,
    )
    base.update(kw)
    r = OrderExecRecord(**base)
    msg = r.hash_chain()[-1][2]
    return replace(r, message_hash=msg, order_id=msg >> 187)


RECORDS = [
    # Buy 10 synthetic for <= 500 collateral, fee limit 50: filled 10 at 450,
    # fee 5. Fee fairness: 5*500 <= 50*450; assets: (450-1)*10 < 500*10.
    make_record(),
    # Sell 10 synthetic for >= 400 collateral, fee limit 40: receives 450,
    # fee 4. Assets: 10*400 < 10*(450+1).
    make_record(
        is_buying=0, amount_collateral=400, amount_fee=40, actual_fee=4,
        position_id=2, nonce=18,
    ),
]


@pytest.fixture(scope="module")
def surface():
    return order_link_public_surface(RECORDS)


@pytest.fixture(scope="module")
def prover(surface):
    from stark_perpetual_tpu.models.air import StarkProver

    fc, upd, pool = surface
    air = OrderLinkAir(fc, upd, pool, FEE_PID, ACOLL, len(RECORDS))
    return StarkProver(air, blowup=4, n_queries=2)


@pytest.fixture(scope="module")
def proven(prover):
    return prover.air, prover.prove(prover.air.trace(RECORDS))


def test_public_surface(surface):
    from stark_perpetual_tpu.params import FIELD_PRIME

    fc, upd, pool = surface
    assert len(fc) == 2 and all(mu == 1 for _m, _o, _f, mu in fc)
    assert len(pool) == 8  # two distinct 4-hash chains
    keys = {(pid, tag, aid, kc, op) for pid, tag, aid, kc, op, _mu in upd}
    assert (FEE_PID, 0, 0, 0, 5) in keys and (FEE_PID, 0, 0, 0, 4) in keys
    assert (1, 0, 0, 0, (-455) % FIELD_PRIME) in keys
    assert (2, 0, 0, 0, 446) in keys
    assert (1, 1, BTC, 0, 10) in keys
    assert (2, 1, BTC, 0, (-10) % FIELD_PRIME) in keys


def test_roundtrip(proven):
    from stark_perpetual_tpu.models.air import verify_stark

    air, proof = proven
    assert verify_stark(air, proof)


def test_tampered_claims_rejected(proven, surface):
    from stark_perpetual_tpu.models.air import verify_stark

    _air, proof = proven
    fc, upd, pool = surface
    n = len(RECORDS)

    def mk(fc2=None, upd2=None, pool2=None, fee=FEE_PID, ac=ACOLL):
        return OrderLinkAir(fc2 or fc, upd2 or upd, pool2 or pool, fee, ac, n)

    # Wrong full amount in a consumed claim.
    bad_fc = [(m, o, f + 1, mu) for m, o, f, mu in fc[:1]] + list(fc[1:])
    assert not verify_stark(mk(fc2=bad_fc), proof)
    # Wrong delta in a produced update.
    bad_upd = [(p, t, a, k, op + 1, mu) for p, t, a, k, op, mu in upd[:1]] + list(upd[1:])
    assert not verify_stark(mk(upd2=bad_upd), proof)
    # Wrong fee position id / collateral asset.
    assert not verify_stark(mk(fee=FEE_PID + 1), proof)
    assert not verify_stark(mk(ac=ACOLL + 1), proof)
    # Tampered pedersen-pool row (the message chain no longer closes).
    bad_pool = [(a, b, h + 1, mu) for a, b, h, mu in pool[:1]] + list(pool[1:])
    assert not verify_stark(mk(pool2=bad_pool), proof)
    # Dropped pool multiplicity.
    bad_pool = [(a, b, h, 0) for a, b, h, mu in pool[:1]] + list(pool[1:])
    assert not verify_stark(mk(pool2=bad_pool), proof)


def test_invalid_records_unbuildable():
    # Fee over limit: 51*500 > 50*450 fails the ratio.
    bad = make_record(actual_fee=51)
    fc, upd, pool = order_link_public_surface([bad])
    with pytest.raises(ValueError, match="fee fairness"):
        OrderLinkAir(fc, upd, pool, FEE_PID, ACOLL, 1).trace([bad])
    # Buy side paying more than the limit price: (501-1)*10 >= 500*10.
    bad2 = make_record(actual_collateral=501, actual_fee=0)
    fc, upd, pool = order_link_public_surface([bad2])
    with pytest.raises(ValueError, match="assets-ratio"):
        OrderLinkAir(fc, upd, pool, FEE_PID, ACOLL, 1).trace([bad2])
    # Wrong order id for the message hash.
    ok = make_record()
    bad3 = replace(ok, order_id=ok.order_id + 1)
    fc, upd, pool = order_link_public_surface([bad3])
    with pytest.raises(ValueError, match="order id"):
        OrderLinkAir(fc, upd, pool, FEE_PID, ACOLL, 1).trace([bad3])
    # Message hash that does not match the signed fields.
    bad4 = replace(ok, message_hash=ok.message_hash + (1 << 100))
    fc, upd, pool = order_link_public_surface([bad4])
    with pytest.raises(ValueError, match="message hash"):
        OrderLinkAir(fc, upd, pool, FEE_PID, ACOLL, 1).trace([bad4])
    # Trader position == fee position.
    bad5 = make_record(position_id=FEE_PID)
    fc, upd, pool = order_link_public_surface([bad5])
    with pytest.raises(ValueError, match="fee position"):
        OrderLinkAir(fc, upd, pool, FEE_PID, ACOLL, 1).trace([bad5])
    # Collateral asset not the config's.
    bad6 = make_record(asset_id_collateral=ACOLL + 1)
    fc, upd, pool = order_link_public_surface([bad6])
    with pytest.raises(ValueError, match="collateral"):
        OrderLinkAir(fc, upd, pool, FEE_PID, ACOLL, 1).trace([bad6])


def test_buy_zero_collateral_fill_allowed():
    """The reference's actual_collateral == 0 buy-side early return
    (validate_limit_order.cairo:49-55): a zero-collateral buy fill skips the
    assets-ratio check and must prove."""
    from stark_perpetual_tpu.models.air import StarkProver, verify_stark

    rec = make_record(actual_synthetic=1, actual_collateral=0, actual_fee=0)
    fc, upd, pool = order_link_public_surface([rec])
    air = OrderLinkAir(fc, upd, pool, FEE_PID, ACOLL, 1)
    proof = StarkProver(air, blowup=4, n_queries=2).prove(air.trace([rec]))
    assert verify_stark(air, proof)


def test_cheating_witness_rejected(prover):
    """A witness whose deltas do not match the produced-claims table: the
    trace commits fine but the upd-side lookup cannot close."""
    from stark_perpetual_tpu.models.air import verify_stark

    air = prover.air
    cheat = [RECORDS[0], replace(RECORDS[1], actual_fee=3, actual_collateral=449)]
    proof = prover.prove(air.trace(cheat))
    assert not verify_stark(air, proof)
