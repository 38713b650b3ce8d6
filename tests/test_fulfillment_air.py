"""FulfillmentAir: order-bookkeeping constraints over a real batch run."""

from dataclasses import replace

import pytest

from stark_perpetual_tpu.models.air import StarkProver, verify_stark
from stark_perpetual_tpu.models.perpetual.fulfillment_air import (
    FulfillmentAccess,
    FulfillmentAir,
)

pytestmark = pytest.mark.usefixtures("no_compile_cache")


def _schedule():
    # Two orders (ids 7 and 9); order 7 fulfilled in two steps.
    return [
        FulfillmentAccess(order_id=9, update_amount=50, full_amount=100, message_hash=111),
        FulfillmentAccess(order_id=7, update_amount=30, full_amount=40, message_hash=222),
        FulfillmentAccess(order_id=7, update_amount=10, full_amount=40, message_hash=222),
    ]


@pytest.fixture(scope="module")
def proved():
    air = FulfillmentAir(_schedule())
    proof = StarkProver(air, blowup=4, n_queries=8).prove(air.trace())
    assert verify_stark(air, proof)
    return air, proof


def test_roundtrip(proved):
    air, proof = proved
    assert air.final == {7: 40, 9: 50}


def test_engine_access_log_proves():
    """The log emitted by a real batch run builds a provable schedule."""
    import test_perpetual_engine as E

    w = E.build_world()
    buy = E.make_order("alice", 1, 1, amt_syn=10, amt_col=500, nonce=90)
    sell = E.make_order("bob", 2, 0, amt_syn=10, amt_col=400, nonce=91)
    from stark_perpetual_tpu.models.perpetual.transactions import Trade

    result = E.run(w, [Trade(buy, sell, 450, 10, 0, 0)])
    log = result.order_access_log
    assert len(log) == 2  # one access per order side
    air = FulfillmentAir(log)
    proof = StarkProver(air, blowup=4, n_queries=4).prove(air.trace())
    assert verify_stark(air, proof)
    # The AIR's final amounts match the engine's squashed journal.
    assert air.final == {oid: new for oid, (_prev, new) in result.order_journal.items()}


def test_overfulfillment_unprovable():
    bad = [
        FulfillmentAccess(order_id=7, update_amount=30, full_amount=40, message_hash=1),
        FulfillmentAccess(order_id=7, update_amount=20, full_amount=40, message_hash=1),
    ]
    with pytest.raises(ValueError):
        FulfillmentAir(bad).trace()


def test_mutated_update_amount_rejected(proved):
    """A proof replayed against a schedule with a mutated fulfillment
    amount dies on the transcript binding."""
    air, proof = proved
    mutated = _schedule()
    mutated[1] = replace(mutated[1], update_amount=31)
    lying = FulfillmentAir(mutated)
    assert not verify_stark(lying, proof)


def test_mutated_final_amount_rejected(proved):
    air, proof = proved
    lying = FulfillmentAir(_schedule(), final_amounts={7: 39, 9: 50})
    assert not verify_stark(lying, proof)


def test_tampered_trace_rejected():
    """A dishonest prover committing new != prev + update is caught by the
    constraints themselves (OOD identity), not just transcript binding."""

    class Cheat(FulfillmentAir):
        def trace(self):
            cols = super().trace()
            # Claim order 9 fulfilled 51 while its scheduled update is 50.
            base = self._cheat_block * 128
            for i in range(128):
                cols[1][base + i] += 1  # new
                cols[2][base + i] -= 1  # keep the full-new ladder consistent
            return cols

    # Locate order 9's block in sorted order (id 7 blocks come first).
    air = Cheat(_schedule())
    air._cheat_block = 2
    proof = StarkProver(air, blowup=4, n_queries=8).prove(air.trace())
    assert not verify_stark(air, proof)


def test_wrong_initial_amount_rejected():
    """Claiming a different carried-in fulfillment is a different transcript
    (and an honest verifier's AIR rejects the proof)."""
    sched = _schedule()
    air = FulfillmentAir(sched, initial_amounts={7: 0})
    proof = StarkProver(air, blowup=4, n_queries=8).prove(air.trace())
    lying = FulfillmentAir(sched, initial_amounts={7: 1})
    assert not verify_stark(lying, proof)
