"""FulfillmentBusAir: witnessed-schedule fulfillment proofs (v2).

The access schedule is private trace; the public surface is the touched-
order journal + the signed-order claims table. These tests check the
in-proof lookup arguments do the binding that v1 did with public glue:
run boundaries must hit the journal, every access must hit a claim, and
cheating witnesses (wrong final, split runs) die in verification even
though the verifier never sees the schedule.
"""

import pytest

from stark_perpetual_tpu.models.perpetual.fulfillment_air import (
    BLOCK,
    FulfillmentAccess,
    FulfillmentBusAir,
)

pytestmark = pytest.mark.usefixtures("no_compile_cache")

LOG = [
    FulfillmentAccess(order_id=7, update_amount=5, full_amount=20, message_hash=1111),
    FulfillmentAccess(order_id=3, update_amount=9, full_amount=9, message_hash=2222),
    FulfillmentAccess(order_id=7, update_amount=6, full_amount=20, message_hash=1111),
]
JOURNAL = {7: (2, 13), 3: (0, 9)}
CLAIMS = [(1111, 7, 20, 2), (2222, 3, 9, 1)]


@pytest.fixture(scope="module")
def prover():
    """One module-scoped prover: its composition program is cached by
    shape, so the cheating-witness proves below reuse the XLA compile."""
    from stark_perpetual_tpu.models.air import StarkProver

    air = FulfillmentBusAir(JOURNAL, CLAIMS, len(LOG))
    return StarkProver(air, blowup=4, n_queries=4)


@pytest.fixture(scope="module")
def proven(prover):
    proof = prover.prove(prover.air.trace(LOG))
    return prover.air, proof


def test_roundtrip(proven):
    from stark_perpetual_tpu.models.air import verify_stark

    air, proof = proven
    assert verify_stark(air, proof)


def test_public_surface_tamper_rejected(proven):
    from stark_perpetual_tpu.models.air import verify_stark

    _air, proof = proven
    # Wrong final amount in the journal: the final-side lookup sum differs.
    assert not verify_stark(
        FulfillmentBusAir({7: (2, 14), 3: (0, 9)}, CLAIMS, len(LOG)), proof
    )
    # Wrong carried-in amount.
    assert not verify_stark(
        FulfillmentBusAir({7: (3, 13), 3: (0, 9)}, CLAIMS, len(LOG)), proof
    )
    # Wrong claimed full amount (sig-side tuple changes).
    assert not verify_stark(
        FulfillmentBusAir(JOURNAL, [(1111, 7, 21, 2), (2222, 3, 9, 1)], len(LOG)),
        proof,
    )
    # Wrong multiplicity.
    assert not verify_stark(
        FulfillmentBusAir(JOURNAL, [(1111, 7, 20, 1), (2222, 3, 9, 1)], len(LOG)),
        proof,
    )


def test_overfulfillment_unbuildable():
    air = FulfillmentBusAir({7: (18, 23)}, [(1111, 7, 20, 1)], 1)
    with pytest.raises(ValueError, match="over-fulfillment"):
        air.trace([FulfillmentAccess(7, 5, 20, 1111)])


def test_cheating_witness_rejected(prover):
    """A witness whose replay lands off the public journal must not verify:
    the prover commits it fine, but the final-side lookup cannot close."""
    from stark_perpetual_tpu.models.air import verify_stark

    air = prover.air
    bad_log = [
        LOG[0],
        LOG[1],
        FulfillmentAccess(order_id=7, update_amount=4, full_amount=20,
                          message_hash=1111),  # lands on 11, journal says 13
    ]
    proof = prover.prove(air.trace(bad_log))
    assert not verify_stark(air, proof)


def test_split_run_rejected(prover):
    """Non-contiguous runs of one order id double its run-boundary tuples;
    the counting argument against the journal multiset rejects them."""
    from stark_perpetual_tpu.models.air import verify_stark
    from stark_perpetual_tpu.models.perpetual.fulfillment_air import _inv

    air = prover.air
    cols = air.trace(LOG)
    # Sorted block order is [3, 7, 7]; swap blocks 0 and 1 -> [7, 3, 7]:
    # order 7 now has two runs (each claiming init 2 and final 13 would be
    # the adversary's best try; here the replayed values stay attached to
    # their blocks, so run 1 is 2->7 and run 2 is 7->13).
    for c in range(len(cols)):
        b0 = cols[c][0:BLOCK]
        b1 = cols[c][BLOCK : 2 * BLOCK]
        cols[c][0:BLOCK] = b1
        cols[c][BLOCK : 2 * BLOCK] = b0
    # Fix up the adversary's same/winv so A1/A2 hold on the new layout.
    oid = cols[0]
    same, winv = cols[8], cols[9]
    n = air.n
    for r in range(BLOCK - 1, n, BLOCK):
        nxt = oid[(r + 1) % n]
        if nxt == oid[r]:
            same[r], winv[r] = 1, 0
        else:
            same[r], winv[r] = 0, _inv(nxt - oid[r])
    # Fix cross-run prev continuity the adversary would fake: run 2 of
    # order 7 must start from run 1's result for A3... there is no A3
    # between the runs (they are not adjacent), so the trace is locally
    # consistent; only the lookup counting can catch it.
    proof = prover.prove(cols)
    assert not verify_stark(air, proof)
