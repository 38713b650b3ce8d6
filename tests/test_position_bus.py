"""PositionBusAir: witnessed-schedule position proofs (v2) on a handcrafted
funding-event schedule.

The schedule is private witness; the public surface is the cell journal +
the update/funding/event claims tables. These tests check the in-proof
funding-total running argument and the logUp bindings: tampering any public
table or handing a cheating witness must fail verification.
"""

import pytest

from stark_perpetual_tpu.models.perpetual.position_air import PositionCellAccess
from stark_perpetual_tpu.models.perpetual.position_bus_air import (
    PositionBusAir,
    public_surface_from_accesses,
)

pytestmark = pytest.mark.usefixtures("no_compile_cache")

A = 0x42544325  # synthetic asset id
INITIAL = {(1, 0, 0): 500, (1, 1, A): 10, (1, 2, A): 0}

# deposit +1000, then one funding event: read balance 10, write index 7
# (term (7-0)*10 = 70), apply adj 70 to the collateral.
ACCESSES = [
    PositionCellAccess(1, 0, 0, "bal", 1000, "upd", 0),
    PositionCellAccess(1, 1, A, "rd", 0, "fund", 1),
    PositionCellAccess(1, 2, A, "idx", 7, "fund", 1),
    PositionCellAccess(1, 0, 0, "adj", 70, "fund", 1),
]


@pytest.fixture(scope="module")
def surface():
    return public_surface_from_accesses(ACCESSES, INITIAL)


@pytest.fixture(scope="module")
def prover(surface):
    from stark_perpetual_tpu.models.air import StarkProver

    journal, upd, fund, ev = surface
    air = PositionBusAir(journal, upd, fund, ev, len(ACCESSES))
    return StarkProver(air, blowup=4, n_queries=2)


@pytest.fixture(scope="module")
def proven(prover):
    return prover.air, prover.prove(prover.air.trace(ACCESSES))


def test_surface_shape(surface):
    journal, upd, fund, ev = surface
    # Funding floor division: (1500 * 2^32 - 70) >> 32 = 1499.
    assert journal[(1, 0, 0)] == (500, 1499)
    assert journal[(1, 2, A)] == (0, 7)
    assert (1, A, 7, 1) in fund
    assert (1, 1, 1) in ev


def test_roundtrip(proven):
    from stark_perpetual_tpu.models.air import verify_stark

    air, proof = proven
    assert verify_stark(air, proof)


def test_tampered_tables_rejected(proven, surface):
    from stark_perpetual_tpu.models.air import verify_stark

    _air, proof = proven
    journal, upd, fund, ev = surface
    n = len(ACCESSES)
    # Wrong global funding index in the public (epoch, asset) table.
    assert not verify_stark(
        PositionBusAir(journal, upd, [(1, A, 8, 1)], ev, n), proof
    )
    # Dropped funding event.
    assert not verify_stark(
        PositionBusAir(journal, upd, fund, [(1, 1, 0)], n), proof
    )
    # Wrong journal final (the committed leaf value).
    bad_journal = dict(journal)
    bad_journal[(1, 0, 0)] = (500, 1500)
    assert not verify_stark(
        PositionBusAir(bad_journal, upd, fund, ev, n), proof
    )
    # Wrong deposit operand in the update claims.
    bad_upd = [
        (pid, tag, aid, kc, (op + 1) if op == 1000 else op, mu)
        for pid, tag, aid, kc, op, mu in upd
    ]
    assert not verify_stark(
        PositionBusAir(journal, bad_upd, fund, ev, n), proof
    )


def test_cheating_witness_rejected(prover):
    """A witness whose funding total skips the read value: the trace builder
    itself refuses (the in-trace chain can only accumulate the forwarded
    read), and a journal-consistent but term-inconsistent schedule dies in
    the event lookup."""
    air = prover.air
    bad = [
        ACCESSES[0],
        PositionCellAccess(1, 1, A, "rd", 0, "fund", 1),
        PositionCellAccess(1, 2, A, "idx", 7, "fund", 1),
        PositionCellAccess(1, 0, 0, "adj", 69, "fund", 1),  # wrong total
    ]
    with pytest.raises(ValueError, match="funding total|journal"):
        air.trace(bad)
