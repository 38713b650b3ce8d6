"""PositionCellAir: cell-level balance/funding constraints over real runs."""

from dataclasses import replace

import pytest

from stark_perpetual_tpu.models.air import StarkProver, verify_stark
from stark_perpetual_tpu.models.perpetual.position_air import (
    PositionCellAccess,
    PositionCellAir,
    TAG_ASSET,
    TAG_COLLATERAL,
    TAG_INDEX,
    accesses_from_log,
    initial_cells_from_positions,
)

pytestmark = pytest.mark.usefixtures("no_compile_cache")

BTC = 0x4254432D3130


def _schedule():
    # Position 1: funding adjustment (total=0), then pays 450 collateral and
    # receives 10 BTC. Position 2 mirror-side.
    return [
        PositionCellAccess(1, TAG_COLLATERAL, 0, "adj", 0),
        PositionCellAccess(1, TAG_COLLATERAL, 0, "bal", -450),
        PositionCellAccess(1, TAG_INDEX, BTC, "idx", 3),
        PositionCellAccess(1, TAG_ASSET, BTC, "bal", 10),
        PositionCellAccess(2, TAG_COLLATERAL, 0, "adj", 0),
        PositionCellAccess(2, TAG_COLLATERAL, 0, "bal", 450),
        PositionCellAccess(2, TAG_INDEX, BTC, "idx", 3),
        PositionCellAccess(2, TAG_ASSET, BTC, "bal", -10),
    ]


def _initial():
    return {
        (1, TAG_COLLATERAL, 0): 10_000,
        (2, TAG_COLLATERAL, 0): 10_000,
    }


@pytest.fixture(scope="module")
def proved():
    air = PositionCellAir(_schedule(), _initial())
    proof = StarkProver(air, blowup=4, n_queries=8).prove(air.trace())
    assert verify_stark(air, proof)
    return air, proof


def test_roundtrip_finals(proved):
    air, _proof = proved
    assert air.final[(1, TAG_COLLATERAL, 0)] == 9_550
    assert air.final[(2, TAG_COLLATERAL, 0)] == 10_450
    assert air.final[(1, TAG_ASSET, BTC)] == 10
    assert air.final[(2, TAG_ASSET, BTC)] == -10


def test_funding_floor_division():
    # collateral 100, funding total = 3*2^32 + 5 -> floor((100*2^32 - total)/2^32)
    # = 96, remainder 2^32 - 5.
    total = 3 * (1 << 32) + 5
    sched = [PositionCellAccess(1, TAG_COLLATERAL, 0, "adj", total)]
    air = PositionCellAir(sched, {(1, TAG_COLLATERAL, 0): 100})
    assert air.final[(1, TAG_COLLATERAL, 0)] == 96
    proof = StarkProver(air, blowup=4, n_queries=8).prove(air.trace())
    assert verify_stark(air, proof)
    # Funding that mints (claims round-up) is a different schedule.
    lying = PositionCellAir(
        sched, {(1, TAG_COLLATERAL, 0): 100},
        final_cells={(1, TAG_COLLATERAL, 0): 97},
    )
    assert not verify_stark(lying, proof)


def test_engine_run_proves():
    """The cell log of a real batch (trade) proves, and its finals match the
    engine's final positions."""
    import test_perpetual_engine as E
    from stark_perpetual_tpu.models.perpetual.transactions import Trade

    w = E.build_world()
    buy = E.make_order("alice", 1, 1, amt_syn=10, amt_col=500, fee=50, nonce=93)
    sell = E.make_order("bob", 2, 0, amt_syn=10, amt_col=400, fee=40, nonce=94)
    result = E.run(w, [Trade(buy, sell, 450, 10, 5, 4)])

    accesses = accesses_from_log(result.position_access_log)
    assert accesses, "engine emitted no cell records"
    air = PositionCellAir(
        accesses, initial_cells_from_positions(w["positions"])
    )
    proof = StarkProver(air, blowup=4, n_queries=4).prove(air.trace())
    assert verify_stark(air, proof)
    # Every touched cell's final value agrees with the engine's final state.
    finals = initial_cells_from_positions(result.final_positions)
    for cell, value in air.final.items():
        if cell in finals:
            assert finals[cell] == value, cell
        else:
            assert value == 0, cell  # zeroed balances drop out of positions


def test_mutated_delta_rejected(proved):
    """VERDICT negative test: a mutated position delta dies."""
    air, proof = proved
    sched = _schedule()
    sched[1] = replace(sched[1], operand=-449)
    lying = PositionCellAir(sched, _initial())
    assert not verify_stark(lying, proof)


def test_mutated_initial_rejected(proved):
    air, proof = proved
    lying = PositionCellAir(
        _schedule(), {**_initial(), (1, TAG_COLLATERAL, 0): 10_001}
    )
    assert not verify_stark(lying, proof)


def test_balance_window_unprovable():
    # Withdrawing below -2^63 leaves the 64-bit range ladder unseedable.
    sched = [PositionCellAccess(1, TAG_COLLATERAL, 0, "bal", -(1 << 63))]
    with pytest.raises(ValueError):
        PositionCellAir(sched, {(1, TAG_COLLATERAL, 0): -5}).trace()


def test_tampered_running_value_rejected():
    """A forged in-trace balance (constraint violation, matching transcript)
    is caught by the OOD identity."""

    class Cheat(PositionCellAir):
        def trace(self):
            cols = super().trace()
            base = self._cheat_block * 128
            for i in range(128):
                cols[1][base + i] += 1  # new
                cols[2][base + i] += 1  # keep the range ladder seed aligned
            return cols

    air = Cheat(_schedule(), _initial())
    air._cheat_block = 1
    proof = StarkProver(air, blowup=4, n_queries=8).prove(air.trace())
    assert not verify_stark(air, proof)
