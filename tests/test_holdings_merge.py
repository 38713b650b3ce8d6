"""HoldingsMergeAir: smaller-in-synthetic-holdings subset rule, in-proof.

check_smaller_holdings.cairo:8-102 semantics: per ratio-path transition
check, the updated position's synthetic holdings must be a same-sign,
not-larger subset of the initial's, with both asset sequences bound to
the checked snapshot leaf hashes via pedersen-pool chain lookups.
"""

import pytest

from stark_perpetual_tpu.models.air import StarkProver, verify_stark
from stark_perpetual_tpu.models.perpetual.holdings_merge_air import (
    HoldingsMergeAir,
    merge_blocks_for_check,
    merge_public_surface,
)
from stark_perpetual_tpu.models.perpetual.status_air import StatusRecord

pytestmark = pytest.mark.usefixtures("no_compile_cache")

BTC = 0x4254432D3130
ETH = 0x4554482D3130
PRICES = ((BTC, 2473 << 32), (ETH, 311 << 32))


def _rec(pk, coll, assets):
    return StatusRecord(
        public_key=pk, collateral_balance=coll, assets=tuple(assets),
        epoch=0, prices=PRICES,
    )


def _pairs():
    # Shrink BTC 5 -> 3, zero out ETH entirely (skip).
    r0 = _rec(0x111, 1_000, [(BTC, 5, 7), (ETH, -2, 3)])
    r1 = _rec(0x111, 2_000, [(BTC, 3, 7)])
    # Empty update of a short position (all skips).
    q0 = _rec(0x222, -50, [(BTC, -4, 0)])
    q1 = _rec(0x222, 10, [])
    return [(r0, r1), (q0, q1)]


@pytest.fixture(scope="module")
def proven():
    pairs = _pairs()
    pool, checks = merge_public_surface(pairs)
    n_blocks = sum(len(r0.assets) + 1 for r0, _r1 in pairs)
    air = HoldingsMergeAir(pool, checks, n_blocks)
    proof = StarkProver(air, blowup=4, n_queries=4).prove(air.trace(pairs))
    return pairs, pool, checks, n_blocks, proof


def test_roundtrip(proven):
    _pairs_, pool, checks, n_blocks, proof = proven
    assert verify_stark(HoldingsMergeAir(pool, checks, n_blocks), proof)


def test_tampered_tables_rejected(proven):
    _pairs_, pool, checks, n_blocks, proof = proven
    # Swap the pair direction in the public checks table.
    bad = [(r[1], r[0], r[2], r[3], r[4]) for r in checks]
    assert not verify_stark(HoldingsMergeAir(pool, bad, n_blocks), proof)
    # Drop a chain row.
    assert not verify_stark(HoldingsMergeAir(pool[:-1], checks, n_blocks), proof)


def test_violations_unbuildable():
    # Enlarged holdings.
    r0 = _rec(1, 0, [(BTC, 3, 0)])
    r1 = _rec(1, 0, [(BTC, 4, 0)])
    with pytest.raises(ValueError, match="enlarged"):
        merge_blocks_for_check(r0, r1)
    # Sign flip.
    r1 = _rec(1, 0, [(BTC, -3, 0)])
    with pytest.raises(ValueError, match="sign flip"):
        merge_blocks_for_check(r0, r1)
    # New asset appears.
    r1 = _rec(1, 0, [(BTC, 3, 0), (ETH, 1, 0)])
    with pytest.raises(ValueError, match="not present initially"):
        merge_blocks_for_check(r0, r1)


def test_engine_merge_pairs_consistent():
    from stark_perpetual_tpu.models.perpetual import output as output_mod
    from stark_perpetual_tpu.models.perpetual.sample import sample_batch_input
    from stark_perpetual_tpu.models.perpetual.transition_rule_air import (
        checks_public_surface,
    )

    result = output_mod.run_program(sample_batch_input(n_trades=1))
    tab, _consumed = checks_public_surface(result.transition_check_log)
    n_ratio = sum(mu for _l0, _l1, _ep, w, mu in tab if w == 0)
    assert len(result.merge_pair_log) == n_ratio
    if result.merge_pair_log:
        _pool, checks = merge_public_surface(result.merge_pair_log)
        w0 = sorted(
            (l0, l1, ep, 0, mu) for l0, l1, ep, w, mu in tab if w == 0
        )
        assert sorted(checks) == w0
