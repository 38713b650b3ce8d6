"""TransitionRuleAir: solvency comparisons over proven status claims.

Positive roundtrips for both rule paths (well-leveraged, ratio) and
negative checks: a tampered checks table, a flipped well flag on a
position that is NOT well-leveraged, and consumption of a status tuple
the status AIR never produced must all die in verification.
"""

import pytest

from stark_perpetual_tpu.models.air import StarkProver, verify_stark
from stark_perpetual_tpu.models.perpetual.transition_rule_air import (
    TransitionCheck,
    TransitionRuleAir,
    checks_public_surface,
)

pytestmark = pytest.mark.usefixtures("no_compile_cache")

B95 = 1 << 95
B32 = 1 << 32


def _checks():
    # Check 1: well-leveraged (tv=1000 units fxp, tr small).
    c1 = TransitionCheck(
        leaf0=0, leaf1=0xAAA1, epoch=0,
        tvb0=0, tr0=0,
        tvb1=(1000 * B32) + B95, tr1=5 * B32,
        well=1,
    )
    # Check 2: ratio path with tr0 > 0: tv1*tr0 >= tv0*tr1.
    c2 = TransitionCheck(
        leaf0=0xBBB0, leaf1=0xBBB1, epoch=0,
        tvb0=(-50 * B32) + B95, tr0=100 * B32,
        tvb1=(-40 * B32) + B95, tr1=80 * B32,
        well=0,
    )
    # Check 3: ratio path with tr0 == 0 (tv must not decrease).
    c3 = TransitionCheck(
        leaf0=0xCCC0, leaf1=0xCCC1, epoch=1,
        tvb0=(-10 * B32) + B95, tr0=0,
        tvb1=(-5 * B32) + B95, tr1=0,
        well=0,
    )
    return [c1, c2, c3]


@pytest.fixture(scope="module")
def proven():
    checks = _checks()
    tab, consumed = checks_public_surface(checks)
    air = TransitionRuleAir(tab, consumed, len(checks))
    proof = StarkProver(air, blowup=4, n_queries=4).prove(air.trace(checks))
    return checks, tab, consumed, proof


def test_roundtrip(proven):
    checks, tab, consumed, proof = proven
    assert verify_stark(TransitionRuleAir(tab, consumed, len(checks)), proof)


def test_tampered_tables_rejected(proven):
    checks, tab, consumed, proof = proven
    # Flip a well flag in the public checks table.
    bad = [list(r) for r in tab]
    bad[0][3] ^= 1
    assert not verify_stark(
        TransitionRuleAir([tuple(r) for r in bad], consumed, len(checks)), proof
    )
    # Tamper a consumed status total.
    bad = [list(r) for r in consumed]
    bad[0][2] += 1
    assert not verify_stark(
        TransitionRuleAir(tab, [tuple(r) for r in bad], len(checks)), proof
    )


def test_rule_violations_unbuildable():
    # Claiming well-leveraged when tr > tv*2^32 must be unbuildable.
    bad = TransitionCheck(
        leaf0=0, leaf1=0xD1, epoch=0, tvb0=0, tr0=0,
        tvb1=(10 * B32) + B95, tr1=11 * B32 * B32, well=1,
    )
    tab, consumed = checks_public_surface([bad])
    air = TransitionRuleAir(tab, consumed, 1)
    with pytest.raises(ValueError, match="not well-leveraged"):
        air.trace([bad])
    # Ratio decrease must be unbuildable (-0.5 -> -0.6 per unit risk).
    bad = TransitionCheck(
        leaf0=0xE0, leaf1=0xE1, epoch=0,
        tvb0=(-40 * B32) + B95, tr0=80 * B32,
        tvb1=(-60 * B32) + B95, tr1=100 * B32,
        well=0,
    )
    tab, consumed = checks_public_surface([bad])
    air = TransitionRuleAir(tab, consumed, 1)
    with pytest.raises(ValueError, match="ratio rule violated"):
        air.trace([bad])
    # Zero-risk with reduced value must be unbuildable.
    bad = TransitionCheck(
        leaf0=0xF0, leaf1=0xF1, epoch=0,
        tvb0=(5 * B32) + B95, tr0=0,
        tvb1=(4 * B32) + B95, tr1=0,
        well=0,
    )
    tab, consumed = checks_public_surface([bad])
    air = TransitionRuleAir(tab, consumed, 1)
    with pytest.raises(ValueError, match="zero-risk value reduced"):
        air.trace([bad])


def test_engine_records_checks():
    from stark_perpetual_tpu.models.perpetual import output as output_mod
    from stark_perpetual_tpu.models.perpetual.sample import sample_batch_input
    from stark_perpetual_tpu.models.perpetual.status_air import status_public_surface
    from stark_perpetual_tpu.models.perpetual.sample import _config

    result = output_mod.run_program(sample_batch_input(n_trades=1))
    assert result.transition_check_log
    tab, consumed = checks_public_surface(result.transition_check_log)
    _pool, _price, _risk, status_t = status_public_surface(
        result.status_log, _config()
    )
    assert sorted(consumed) == sorted(status_t)
