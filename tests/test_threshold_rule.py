"""ThresholdRuleAir: liquidate/deleverage solvency gates in-proof.

Reference semantics: transactions/liquidate.cairo:99-124 (TR > TV*2^32
liquidatability), deleverage.cairo:17-183 (TV < 0 deleveragability and the
UNFAIR_DELEVERAGE fair-price maximality). The engine-produced surface is
covered by the batch test below (prove=False); the handcrafted proves
exercise each kind's ladder constraints for real.
"""

import pytest

pytestmark = pytest.mark.usefixtures("no_compile_cache")

B32 = 1 << 32
B95 = 1 << 95


def _checks():
    from stark_perpetual_tpu.models.perpetual.threshold_rule_air import (
        ThresholdCheck,
    )

    liq = ThresholdCheck(
        kind=0, leaf0=0, leaf1=7, epoch=0,
        tvb0=0, tr0=0, tvb1=B95 + 5, tr1=5 * B32 + 1,  # tr just over tv*2^32
    )
    dlv = ThresholdCheck(
        kind=1, leaf0=0, leaf1=9, epoch=0,
        tvb0=0, tr0=0, tvb1=B95 - 3, tr1=77,  # tv = -3 < 0
    )
    fair = ThresholdCheck(
        kind=2, leaf0=9, leaf1=11, epoch=0,
        tvb0=B95 - 3, tr0=10, tvb1=B95 - 1, tr1=8,
    )
    return [liq, dlv, fair]


@pytest.fixture(scope="module")
def proven():
    from stark_perpetual_tpu.models.air import StarkProver
    from stark_perpetual_tpu.models.perpetual.threshold_rule_air import (
        ThresholdRuleAir,
        thresholds_public_surface,
    )

    checks = _checks()
    tab, claims = thresholds_public_surface(checks)
    air = ThresholdRuleAir(tab, claims, len(checks))
    proof = StarkProver(air, blowup=4, n_queries=2).prove(air.trace(checks))
    return tab, claims, checks, proof


def test_prove_and_verify_all_kinds(proven):
    from stark_perpetual_tpu.models.air import verify_stark
    from stark_perpetual_tpu.models.perpetual.threshold_rule_air import (
        ThresholdRuleAir,
    )

    tab, claims, checks, proof = proven
    assert sorted(k for k, *_ in tab) == [0, 1, 2]
    air = ThresholdRuleAir(tab, claims, len(checks))
    assert verify_stark(air, proof)


def test_tampered_public_surface_fails(proven):
    from stark_perpetual_tpu.models.air import verify_stark
    from stark_perpetual_tpu.models.perpetual.threshold_rule_air import (
        ThresholdRuleAir,
    )

    tab, claims, checks, proof = proven
    # Swap a check's kind: the checks-table tuple changes under the proof.
    k, l0, l1, ep, mu = tab[0]
    bad_tab = [((k + 1) % 3, l0, l1, ep, mu)] + list(tab[1:])
    assert not verify_stark(
        ThresholdRuleAir(bad_tab, claims, len(checks)), proof
    )
    # Inflate a consumed total: the status-claims tuple changes.
    leaf, ep2, tvb, tr, mu2 = claims[0]
    bad_claims = [(leaf, ep2, tvb, tr + 1, mu2)] + list(claims[1:])
    assert not verify_stark(
        ThresholdRuleAir(tab, bad_claims, len(checks)), proof
    )


def test_witness_rejects_violations():
    from stark_perpetual_tpu.models.perpetual.threshold_rule_air import (
        ThresholdCheck,
        ThresholdRuleAir,
        thresholds_public_surface,
    )

    # Well-leveraged position is NOT liquidatable: tr == tv*2^32 exactly.
    bad = ThresholdCheck(
        kind=0, leaf0=0, leaf1=7, epoch=0,
        tvb0=0, tr0=0, tvb1=B95 + 5, tr1=5 * B32,
    )
    tab, claims = thresholds_public_surface([bad])
    air = ThresholdRuleAir(tab, claims, 1)
    with pytest.raises(ValueError):
        air.trace([bad])
    # TV >= 0 is not deleveragable.
    bad = ThresholdCheck(
        kind=1, leaf0=0, leaf1=9, epoch=0,
        tvb0=0, tr0=0, tvb1=B95, tr1=77,
    )
    tab, claims = thresholds_public_surface([bad])
    with pytest.raises(ValueError):
        ThresholdRuleAir(tab, claims, 1).trace([bad])
    # Exactly-fair deleverage must fail (strict maximality):
    # tv0*tr1 == (tv1 - 2^32)*tr0 with tv0=-2^32, tr0=8, tv1=0, tr1=8.
    bad = ThresholdCheck(
        kind=2, leaf0=9, leaf1=11, epoch=0,
        tvb0=B95 - B32, tr0=8, tvb1=B95, tr1=8,
    )
    tab, claims = thresholds_public_surface([bad])
    with pytest.raises(ValueError):
        ThresholdRuleAir(tab, claims, 1).trace([bad])


def test_engine_batch_surface():
    """A liquidate + deleverage batch produces all three kinds, the
    consumption split balances against the status AIR's production, and
    the verifier rejects a bundle whose threshold surface is dropped."""
    from dataclasses import replace

    import test_perpetual_engine as E
    import test_perpetual_executors as TE
    from test_perpetual_executors import world as world_fixture

    from stark_perpetual_tpu.models.perpetual import engine as PE
    from stark_perpetual_tpu.models.perpetual import prove as P
    from stark_perpetual_tpu.models.perpetual.transactions import (
        Deleverage,
        Liquidate,
    )

    w = world_fixture.__wrapped__()
    order = E.make_order("alice", 1, 1, amt_syn=100, amt_col=5000, nonce=20)
    txs = [
        Liquidate(order, 3, 30, 100, 0),
        Deleverage(4, 5, TE.BTC, 100, 40, 1),
    ]
    pi = PE.ProgramInput(
        general_config=w["config"],
        prev_shared_state=w["prev_shared"],
        minimum_expiration_timestamp=1_000,
        txs=tuple(txs),
        signed_min_oracle_prices=w["min_prices"],
        signed_max_oracle_prices=w["max_prices"],
        end_system_time=w["t0"],
        positions=dict(w["positions"]),
        orders={},
    )
    proofs, result = P.prove_batch_execution(
        pi, prove=False, prove_builtins=False
    )
    assert sorted(k for k, *_ in proofs.threshold_checks_table) == [0, 1, 2]
    assert proofs.threshold_n_checks == 3
    # transition + threshold consumption == status production.
    assert sorted(
        P._multiset_add(proofs.transition_claims, proofs.threshold_claims)
    ) == sorted(P._multiset_add(proofs.status_claims, []))
    assert P.verify_batch_execution(proofs)
    ctx = P.batch_public_context(pi, result)
    assert P.verify_batch_execution(proofs, context=ctx)
    # Dropping the threshold surface breaks the accounting.
    bad = replace(
        proofs,
        threshold_checks_table=[],
        threshold_claims=[],
        threshold_n_checks=0,
    )
    assert not P.verify_batch_execution(bad)
    # Tampering a consumed threshold total breaks it too.
    leaf, ep, tvb, tr, mu = proofs.threshold_claims[0]
    bad = replace(
        proofs,
        threshold_claims=[(leaf, ep, tvb, tr + 1, mu)]
        + list(proofs.threshold_claims[1:]),
    )
    assert not P.verify_batch_execution(bad)
