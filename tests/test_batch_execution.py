"""End-to-end batch execution proof: builtin pools + business-logic AIRs.

The heavyweight builtin STARKs are covered by test_commitment_proofs /
test_batch_builtins; here they run in collect-only mode and the new
fulfillment/position AIR proofs run for real over a mixed batch.
"""

import pytest

pytestmark = pytest.mark.usefixtures("no_compile_cache")


@pytest.fixture(scope="module")
def batch_world():
    import test_perpetual_engine as E
    from stark_perpetual_tpu.models.perpetual import engine as PE
    from stark_perpetual_tpu.models.perpetual.transactions import Deposit, Trade

    w = E.build_world()
    buy = E.make_order("alice", 1, 1, amt_syn=10, amt_col=500, fee=50, nonce=95)
    sell = E.make_order("bob", 2, 0, amt_syn=10, amt_col=400, fee=40, nonce=96)
    txs = [
        Deposit(E.PUB["alice"], 1, 2500),
        Trade(buy, sell, 450, 10, 5, 4),
    ]
    program_input = PE.ProgramInput(
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
    return program_input


def test_prove_and_verify_batch_execution(batch_world):
    from stark_perpetual_tpu.models.perpetual.prove import (
        prove_batch_execution,
        verify_batch_execution,
    )

    proofs, result = prove_batch_execution(
        batch_world, blowup=4, n_queries=4, prove_builtins=False
    )
    assert proofs.fulfillment_proof is not None
    assert proofs.position_proof is not None
    assert proofs.fulfillment_n_accesses == 2  # one per order side
    assert len(proofs.fulfillment_claims) == 2  # two distinct signed orders
    assert len(proofs.fulfillment_journal) == 2
    # The deposit + trade touch both positions' collateral and BTC cells.
    assert len(proofs.position_accesses) >= 6
    assert verify_batch_execution(proofs)


def test_mutated_schedule_fails_verification(batch_world):
    from dataclasses import replace as dc_replace

    from stark_perpetual_tpu.models.perpetual.prove import (
        prove_batch_execution,
        verify_batch_execution,
    )

    proofs, _result = prove_batch_execution(
        batch_world, blowup=4, n_queries=4, prove_builtins=False
    )
    # Mutate a journal final amount (what the orders-tree update consumes):
    # the bus AIR's final-side lookup no longer closes.
    oid0 = next(iter(proofs.fulfillment_journal))
    v0, v1 = proofs.fulfillment_journal[oid0]
    bad_journal = dict(proofs.fulfillment_journal)
    bad_journal[oid0] = (v0, v1 + 1)
    bad = dc_replace_proofs(proofs, fulfillment_journal=bad_journal)
    assert not verify_batch_execution(bad)
    # Mutate one position delta.
    tampered_pos = list(proofs.position_accesses)
    tampered_pos[0] = dc_replace(tampered_pos[0], operand=tampered_pos[0].operand + 1)
    bad = dc_replace_proofs(proofs, position_accesses=tampered_pos)
    assert not verify_batch_execution(bad)
    # Claim a message hash that was never signature-verified.
    msg, oid, ful, mu = proofs.fulfillment_claims[0]
    bad_claims = [(12345, oid, ful, mu)] + list(proofs.fulfillment_claims[1:])
    bad = dc_replace_proofs(proofs, fulfillment_claims=bad_claims)
    assert not verify_batch_execution(bad)
    # Mutate a claimed full amount: the sig-side lookup tuple changes.
    bad_claims = [(msg, oid, ful + 1, mu)] + list(proofs.fulfillment_claims[1:])
    bad = dc_replace_proofs(proofs, fulfillment_claims=bad_claims)
    assert not verify_batch_execution(bad)


def dc_replace_proofs(proofs, **kw):
    from dataclasses import replace

    return replace(proofs, **kw)


def test_funding_totals_validated():
    """Every 'adj' operand must equal its funding event's per-asset terms
    (g_idx - cached) * balance; a tampered total or a 'fund'->'upd' phase
    flip must fail verification (funding.cairo:31-127)."""
    from dataclasses import replace as dc_replace

    import test_perpetual_engine as E
    from stark_perpetual_tpu.models.perpetual import engine as PE
    from stark_perpetual_tpu.models.perpetual.prove import (
        prove_batch_execution,
        verify_batch_execution,
    )
    from stark_perpetual_tpu.models.perpetual.transactions import (
        Deposit,
        FundingIndex,
        FundingIndicesInfo,
        FundingTick,
        Trade,
    )

    w = E.build_world()
    t0 = w["t0"]
    buy = E.make_order("alice", 1, 1, amt_syn=10, amt_col=500, fee=50, nonce=97)
    sell = E.make_order("bob", 2, 0, amt_syn=10, amt_col=400, fee=40, nonce=98)
    txs = [
        Trade(buy, sell, 450, 10, 5, 4),  # both positions now hold BTC
        FundingTick(
            FundingIndicesInfo(
                funding_indices=(FundingIndex(E.BTC, 7),), funding_timestamp=t0 + 20
            )
        ),
        Deposit(E.PUB["alice"], 1, 100),  # triggers funding application
    ]
    program_input = PE.ProgramInput(
        general_config=w["config"],
        prev_shared_state=w["prev_shared"],
        minimum_expiration_timestamp=1_000,
        txs=tuple(txs),
        signed_min_oracle_prices=w["min_prices"],
        signed_max_oracle_prices=w["max_prices"],
        end_system_time=t0 + 20,
        positions=dict(w["positions"]),
        orders={},
    )
    proofs, _result = prove_batch_execution(
        program_input, prove=False, prove_builtins=False
    )
    # The funding application produced a nonzero adjustment: position 1
    # holds 10 BTC at cached index 0, global index 7 -> total = 70.
    adj = [a for a in proofs.position_accesses if a.kind == "adj" and a.operand]
    assert adj and adj[0].operand == 70
    assert verify_batch_execution(proofs)

    idx = proofs.position_accesses.index(adj[0])
    tampered = list(proofs.position_accesses)
    tampered[idx] = dc_replace(adj[0], operand=adj[0].operand + 1)
    assert not verify_batch_execution(
        dc_replace_proofs(proofs, position_accesses=tampered)
    )
    # Phase flip on a funding idx write drops its term from the total.
    fidx = next(
        i for i, a in enumerate(proofs.position_accesses)
        if a.kind == "idx" and a.phase == "fund"
    )
    tampered2 = list(proofs.position_accesses)
    tampered2[fidx] = dc_replace(tampered2[fidx], phase="upd")
    assert not verify_batch_execution(
        dc_replace_proofs(proofs, position_accesses=tampered2)
    )
