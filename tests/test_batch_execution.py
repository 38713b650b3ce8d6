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
