"""End-to-end batch execution proof: builtin pools + business-logic AIRs (v2).

The heavyweight builtin STARKs are covered by test_commitment_proofs /
test_batch_builtins; here they run in collect-only mode and the
witnessed-schedule fulfillment/position bus AIR proofs run for real over a
mixed batch. The schedules are private witness, so tampering is expressed
against the PUBLIC surface (journals + claims tables) — which is all the
verifier ever sees.
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


@pytest.fixture(scope="module")
def proven(batch_world):
    from stark_perpetual_tpu.models.perpetual.prove import prove_batch_execution

    return prove_batch_execution(
        batch_world, blowup=4, n_queries=2, prove_builtins=False
    )


def test_prove_and_verify_batch_execution(proven):
    from stark_perpetual_tpu.models.perpetual.prove import verify_batch_execution

    proofs, _result = proven
    assert proofs.fulfillment_proof is not None
    assert proofs.position_proof is not None
    assert proofs.fulfillment_n_accesses == 2  # one per order side
    assert len(proofs.fulfillment_claims) == 2  # two distinct signed orders
    assert len(proofs.fulfillment_journal) == 2
    # The deposit + trade touch both positions' collateral and BTC cells.
    assert proofs.position_n_accesses >= 6
    cells = set(proofs.position_journal)
    assert len({pid for pid, _tag, _aid in cells}) >= 3  # alice, bob, fee pos
    assert verify_batch_execution(proofs)


def test_mutated_public_surface_fails_verification(proven):
    from stark_perpetual_tpu.models.perpetual.prove import verify_batch_execution

    proofs, _result = proven
    # Mutate a fulfillment journal final amount (what the orders-tree update
    # consumes): the bus AIR's final-side lookup no longer closes.
    oid0 = next(iter(proofs.fulfillment_journal))
    v0, v1 = proofs.fulfillment_journal[oid0]
    bad_journal = dict(proofs.fulfillment_journal)
    bad_journal[oid0] = (v0, v1 + 1)
    assert not verify_batch_execution(
        dc_replace_proofs(proofs, fulfillment_journal=bad_journal)
    )
    # Mutate a position journal final (what the position leaf hash consumes).
    cell = next(iter(proofs.position_journal))
    p0, p1 = proofs.position_journal[cell]
    bad_pos_journal = dict(proofs.position_journal)
    bad_pos_journal[cell] = (p0, p1 + 1)
    assert not verify_batch_execution(
        dc_replace_proofs(proofs, position_journal=bad_pos_journal)
    )
    # Mutate one transaction-update claim operand: the upd-claims lookup
    # tuple changes under the proof.
    pid, tag, aid, kcode, op, mu = proofs.position_upd_claims[0]
    bad_upd = [(pid, tag, aid, kcode, op + 1, mu)] + list(
        proofs.position_upd_claims[1:]
    )
    assert not verify_batch_execution(
        dc_replace_proofs(proofs, position_upd_claims=bad_upd)
    )
    # Claim a message hash that was never signature-verified.
    msg, oid, ful, mu = proofs.fulfillment_claims[0]
    bad_claims = [(12345, oid, ful, mu)] + list(proofs.fulfillment_claims[1:])
    assert not verify_batch_execution(
        dc_replace_proofs(proofs, fulfillment_claims=bad_claims)
    )
    # Mutate a claimed full amount: the sig-side lookup tuple changes.
    bad_claims = [(msg, oid, ful + 1, mu)] + list(proofs.fulfillment_claims[1:])
    assert not verify_batch_execution(
        dc_replace_proofs(proofs, fulfillment_claims=bad_claims)
    )


def dc_replace_proofs(proofs, **kw):
    from dataclasses import replace

    return replace(proofs, **kw)


def test_solvency_bundle_guards(proven):
    """ADVICE r4: a transition proof must never be judged against
    free-floating status claims, and a proven bundle may not silently
    drop its solvency surface while position updates exist."""
    from stark_perpetual_tpu.models.perpetual.prove import verify_batch_execution

    proofs, _result = proven
    assert proofs.status_proof is not None
    assert proofs.transition_proof is not None
    assert not verify_batch_execution(dc_replace_proofs(proofs, status_proof=None))
    assert not verify_batch_execution(
        dc_replace_proofs(proofs, transition_proof=None)
    )
    assert not verify_batch_execution(
        dc_replace_proofs(
            proofs,
            status_proof=None,
            transition_proof=None,
            holdings_proof=None,
            status_pool_claims=[],
            status_price_claims=[],
            status_risk_claims=[],
            status_claims=[],
            transition_checks_table=[],
            holdings_pool_claims=[],
            holdings_checks_table=[],
        )
    )
    # Dropped bus/link proofs downgrade their surfaces to host-trusted
    # tables — the proven-mode guard must reject each one.
    assert proofs.fulfillment_proof is not None
    assert proofs.position_proof is not None
    assert proofs.order_link_proof is not None
    assert not verify_batch_execution(
        dc_replace_proofs(proofs, fulfillment_proof=None)
    )
    assert not verify_batch_execution(dc_replace_proofs(proofs, position_proof=None))
    assert not verify_batch_execution(
        dc_replace_proofs(proofs, order_link_proof=None)
    )


def test_transition_rule_air_range_asserts():
    """TransitionRuleAir must reject mod-p-aliasing status claims
    (ADVICE r4: the 224-bit ratio ladder assumes |tv|<2^95, tr<2^128)."""
    import pytest

    from stark_perpetual_tpu.models.perpetual.transition_rule_air import (
        TransitionRuleAir,
    )
    from stark_perpetual_tpu.params import FIELD_PRIME

    good_claims = [(7, 0, 1 << 90, 5, 1)]
    checks = [(0, 7, 0, 1, 1)]
    TransitionRuleAir(checks, good_claims, 1)  # sane claims construct fine
    with pytest.raises(AssertionError):
        TransitionRuleAir(checks, [(7, 0, FIELD_PRIME - 5, 5, 1)], 1)
    with pytest.raises(AssertionError):
        TransitionRuleAir(checks, [(7, 0, 1 << 90, 1 << 129, 1)], 1)


def test_status_table_public_binding(proven, batch_world):
    """With a BatchPublicContext the risk table must be config rows and
    every price must be carried-in or inside the signed window whose
    median/quorum checks are re-run against the proven ECDSA pool."""
    from dataclasses import replace as dc_replace

    from stark_perpetual_tpu.models.perpetual import prove as P

    proofs, _result = proven
    ctx = P.batch_public_context(batch_world)
    assert P.verify_batch_execution(proofs, context=ctx)
    assert P._verify_status_tables(proofs, ctx)

    # Fabricated risk factor: not a row of the hash-committed config.
    aid, lo, hi, rk, mu = proofs.status_risk_claims[0]
    bad = dc_replace_proofs(
        proofs,
        status_risk_claims=[(aid, lo, hi, rk + 1, mu)]
        + list(proofs.status_risk_claims[1:]),
    )
    assert not P._verify_status_tables(bad, ctx)

    # Fabricated price: neither carried-in nor inside the signed window.
    ep, paid, pr, pmu = proofs.status_price_claims[0]
    bad = dc_replace_proofs(
        proofs,
        status_price_claims=[(ep, paid, pr + 10**9, pmu)]
        + list(proofs.status_price_claims[1:]),
    )
    assert not P._verify_status_tables(bad, ctx)

    # rb_only flag must match the config.
    bad = dc_replace_proofs(proofs, status_rb_only=1 - proofs.status_rb_only)
    assert not P._verify_status_tables(bad, ctx)

    # Tampered signed price vector: its oracle message is no longer a
    # proven ECDSA obligation, so the window re-check must fail.
    aop0 = ctx.signed_min_oracle_prices[0]
    sig0 = aop0.signed_prices[0]
    bad_sig = dc_replace(sig0, external_price=sig0.external_price + 1)
    bad_aop = dc_replace(
        aop0, signed_prices=(bad_sig,) + tuple(aop0.signed_prices[1:])
    )
    bad_ctx = dc_replace(
        ctx,
        signed_min_oracle_prices=(bad_aop,)
        + tuple(ctx.signed_min_oracle_prices[1:]),
    )
    assert not P._verify_status_tables(proofs, bad_ctx)


def test_funding_public_surface():
    """A batch with a funding tick: the (epoch, asset) -> index table and
    (position, epoch) event table are the public surface (the in-proof
    tamper rejection of these tables is covered by test_position_bus.py's
    handcrafted schedules; here the ENGINE-produced surface shape and the
    host cross-links are checked)."""
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
    # Public surface shape: epoch 1 pins BTC's index at 7, and position 1
    # has exactly one funding-application event in epoch 1.
    assert (1, E.BTC, 7, 1) in [
        (e, a, g, mu) for e, a, g, mu in proofs.position_fund_claims
    ]
    assert any(
        pid == 1 and eid == 1 for pid, eid, _mu in proofs.position_event_claims
    )
    # Funding application: (7 - 0) * 10 BTC -> total 70 is the 'adj' payload;
    # its in-trace binding is test_position_bus.py's job, but the claims
    # surface must expose the epoch/asset mapping consistently.
    assert verify_batch_execution(proofs)  # host cross-links (no proofs)

    # Funding binding with public context: claims must match the emitted
    # funding table, and the table must satisfy the tick rules re-run
    # from public data (funding_tick.cairo:28-237 verify-side).
    from dataclasses import replace as dcr

    from stark_perpetual_tpu.models.perpetual import prove as P
    from stark_perpetual_tpu.models.perpetual.transactions import (
        FundingIndex as FI,
        FundingIndicesInfo as FII,
    )

    ctx = P.batch_public_context(program_input, _result)
    assert verify_batch_execution(proofs, context=ctx)
    assert P._verify_funding_tables(proofs, ctx)
    # A context without the emitted funding table must fail: the claims
    # reference epoch 1.
    assert not P._verify_funding_tables(
        proofs, P.batch_public_context(program_input)
    )
    # Tampered claim: index not the table's value.
    bad = dc_replace_proofs(
        proofs,
        position_fund_claims=[
            (e, a, g + 1, mu) for e, a, g, mu in proofs.position_fund_claims
        ],
    )
    assert not P._verify_funding_tables(bad, ctx)
    # Tampered table: funding index moves faster than the public price
    # cap allows (rate bound re-run at verify time).
    fast = FII(
        funding_indices=(FI(E.BTC, 10**15),), funding_timestamp=t0 + 20
    )
    bad_ctx = dcr(ctx, funding_indices_table=(fast,))
    assert not P._verify_funding_tables(proofs, bad_ctx)
    # Same with CONSISTENT claims (isolates the rate-bound re-check from
    # the claims-vs-table equality check).
    consistent = dc_replace_proofs(
        proofs,
        position_fund_claims=[
            (e, a, 10**15 if e == 1 else g, mu)
            for e, a, g, mu in proofs.position_fund_claims
        ],
    )
    assert not P._verify_funding_tables(consistent, bad_ctx)


def mixed_program_input():
    """A batch mixing limit-order fills with transfer-class fulfillment
    accesses (transfer, conditional transfer, withdrawal)."""
    from dataclasses import replace

    import test_perpetual_engine as E
    from stark_perpetual_tpu.crypto.signature import fast_pedersen_hash, sign
    from stark_perpetual_tpu.models.perpetual import engine as PE
    from stark_perpetual_tpu.models.perpetual.transactions import (
        ConditionalTransfer,
        Deposit,
        OrderBase,
        Trade,
        Transfer,
        Withdrawal,
        transfer_message,
        withdrawal_message,
    )

    w = E.build_world()
    buy = E.make_order("alice", 1, 1, amt_syn=10, amt_col=500, fee=50, nonce=95)
    sell = E.make_order("bob", 2, 0, amt_syn=10, amt_col=400, fee=40, nonce=96)

    base = OrderBase(
        nonce=7, public_key=E.PUB["alice"], expiration_timestamp=2_000_000,
        signature_r=0, signature_s=0,
    )
    tr = Transfer(
        base=base, sender_position_id=1, receiver_public_key=E.PUB["bob"],
        receiver_position_id=2, amount=100, asset_id=E.COLLATERAL,
    )
    r, s = sign(transfer_message(tr, 0, fast_pedersen_hash), E.KEYS["alice"])
    tr = replace(tr, base=replace(base, signature_r=r, signature_s=s))

    cbase = OrderBase(
        nonce=9, public_key=E.PUB["bob"], expiration_timestamp=2_000_000,
        signature_r=0, signature_s=0,
    )
    ct_inner = Transfer(
        base=cbase, sender_position_id=2, receiver_public_key=E.PUB["alice"],
        receiver_position_id=1, amount=20, asset_id=E.COLLATERAL,
    )
    r, s = sign(transfer_message(ct_inner, 0xBEEF, fast_pedersen_hash), E.KEYS["bob"])
    ct = ConditionalTransfer(
        transfer=replace(ct_inner, base=replace(cbase, signature_r=r, signature_s=s)),
        condition=0xBEEF,
    )

    wdb = OrderBase(
        nonce=8, public_key=E.PUB["bob"], expiration_timestamp=2_000_000,
        signature_r=0, signature_s=0,
    )
    wd = Withdrawal(base=wdb, position_id=2, amount=50, owner_key=E.PUB["bob"])
    r, s = sign(withdrawal_message(wd, E.COLLATERAL, fast_pedersen_hash), E.KEYS["bob"])
    wd = replace(wd, base=replace(wdb, signature_r=r, signature_s=s))

    pi = PE.ProgramInput(
        general_config=w["config"],
        prev_shared_state=w["prev_shared"],
        minimum_expiration_timestamp=1_000,
        txs=(
            Deposit(E.PUB["alice"], 1, 2500),
            Trade(buy, sell, 450, 10, 5, 4),
            tr,
            ct,
            wd,
        ),
        signed_min_oracle_prices=w["min_prices"],
        signed_max_oracle_prices=w["max_prices"],
        end_system_time=w["t0"],
        positions=dict(w["positions"]),
        orders={},
    )
    return pi


@pytest.fixture(scope="module")
def mixed_collect():
    """mixed_program_input proved collect-only: exercises the aux-witness
    claims partition end to end without any STARK proving."""
    from stark_perpetual_tpu.models.perpetual.prove import prove_batch_execution

    return prove_batch_execution(
        mixed_program_input(), blowup=4, n_queries=2, prove=False
    )


def test_mixed_batch_aux_claims_partition(mixed_collect):
    """Transfers/withdrawals are provable alongside fills: the public aux
    witnesses must cover exactly the non-fill fulfillment claims, and the
    verifier recomputes their message chains from the published fields."""
    from stark_perpetual_tpu.models.perpetual.prove import (
        aux_claims_from_witnesses,
        verify_batch_execution,
    )

    proofs, _result = mixed_collect
    assert proofs.order_link_n_execs == 2  # buy + sell fills
    kinds = sorted(rw[0] for rw in proofs.aux_witnesses)
    assert kinds == ["wd", "xfer", "xfer"]
    # 2 fills + 3 aux accesses = 5 distinct claims.
    assert len(proofs.fulfillment_claims) == 5
    aux_claims, aux_upd = aux_claims_from_witnesses(proofs.aux_witnesses)
    assert sum(mu for *_k, mu in aux_claims) == 3
    assert sum(mu for *_k, mu in aux_upd) == 5  # 2+2 transfer legs + 1 wd
    assert verify_batch_execution(proofs)


def test_mixed_batch_aux_tampers(mixed_collect):
    """No fill can hide in the aux table, and no aux claim can float free:
    every partition violation is rejected at verify time."""
    from stark_perpetual_tpu.models.perpetual.prove import verify_batch_execution

    proofs, _result = mixed_collect

    # Dropping a witness leaves its claim unconsumed.
    assert not verify_batch_execution(
        dc_replace_proofs(proofs, aux_witnesses=proofs.aux_witnesses[:-1])
    )
    # A tampered amount recomputes to a different message hash.
    row = list(proofs.aux_witnesses[0])
    row[-3] = row[-3] + 1  # amount field of either row kind
    assert not verify_batch_execution(
        dc_replace_proofs(
            proofs, aux_witnesses=[tuple(row)] + proofs.aux_witnesses[1:]
        )
    )
    # A fill moved out of the link table cannot be replaced by any aux
    # witness: its message is an order message (order_type 3), which no
    # recomputed transfer/withdrawal chain can equal.
    assert not verify_batch_execution(
        dc_replace_proofs(proofs, order_link_fc_claims=proofs.order_link_fc_claims[1:])
    )
    # Out-of-range witness fields are rejected before hashing.
    bad = list(proofs.aux_witnesses[0])
    bad[-3] = 1 << 64
    assert not verify_batch_execution(
        dc_replace_proofs(proofs, aux_witnesses=[tuple(bad)] + proofs.aux_witnesses[1:])
    )
    # Unknown witness kinds are malformed bundles.
    assert not verify_batch_execution(
        dc_replace_proofs(
            proofs,
            aux_witnesses=[("mystery", 1, 2)] + proofs.aux_witnesses[1:],
        )
    )


def test_everything_batch_collect():
    """Every executable transaction type in ONE batch prove-collects and
    verifies from public inputs: deposit, trade, transfer, withdrawal,
    liquidate, deleverage, forced trade, forced withdrawal. Regression for
    the aux-claims partition (transfers/withdrawals used to crash the
    prove-side link-equality assert) and a completeness smoke for the
    whole solvency surface (threshold + transition + holdings tables)."""
    from dataclasses import replace

    import test_perpetual_executors as X
    from test_perpetual_engine import BTC, COLLATERAL, KEYS, PUB, make_order

    from stark_perpetual_tpu.crypto.signature import fast_pedersen_hash, sign
    from stark_perpetual_tpu.models.perpetual import engine as PE
    from stark_perpetual_tpu.models.perpetual.prove import (
        batch_public_context,
        prove_batch_execution,
        verify_batch_execution,
    )
    from stark_perpetual_tpu.models.perpetual.transactions import (
        Deleverage,
        Deposit,
        ForcedTrade,
        ForcedWithdrawal,
        Liquidate,
        OrderBase,
        Trade,
        Transfer,
        Withdrawal,
        transfer_message,
        withdrawal_message,
    )

    w = X.world.__wrapped__()
    liq_order = make_order("alice", 1, is_buying=1, amt_syn=100, amt_col=5000, nonce=20)
    buy = make_order("alice", 1, 1, amt_syn=10, amt_col=500, fee=50, nonce=95)
    sell = make_order("bob", 2, 0, amt_syn=10, amt_col=400, fee=40, nonce=96)

    base = OrderBase(
        nonce=7, public_key=PUB["alice"], expiration_timestamp=2_000_000,
        signature_r=0, signature_s=0,
    )
    tr = Transfer(
        base=base, sender_position_id=1, receiver_public_key=PUB["bob"],
        receiver_position_id=2, amount=100, asset_id=COLLATERAL,
    )
    r, s = sign(transfer_message(tr, 0, fast_pedersen_hash), KEYS["alice"])
    tr = replace(tr, base=replace(base, signature_r=r, signature_s=s))

    wdb = OrderBase(
        nonce=8, public_key=PUB["bob"], expiration_timestamp=2_000_000,
        signature_r=0, signature_s=0,
    )
    wd = Withdrawal(base=wdb, position_id=2, amount=50, owner_key=PUB["bob"])
    r, s = sign(withdrawal_message(wd, COLLATERAL, fast_pedersen_hash), KEYS["bob"])
    wd = replace(wd, base=replace(wdb, signature_r=r, signature_s=s))

    txs = (
        Deposit(PUB["alice"], 1, 2500),
        Trade(buy, sell, 450, 10, 5, 4),
        tr,
        wd,
        Liquidate(liq_order, 3, 30, 100, 0),
        Deleverage(4, 5, BTC, 100, 40, 1),
        ForcedTrade(
            PUB["alice"], PUB["bob"], 1, 2, BTC, 1000, 10, 1, 99, is_valid=1
        ),
        ForcedWithdrawal(PUB["alice"], 1, 500, is_valid=1),
    )
    pi = PE.ProgramInput(
        general_config=w["config"],
        prev_shared_state=w["prev_shared"],
        minimum_expiration_timestamp=1_000,
        txs=txs,
        signed_min_oracle_prices=w["min_prices"],
        signed_max_oracle_prices=w["max_prices"],
        end_system_time=w["t0"],
        positions=dict(w["positions"]),
        orders={},
    )
    proofs, result = prove_batch_execution(pi, blowup=4, n_queries=2, prove=False)
    # trade (2 sides) + liquidator order = 3 link executions; the transfer
    # and withdrawal land in the aux table; liquidate + deleverage gate
    # through the threshold surface.
    assert proofs.order_link_n_execs == 3
    assert sorted(rw[0] for rw in proofs.aux_witnesses) == ["wd", "xfer"]
    assert len(proofs.fulfillment_claims) == 5
    assert proofs.threshold_n_checks == 3
    assert proofs.transition_n_checks == 16
    assert verify_batch_execution(
        proofs, context=batch_public_context(pi, result)
    )


@pytest.mark.slow
def test_mixed_batch_proves_for_real():
    """Nightly: the mixed trade+transfer+withdrawal batch proves its
    business AIRs for real (the bus AIRs schedule transfer-class accesses
    exactly like fills; the link AIR only sees the fill subset)."""
    from stark_perpetual_tpu.models.perpetual.prove import (
        prove_batch_execution,
        verify_batch_execution,
    )

    pi = mixed_program_input()
    proofs, _res = prove_batch_execution(
        pi, blowup=4, n_queries=2, prove_builtins=False
    )
    assert proofs.fulfillment_proof is not None
    assert proofs.order_link_proof is not None
    assert verify_batch_execution(proofs)
