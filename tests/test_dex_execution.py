"""End-to-end DEX batch execution proof: builtin pools + business-logic AIRs.

DEX analog of test_batch_execution: the heavyweight builtin STARKs run in
collect-only mode; the order-fulfillment and vault-cell AIR proofs run for
real over a mixed batch (settlement with an L1 leg, transfer, modification,
mint) covering both access kinds, both vault spaces, and unsigned accesses.
"""

import pytest

import test_dex_engine as T
from stark_perpetual_tpu.models.dex import engine as D

pytestmark = pytest.mark.usefixtures("no_compile_cache")


@pytest.fixture(scope="module")
def dex_batch():
    vaults = {
        1: D.L2VaultState(T.PUB["alice"], T.TOKEN_A, 1000),
        2: D.L2VaultState(T.PUB["alice"], T.TOKEN_B, 0),
        3: D.L2VaultState(T.PUB["bob"], T.TOKEN_B, 500),
        4: D.L2VaultState(T.PUB["bob"], T.TOKEN_A, 0),
    }
    # Party a pays an exchange fee (fee asset = token_sell, from vault 1 to
    # bob's TOKEN_A vault): exercises the link AIR's fee ratio + d3/d4 buses.
    a = T._signed_order(
        "alice", 1, 2, 100, 40, T.TOKEN_A, T.TOKEN_B, nonce=1, fee=5, vault_fee=1
    )
    b = T._signed_order("bob", 3, 4, 40, 100, T.TOKEN_B, T.TOKEN_A, nonce=2)
    a_fee = D.FeeInfoExchange(
        fee_taken=2, destination_vault_id=4, destination_stark_key=T.PUB["bob"]
    )

    # L1 leg: alice sells TOKEN_A for TOKEN_B against an eth-key order.
    eth_key = 0xA4864D977B944315389D1765FFA7E66F74EE8CD7
    a2 = T._signed_order("alice", 1, 2, 50, 20, T.TOKEN_A, T.TOKEN_B, nonce=3)
    l1 = D.LimitOrder(
        base=D.OrderBase(nonce=4, public_key=eth_key, expiration_timestamp=1_000_000),
        amount_buy=50, amount_sell=20, amount_fee=0,
        asset_id_buy=T.TOKEN_A, asset_id_sell=T.TOKEN_B, asset_id_fee=0,
        vault_buy=11, vault_sell=12, vault_fee=0, is_l1=True,
    )

    tbase = D.OrderBase(nonce=5, public_key=T.PUB["alice"], expiration_timestamp=900_000)
    transfer = D.Transfer(
        base=tbase, sender_vault_id=1, receiver_public_key=T.PUB["bob"],
        receiver_vault_id=4, amount=10, token=T.TOKEN_A, condition=0xC0DE,
    )
    from dataclasses import replace

    from stark_perpetual_tpu.crypto.signature import sign

    r, s = sign(D.transfer_message(transfer), T.KEYS["alice"])
    transfer = replace(transfer, base=replace(tbase, signature_r=r, signature_s=s))

    # Legacy 31-bit-format leg: alice signs a legacy (pre-fee) order,
    # settled against a with-fee bob order — exercises the link AIR's
    # legacy path (2-hash chain, wl reconstruction, 31-bit vault gates).
    la = T._signed_order(
        "alice", 1, 2, 30, 12, T.TOKEN_A, T.TOKEN_B, nonce=6, with_fee=False
    )
    lb = T._signed_order("bob", 3, 4, 12, 30, T.TOKEN_B, T.TOKEN_A, nonce=7)

    txs = [
        D.Settlement(a, b, party_a_sold=100, party_b_sold=40, party_a_fee_info=a_fee),
        D.Settlement(a2, l1, party_a_sold=50, party_b_sold=20),
        transfer,
        D.Modification(T.PUB["alice"], T.TOKEN_A, 1, 838, 2000),
        D.Mint(T.PUB["bob"], D.MINTING_BIT + 77, 9),
        D.Settlement(la, lb, party_a_sold=30, party_b_sold=12),
    ]
    return D.DexProgramInput(
        general_config=T.CONFIG,
        global_expiration_timestamp=500_000,
        txs=tuple(txs),
        vaults=vaults,
        orders={},
    )


@pytest.fixture(scope="module")
def proven(dex_batch):
    from stark_perpetual_tpu.models.dex.prove import prove_dex_execution

    return prove_dex_execution(dex_batch, blowup=4, n_queries=4, prove_builtins=False)


def test_prove_and_verify_dex_execution(proven):
    from stark_perpetual_tpu.models.dex.prove import verify_dex_execution

    proofs, result = proven
    assert proofs.order_proof is not None
    assert proofs.vault_proof is not None
    # 6 order fills (a, b, a2, l1, la, lb) + transfer + mint mark.
    assert proofs.order_n_accesses == 8
    assert len(proofs.order_journal) == 8  # every order distinct here
    # Unsigned claims (L1 order, mint) carry no linkage hash.
    unsigned = [c for c in proofs.order_claims if c[0] == 0]
    assert len(unsigned) == 2
    # L2 diffs + L1 diffs + modification 'set' + mint vault.
    kinds = {a.kind for a in proofs.vault_accesses}
    assert kinds == {"diff", "set"}
    spaces = {a.cell[0] for a in proofs.vault_accesses}
    assert spaces == {"l1", "l2"}
    # Settlement link: all five L2 executions (a, b, a2 with-fee; la
    # legacy; lb with-fee) carry real proofs; the L1 leg stays
    # on-chain-justified.
    assert proofs.link_n_execs == 5
    assert proofs.link_proof is not None
    # Four 4-hash chains + one legacy 2-hash chain, with shared prefixes:
    # a/a2/la share h(TOKEN_A, TOKEN_B), a/a2 share the fee link,
    # b/lb share h(TOKEN_B, TOKEN_A) and its fee link.
    assert len(proofs.link_pool_claims) == 13
    assert sum(mu for *_k, mu in proofs.link_pool_claims) == 18
    # The taken fee shows up as produced diffs (-2 from vault 1, +2 to 4);
    # the legacy settlement's moves are produced diffs too.
    from stark_perpetual_tpu.params import FIELD_PRIME

    diffs = {(k, t, v, d) for k, t, v, d, _mu in proofs.link_diff_claims}
    assert (T.PUB["alice"], T.TOKEN_A, 1, (-2) % FIELD_PRIME) in diffs
    assert (T.PUB["bob"], T.TOKEN_A, 4, 2) in diffs
    assert (T.PUB["alice"], T.TOKEN_A, 1, (-30) % FIELD_PRIME) in diffs
    assert (T.PUB["bob"], T.TOKEN_B, 3, (-12) % FIELD_PRIME) in diffs
    assert verify_dex_execution(proofs)
    # Final balances agree with the engine run (modification set vault 1
    # to 2000, then the legacy settlement sold 30).
    assert result.final_vaults[1].balance == 1970


def test_tampered_dex_schedules_fail(proven):
    from dataclasses import replace as dc

    from stark_perpetual_tpu.models.dex.prove import verify_dex_execution

    proofs, _result = proven

    # Mutate a vault diff in the public schedule.
    tampered = list(proofs.vault_accesses)
    tampered[0] = dc(tampered[0], op1=tampered[0].op1 + 1)
    assert not verify_dex_execution(dc(proofs, vault_accesses=tampered))

    # Mutate a journal final amount: the bus lookup no longer closes.
    oid0 = next(iter(proofs.order_journal))
    v0, v1 = proofs.order_journal[oid0]
    bad_journal = dict(proofs.order_journal)
    bad_journal[oid0] = (v0, v1 + 1)
    assert not verify_dex_execution(dc(proofs, order_journal=bad_journal))

    # Claim a signed message that was never signature-verified.
    signed = next(i for i, c in enumerate(proofs.order_claims) if c[0] != 0)
    t3 = list(proofs.order_claims)
    t3[signed] = (12345, t3[signed][1], t3[signed][2], t3[signed][3])
    assert not verify_dex_execution(dc(proofs, order_claims=t3))

    # A non-canonical final vault (empty with a key) must be rejected.
    bad_final = dict(proofs.vault_final)
    some_l2 = next(c for c in bad_final if c[0] == "l2")
    bad_final[some_l2] = (0, 777, 888)
    assert not verify_dex_execution(dc(proofs, vault_final=bad_final))

    # Settlement-link public tables: a tampered produced diff, a tampered
    # consumed claim, and a tampered pool row must all fail verification.
    k0, t0, v0_, d0, mu0 = proofs.link_diff_claims[0]
    bad_df = [(k0, t0, v0_, d0 + 1, mu0)] + list(proofs.link_diff_claims[1:])
    assert not verify_dex_execution(dc(proofs, link_diff_claims=bad_df))
    m0, o0, f0, muc = proofs.link_oc_claims[0]
    bad_oc = [(m0, o0, f0 + 1, muc)] + list(proofs.link_oc_claims[1:])
    assert not verify_dex_execution(dc(proofs, link_oc_claims=bad_oc))
    a0, b0, h0, mup = proofs.link_pool_claims[0]
    bad_pool = [(a0, b0, h0 + 1, mup)] + list(proofs.link_pool_claims[1:])
    assert not verify_dex_execution(dc(proofs, link_pool_claims=bad_pool))


def test_dropped_proof_bundle_guards(proven):
    """Proven-mode completeness: once any business proof is present, every
    non-empty public surface must carry its own proof (the perpetual
    verifier's solvency-bundle guard, mirrored for the DEX bundle)."""
    from dataclasses import replace as dc

    from stark_perpetual_tpu.models.dex.prove import verify_dex_execution

    proofs, _result = proven
    assert proofs.order_claims and proofs.vault_accesses and proofs.link_n_execs
    # Drop exactly one proof at a time: vault finals / order journal /
    # settlement fairness would become host-trusted claims.
    assert not verify_dex_execution(dc(proofs, vault_proof=None))
    assert not verify_dex_execution(dc(proofs, order_proof=None))
    assert not verify_dex_execution(dc(proofs, link_proof=None))


def test_dex_aux_claims_partition(proven):
    """Signed-claims partition: the transfer's claim is covered by its
    public witness, and no partition violation verifies — a dropped
    witness, a tampered amount (different recomputed hash), or a fill
    dropped from the link table all fail."""
    from dataclasses import replace as dc

    from stark_perpetual_tpu.models.dex.prove import (
        dex_aux_claims_from_witnesses,
        verify_dex_execution,
    )

    proofs, _result = proven
    assert len(proofs.aux_witnesses) == 1  # the conditional transfer
    aux_claims, aux_diffs = dex_aux_claims_from_witnesses(proofs.aux_witnesses)
    assert sum(mu for *_k, mu in aux_claims) == 1
    assert sum(mu for *_k, mu in aux_diffs) == 2  # sender + receiver legs
    # The recomputed message is the transfer's order id in the claims.
    (msg, oid, amount, _mu) = aux_claims[0]
    assert msg == oid and amount == 10
    assert any(c[0] == msg for c in proofs.order_claims)

    assert not verify_dex_execution(dc(proofs, aux_witnesses=[]))
    row = list(proofs.aux_witnesses[0])
    row[1] = row[1] + 1  # amount
    assert not verify_dex_execution(dc(proofs, aux_witnesses=[tuple(row)]))
    assert not verify_dex_execution(
        dc(proofs, link_oc_claims=proofs.link_oc_claims[1:])
    )
    assert not verify_dex_execution(
        dc(proofs, aux_witnesses=[("mystery",)])
    )


def test_vault_air_guards():
    """The vault AIR's replay rejects schedules an honest engine never logs."""
    from stark_perpetual_tpu.models.dex.vault_air import DexVaultCellAir, VaultAccess

    # Key mismatch on a non-empty prev vault.
    with pytest.raises(ValueError, match="key/token mismatch"):
        DexVaultCellAir(
            [VaultAccess(("l2", 1), "diff", 999, 5, 10, 0)],
            {("l2", 1): (100, 111, 5)},
        ).trace()
    # Balance driven out of range.
    with pytest.raises(ValueError, match="out of range"):
        DexVaultCellAir(
            [VaultAccess(("l2", 1), "diff", 111, 5, -200, 0)],
            {("l2", 1): (100, 111, 5)},
        ).trace()
    # 'set' with a wrong balance_before.
    with pytest.raises(ValueError, match="balance_before"):
        DexVaultCellAir(
            [VaultAccess(("l2", 1), "set", 111, 5, 50, 70)],
            {("l2", 1): (100, 111, 5)},
        ).trace()


def test_sample_dex_input_collect():
    """The public DEX sample factory yields a provable batch whose
    execution proof verifies from public inputs (collect-only here; the
    module's `proven` fixture covers real proofs over the richer batch)."""
    from stark_perpetual_tpu.models.dex.prove import (
        prove_dex_execution,
        verify_dex_execution,
    )
    from stark_perpetual_tpu.models.dex.sample import sample_dex_input

    proofs, result = prove_dex_execution(
        sample_dex_input(), blowup=4, n_queries=4, prove=False
    )
    assert proofs.link_n_execs == 2  # one settlement, two L2 legs
    assert len(proofs.aux_witnesses) == 1  # the transfer
    assert verify_dex_execution(proofs)


def test_dex_unsigned_claims_public_binding(proven):
    """With a DexPublicContext the unsigned bucket is bound to on-chain
    data: every msg == 0 claim must be an emitted L1 order execution or a
    unique-minting mark, covered exactly in both directions."""
    from dataclasses import replace as dc

    from stark_perpetual_tpu.models.dex.prove import (
        DexPublicContext,
        dex_public_context,
        verify_dex_execution,
    )

    proofs, result = proven
    ctx = dex_public_context(result)
    assert len(ctx.l1_order_messages) == 1 and len(ctx.minted_asset_ids) == 1
    assert verify_dex_execution(proofs, context=ctx)
    # A fabricated unsigned claim has no on-chain backing.
    forged = list(proofs.order_claims) + [(0, 424242, 7, 1)]
    assert not verify_dex_execution(dc(proofs, order_claims=forged), context=ctx)
    # A claimed L1 execution whose message was never emitted on-chain.
    assert not verify_dex_execution(
        proofs,
        context=DexPublicContext(
            l1_order_messages=(), minted_asset_ids=ctx.minted_asset_ids
        ),
    )
    # A mint mark not present in the on-chain vault diffs.
    assert not verify_dex_execution(
        proofs,
        context=DexPublicContext(
            l1_order_messages=ctx.l1_order_messages, minted_asset_ids=()
        ),
    )
