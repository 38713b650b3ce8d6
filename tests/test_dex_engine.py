"""Spot DEX engine end-to-end tests."""

import pytest

from stark_perpetual_tpu.crypto.signature import private_to_stark_key, sign
from stark_perpetual_tpu.models.dex import engine as D

TOKEN_A = 0x5FA3383597691EA9D827A79E1A4F0F7989C35CED18CA9619DE8AB97E661020
TOKEN_B = 0x774961C824A3B0FB3D2965F01471C9C7734BF8DBDE659E0C08DCA2EF18D56A
KEYS = {"alice": 201, "bob": 202, "fee": 203}
PUB = {k: private_to_stark_key(v) for k, v in KEYS.items()}

CONFIG = D.DexGeneralConfig(
    validium_tree_height=31, rollup_tree_height=31, orders_tree_height=251,
    unique_minting_enforced=1,
)


def _signed_order(owner, vault_sell, vault_buy, amount_sell, amount_buy,
                  token_sell, token_buy, nonce, with_fee=True, fee=0, vault_fee=0):
    base = D.OrderBase(nonce=nonce, public_key=PUB[owner],
                       expiration_timestamp=1_000_000)
    order = D.LimitOrder(
        base=base, amount_buy=amount_buy, amount_sell=amount_sell, amount_fee=fee,
        asset_id_buy=token_buy, asset_id_sell=token_sell,
        asset_id_fee=token_sell if with_fee else 0,
        vault_buy=vault_buy, vault_sell=vault_sell, vault_fee=vault_fee,
        with_fee=with_fee,
    )
    msg = D.limit_order_message(order)
    r, s = sign(msg, KEYS[owner])
    from dataclasses import replace

    return replace(order, base=replace(base, signature_r=r, signature_s=s))


@pytest.fixture()
def vaults():
    return {
        1: D.L2VaultState(PUB["alice"], TOKEN_A, 1000),
        2: D.L2VaultState(PUB["alice"], TOKEN_B, 0),
        3: D.L2VaultState(PUB["bob"], TOKEN_B, 500),
        4: D.L2VaultState(PUB["bob"], TOKEN_A, 0),
        # A rollup-side vault.
        D.ROLLUP_VAULT_BIT + 7: D.L2VaultState(PUB["bob"], TOKEN_A, 50),
    }


def run(vaults, txs, orders=None):
    return D.run_dex_program(
        D.DexProgramInput(
            general_config=CONFIG,
            global_expiration_timestamp=500_000,
            txs=tuple(txs),
            vaults=vaults,
            orders=orders or {},
        )
    )


def test_settlement_roundtrip(vaults):
    a = _signed_order("alice", 1, 2, 100, 40, TOKEN_A, TOKEN_B, nonce=1)
    b = _signed_order("bob", 3, 4, 40, 100, TOKEN_B, TOKEN_A, nonce=2)
    settlement = D.Settlement(a, b, party_a_sold=100, party_b_sold=40)
    result = run(vaults, [settlement])
    assert result.final_vaults[1].balance == 900
    assert result.final_vaults[2].balance == 40
    assert result.final_vaults[3].balance == 460
    assert result.final_vaults[4].balance == 100
    assert result.roots["final_validium"] != result.roots["initial_validium"]
    assert result.dex_output[11:] == [0, 0, 0, 0]  # no mods/cond/l1


def test_settlement_bad_signature(vaults):
    a = _signed_order("alice", 1, 2, 100, 40, TOKEN_A, TOKEN_B, nonce=1)
    from dataclasses import replace

    a = replace(a, base=replace(a.base, signature_r=a.base.signature_r ^ 1))
    b = _signed_order("bob", 3, 4, 40, 100, TOKEN_B, TOKEN_A, nonce=2)
    with pytest.raises(D.DexBatchError):
        run(vaults, [D.Settlement(a, b, 100, 40)])


def test_settlement_unfair_ratio(vaults):
    a = _signed_order("alice", 1, 2, 100, 40, TOKEN_A, TOKEN_B, nonce=1)
    b = _signed_order("bob", 3, 4, 40, 100, TOKEN_B, TOKEN_A, nonce=2)
    # Alice sells 100 but receives only 39 < 40 requested: unfair.
    with pytest.raises(D.DexBatchError):
        run(vaults, [D.Settlement(a, b, party_a_sold=100, party_b_sold=39)])


def test_transfer_and_conditional(vaults):
    base = D.OrderBase(nonce=3, public_key=PUB["alice"], expiration_timestamp=900_000)
    t = D.Transfer(
        base=base, sender_vault_id=1, receiver_public_key=PUB["bob"],
        receiver_vault_id=4, amount=10, token=TOKEN_A, condition=0xC0DE,
    )
    msg = D.transfer_message(t)
    r, s = sign(msg, KEYS["alice"])
    from dataclasses import replace

    t = replace(t, base=replace(base, signature_r=r, signature_s=s))
    result = run(vaults, [t])
    assert result.final_vaults[1].balance == 990
    assert result.final_vaults[4].balance == 10
    assert result.outputs.conditional_transfers == [0xC0DE]
    assert result.dex_output[12] == 1


def test_modifications_and_false_full_withdrawal(vaults):
    deposit = D.Modification(PUB["alice"], TOKEN_A, 1, 1000, 1600)
    withdrawal = D.Modification(PUB["bob"], TOKEN_B, 3, 500, 200)
    full = D.Modification(PUB["bob"], TOKEN_A, D.ROLLUP_VAULT_BIT + 7, 50, 0,
                          is_full_withdrawal=True)
    false_full = D.FalseFullWithdrawal(requester_stark_key=PUB["fee"], vault_id=4)
    result = run(vaults, [deposit, withdrawal, full, false_full])
    assert result.final_vaults[1].balance == 1600
    assert result.final_vaults[3].balance == 200
    assert result.final_vaults[D.ROLLUP_VAULT_BIT + 7].balance == 0
    assert len(result.outputs.modifications) == 4
    # Rollup change shows up in volition data.
    assert result.volition_data
    # Biased delta encoding checks.
    _key, _token, action = result.outputs.modifications[0]
    assert action % D.BALANCE_SHIFT == 600 + D.BALANCE_BOUND


def test_mint_unique_enforced(vaults):
    token = D.MINTING_BIT + 77
    mint = D.Mint(PUB["alice"], token, 9)
    result = run(vaults, [mint])
    assert result.final_vaults[9].balance == 1
    with pytest.raises(D.DexBatchError):
        run(vaults, [mint, D.Mint(PUB["bob"], token, 10)])  # duplicate mint


def test_l1_order_settlement(vaults):
    eth_key = 0xA4864D977B944315389D1765FFA7E66F74EE8CD7
    a = _signed_order("alice", 1, 2, 100, 40, TOKEN_A, TOKEN_B, nonce=5)
    from dataclasses import replace

    b_base = D.OrderBase(nonce=6, public_key=eth_key, expiration_timestamp=1_000_000)
    b = D.LimitOrder(
        base=b_base, amount_buy=100, amount_sell=40, amount_fee=0,
        asset_id_buy=TOKEN_A, asset_id_sell=TOKEN_B, asset_id_fee=0,
        vault_buy=11, vault_sell=12, vault_fee=0, is_l1=True,
    )
    result = run(vaults, [D.Settlement(a, b, 100, 40)])
    # The L1 order message is emitted and L1 vaults tracked with min balances.
    assert len(result.outputs.l1_order_messages) == 1
    assert result.outputs.l1_order_messages[0][0] == eth_key
    assert len(result.l1_vault_outputs) == 2
    # Sell vault needed an initial balance of 40 to avoid going negative.
    sell = [o for o in result.l1_vault_outputs if o[1] == TOKEN_B][0]
    minimal = (sell[2] // D.BALANCE_SHIFT) % D.BALANCE_SHIFT
    assert minimal == 40


def test_vault_ownership_enforced(vaults):
    # Bob cannot move alice's vault: key mismatch makes the batch unprovable.
    a = _signed_order("bob", 1, 4, 100, 40, TOKEN_A, TOKEN_B, nonce=9)
    b = _signed_order("alice", 3, 2, 40, 100, TOKEN_B, TOKEN_A, nonce=10)
    with pytest.raises(D.DexBatchError):
        run(vaults, [D.Settlement(a, b, 100, 40)])
