"""Sample DEX batch factory (integrator parity with
models/perpetual/sample.py's ``sample_batch_input``).

Builds a self-contained, provable spot batch: an L2 settlement between
two signed orders, an optional signed transfer (exercising the
aux-witness claims partition, models/dex/prove.py) and an optional
deposit modification. Everything — keys, vaults, config — is derived
deterministically here, so::

    from stark_perpetual_tpu.models.dex.prove import (
        prove_dex_execution, verify_dex_execution)
    from stark_perpetual_tpu.models.dex.sample import sample_dex_input

    proofs, result = prove_dex_execution(sample_dex_input())
    assert verify_dex_execution(proofs)

Reference analog: the spot program input assembled by the batch operator
for src/starkware/cairo/dex/main.cairo:39-369.
"""

from dataclasses import replace

from stark_perpetual_tpu.crypto.signature import private_to_stark_key, sign
from stark_perpetual_tpu.models.dex import engine as D

TOKEN_A = 0x5FA3383597691EA9D827A79E1A4F0F7989C35CED18CA9619DE8AB97E661020
TOKEN_B = 0x774961C824A3B0FB3D2965F01471C9C7734BF8DBDE659E0C08DCA2EF18D56A
_KEYS = {"alice": 201, "bob": 202}
_PUB = {k: private_to_stark_key(v) for k, v in _KEYS.items()}

SAMPLE_CONFIG = D.DexGeneralConfig(
    validium_tree_height=31,
    rollup_tree_height=31,
    orders_tree_height=251,
    unique_minting_enforced=1,
)


def _signed_order(owner, vault_sell, vault_buy, amount_sell, amount_buy,
                  token_sell, token_buy, nonce):
    base = D.OrderBase(
        nonce=nonce, public_key=_PUB[owner], expiration_timestamp=1_000_000
    )
    order = D.LimitOrder(
        base=base, amount_buy=amount_buy, amount_sell=amount_sell,
        amount_fee=0, asset_id_buy=token_buy, asset_id_sell=token_sell,
        asset_id_fee=token_sell, vault_buy=vault_buy, vault_sell=vault_sell,
        vault_fee=0, with_fee=True,
    )
    r, s = sign(D.limit_order_message(order), _KEYS[owner])
    return replace(order, base=replace(base, signature_r=r, signature_s=s))


def sample_dex_input(
    n_settlements: int = 1, n_transfers: int = 1, with_deposit: bool = True
) -> "D.DexProgramInput":
    """A provable spot batch: settlements + signed transfers + a deposit.

    Each settlement partially crosses a fresh alice/bob order pair
    (TOKEN_A against TOKEN_B); each transfer moves TOKEN_A alice -> bob
    and lands in the aux-witness table of the execution proof.
    """
    vaults = {
        1: D.L2VaultState(_PUB["alice"], TOKEN_A, 1_000 * (n_settlements + 1)),
        2: D.L2VaultState(_PUB["alice"], TOKEN_B, 0),
        3: D.L2VaultState(_PUB["bob"], TOKEN_B, 500 * (n_settlements + 1)),
        4: D.L2VaultState(_PUB["bob"], TOKEN_A, 0),
    }
    txs = []
    for k in range(n_settlements):
        a = _signed_order(
            "alice", 1, 2, 100, 40, TOKEN_A, TOKEN_B, nonce=1 + 2 * k
        )
        b = _signed_order(
            "bob", 3, 4, 40, 100, TOKEN_B, TOKEN_A, nonce=2 + 2 * k
        )
        txs.append(D.Settlement(a, b, party_a_sold=100, party_b_sold=40))
    for k in range(n_transfers):
        base = D.OrderBase(
            nonce=100 + k, public_key=_PUB["alice"],
            expiration_timestamp=900_000,
        )
        t = D.Transfer(
            base=base, sender_vault_id=1, receiver_public_key=_PUB["bob"],
            receiver_vault_id=4, amount=10 + k, token=TOKEN_A,
        )
        r, s = sign(D.transfer_message(t), _KEYS["alice"])
        txs.append(replace(t, base=replace(base, signature_r=r, signature_s=s)))
    if with_deposit:
        # Vault 1 after the settlements (sold 100 each) and transfers.
        bal = (
            vaults[1].balance
            - 100 * n_settlements
            - sum(10 + k for k in range(n_transfers))
        )
        txs.append(D.Modification(_PUB["alice"], TOKEN_A, 1, bal, 5_000))
    return D.DexProgramInput(
        general_config=SAMPLE_CONFIG,
        global_expiration_timestamp=500_000,
        txs=tuple(txs),
        vaults=vaults,
        orders={},
    )
